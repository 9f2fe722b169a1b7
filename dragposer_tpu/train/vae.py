"""Pose-VAE training (reference ``python/src/train.py`` parity).

Six-term loss (``python/src/loss.py``): quaternion MSE (root + joints),
displacement MSE, KLD, FK position MSE, and the drag-consistency
("consecutive") regularizer — an MSE between ``z₀ − ∇_z f`` and ``z₁`` over
pairs of consecutive frames where ``f = Σ(pos(z₀) − pos(z₁))²``.  The
gradient-of-gradient is native ``jax.grad`` composition (the reference uses
``autograd.grad(..., create_graph=True)``).

Optimizer: AdamW(1e-4, wd 0.01) after global-norm clipping at 100, matching
torch's clip-then-step order.  Best checkpoint by MPJPE+MPEEPE on held-out
files, evaluated per epoch.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dragposer_tpu import export, metrics
from dragposer_tpu.data import datasets, encoding
from dragposer_tpu.models import vae
from dragposer_tpu.ops import fk
from dragposer_tpu.ops.topology import Skeleton


def make_optimizer(param):
    return optax.chain(
        optax.clip_by_global_norm(param["clip_grad_value"]),
        optax.adamw(param["learning_rate"], b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=0.01),
    )


def _positions_of_latent(z, dec_params, statics, skeleton, mean_dqs, std_dqs,
                         offsets, pair_shape):
    """Decode → denorm → pin root to identity → FK from origin.

    z: (B*2, L) → positions (B, 2, T, J, 3).  Matches the reference FK-loss
    path (``loss.py:95-140``) where both FK inputs have identity root and
    zero global position.
    """
    motion, _ = vae.decode(dec_params, statics, z, mean_dqs, std_dqs)
    mean_q = mean_dqs.reshape(-1, 8)[:, :4].reshape(-1)[None, :, None]
    std_q = std_dqs.reshape(-1, 8)[:, :4].reshape(-1)[None, :, None]
    qs = motion * std_q + mean_q                       # (B2, 88, T)
    b2, c, t = qs.shape
    qs = jnp.moveaxis(qs, -1, 1).reshape(b2, t, -1, 4)  # (B2, T, J, 4)
    identity = jnp.zeros(4).at[0].set(1.0)
    qs = qs.at[..., 0, :].set(identity)
    pos, _ = fk.fk_root_space(qs, jnp.zeros(qs.shape[:-2] + (3,)), skeleton)
    return pos.reshape(pair_shape + pos.shape[1:])      # (B, 2, T, J, 3)


def loss_fn(params, statics, skeleton: Skeleton, key, batch, mean_dqs,
            std_dqs, offsets, param, use_fk: bool):
    """batch: dqs (B, 2, C, T), displacement (B, 2, 3, T) — consecutive pairs."""
    dqs, disp = batch
    b, two, c, t = dqs.shape
    x = dqs.reshape(b * two, c, t)

    motion, displacement, mu, logvar, z = vae.forward(
        params, statics, key, x, mean_dqs, std_dqs
    )
    motion = motion.reshape(b, two, -1, t)
    displacement = displacement.reshape(b, two, 3, t)

    target_q = dqs.reshape(b, two, -1, 8, t)[:, :, :, :4, :].reshape(b, two, -1, t)

    loss_joints = jnp.mean((motion[:, :, 4:, :] - target_q[:, :, 4:, :]) ** 2)
    loss_root = jnp.mean((motion[:, :, :4, :] - target_q[:, :, :4, :]) ** 2)
    loss_displacement = jnp.mean((displacement - disp) ** 2)
    loss_kld = -0.5 * jnp.mean(
        jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )

    pos_fn = functools.partial(
        _positions_of_latent,
        dec_params=params["decoder"], statics=statics, skeleton=skeleton,
        mean_dqs=mean_dqs, std_dqs=std_dqs, offsets=offsets, pair_shape=(b, two),
    )
    pos = pos_fn(z)

    # FK loss: target positions from the (denormalized, root-pinned) inputs
    mean_q = mean_dqs.reshape(-1, 8)[:, :4].reshape(-1)[None, None, :, None]
    std_q = std_dqs.reshape(-1, 8)[:, :4].reshape(-1)[None, None, :, None]
    tq = target_q * std_q + mean_q
    tq = jnp.moveaxis(tq, -1, 2).reshape(b, two, t, -1, 4)
    identity = jnp.zeros(4).at[0].set(1.0)
    tq = tq.at[..., 0, :].set(identity)
    target_pos, _ = fk.fk_root_space(tq, jnp.zeros(tq.shape[:-2] + (3,)), skeleton)
    loss_fk = jnp.mean((pos - target_pos) ** 2)

    # Consecutive (drag-consistency) loss — ∇_z of the pairwise position gap,
    # differentiated through the decoder+FK (second order overall).
    def f(zz):
        p = pos_fn(zz)
        return jnp.sum((p[:, 0] - p[:, 1]) ** 2)

    grad_f = jax.grad(f)(z)
    z_pairs = z.reshape(b, two, -1)
    g_pairs = grad_f.reshape(b, two, -1)
    z_drag = z_pairs[:, 0, :] - g_pairs[:, 0, :]
    loss_consecutive = jnp.mean((z_drag - z_pairs[:, 1, :]) ** 2)

    terms = {
        "kld": loss_kld * param["lambda_kld"],
        "root": loss_root * param["lambda_root"],
        "displacement": loss_displacement * param["lambda_displacement"],
        "consecutive": loss_consecutive * param["lambda_consecutive"],
        "joints": loss_joints,
    }
    if use_fk:
        terms["fk"] = loss_fk * param["lambda_fk"]
    total = sum(terms.values())
    return total, terms


def make_train_step(statics, skeleton, offsets, param, use_fk, optimizer):
    @jax.jit
    def train_step(params, opt_state, key, dqs, disp, mean_dqs, std_dqs,
                   accum=None):
        (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, statics, skeleton, key, (dqs, disp),
            mean_dqs, std_dqs, offsets, param, use_fk,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if accum is not None:
            # accumulate on device — host fetches happen once per epoch, not
            # per step (each blocking fetch is a full tunnel round trip)
            terms = jax.tree.map(lambda a, b: a + b, accum, {**terms, "total": total})
        else:
            terms = {**terms, "total": total}
        return params, opt_state, total, terms

    return train_step


def make_reconstruct(statics):
    """Per-sequence deterministic reconstruction (mu, no sampling noise is
    NOT what the reference does — it reparameterizes even at eval
    (``autoencoder.py:24-27``); we keep the sampling for parity)."""

    @jax.jit
    def reconstruct(params, key, dqs_norm, mean_dqs, std_dqs):
        x = dqs_norm[:, :, None]                     # (F, C, 1)
        mu, logvar = vae.encode(params["encoder"], statics, x)
        z = vae.reparameterize(key, mu, logvar)
        motion, disp = vae.decode(params["decoder"], statics, z,
                                  mean_dqs, std_dqs)
        return motion[:, :, 0], disp[:, :, 0]

    return reconstruct


def evaluate_generator(params, reconstruct, key, eval_motions, eval_bvhs,
                       skeleton, means, stds) -> Tuple[float, float]:
    """Per-epoch eval: reconstruct every eval file, export, MPJPE/MPEEPE."""
    mean_dqs = jnp.asarray(means["dqs"])
    std_dqs = jnp.asarray(stds["dqs"])
    mpjpes, mpeepes = [], []
    for motion, (bvh, _) in zip(eval_motions, eval_bvhs):
        norm = encoding.normalize(motion, means, stds)
        poses, disp = reconstruct(params, key, jnp.asarray(norm.dqs),
                                  mean_dqs, std_dqs)
        out = export.result_to_bvh(
            np.asarray(poses), means, stds, bvh, skeleton,
            displacement=np.asarray(disp),
            are_root_rot_incr=True,
            gt_rotations=motion.global_rot,
        )
        mpjpe, mpeepe = metrics.positional_error(bvh, out)
        mpjpes.append(mpjpe)
        mpeepes.append(mpeepe)
    return float(np.mean(mpjpes)), float(np.mean(mpeepes))


def train(
    data_dir: str,
    model_dir: str,
    param,
    *,
    use_fk: bool = True,
    epochs: int | None = None,
    load: bool = False,
    log=print,
) -> Dict:
    """Full training run; returns the best params.  Mirrors ``train.py:50-224``."""
    import os

    from dragposer_tpu.models import checkpoint, loading

    log(f"loading data from {data_dir} ...")
    train_motions, skeleton, _ = datasets.load_motion_dir(
        os.path.join(data_dir, "train"), param
    )
    eval_motions, _, eval_bvhs = datasets.load_motion_dir(
        os.path.join(data_dir, "eval"), param, keep_bvh=True
    )
    data = datasets.load_or_build_vae_dataset(train_motions, param, data_dir)
    means, stds = data.means, data.stds

    key = jax.random.PRNGKey(param["seed"])
    key, init_key = jax.random.split(key)
    params = vae.init_params(init_key, skeleton.parents, param)
    statics = vae.build_statics(skeleton.parents, param)

    resume_state = None
    last_path = os.path.join(model_dir, "generator.last.npz")
    if load:
        params, extra = checkpoint.load(os.path.join(model_dir, "generator.npz"))
        means, stds = extra["means"], extra["stds"]
        data = datasets.build_vae_dataset(train_motions, param, means, stds)
        if os.path.exists(last_path):
            resume_state = last_path  # exact resume (Adam moments + RNG)

    optimizer = make_optimizer(param)
    opt_state = optimizer.init(params)
    train_step = make_train_step(statics, skeleton, jnp.asarray(data.offsets),
                                 param, use_fk, optimizer)
    reconstruct = make_reconstruct(statics)

    mean_dqs = jnp.asarray(means["dqs"])
    std_dqs = jnp.asarray(stds["dqs"])

    # batches of consecutive-window pairs
    n_pairs = data.n_pairs
    bs = param["batch_size"]
    best = float("inf")
    start_epoch = 0
    if resume_state:
        params, opt_state, rextra = checkpoint.load_training_state(
            resume_state, opt_state)
        best = float(rextra["best"])
        start_epoch = int(rextra["epoch"]) + 1
        key = jnp.asarray(rextra["rng_key"])
        log(f"exact resume from {resume_state}: epoch {start_epoch}, "
            f"best {best:.4f}")
    elif load:
        mpjpe, mpeepe = evaluate_generator(params, reconstruct, key,
                                           eval_motions, eval_bvhs, skeleton,
                                           means, stds)
        best = mpjpe + mpeepe

    n_epochs = epochs if epochs is not None else param["epochs"]
    log(f"training: {n_pairs} window pairs, batch {bs}")
    start = time.time()
    for epoch in range(start_epoch, n_epochs):
        key, epoch_key = jax.random.split(key)
        order = np.asarray(jax.random.permutation(epoch_key, n_pairs))
        step_keys = jax.random.split(epoch_key, (n_pairs + bs - 1) // bs)
        accum, n_batches = None, 0
        epoch_time = time.time()
        for i in range(0, n_pairs, bs):
            idx = order[i : i + bs]
            # batch assembly stays host-side NumPy; the jitted step gets
            # ready arrays (eager device ops are expensive on tunneled TPUs)
            dqs = np.stack(
                (data.dqs[idx], data.dqs[idx + 1]), axis=1
            ).transpose(0, 1, 3, 2)          # (B, 2, C, T)
            disp = np.stack(
                (data.displacement[idx], data.displacement[idx + 1]), axis=1
            ).transpose(0, 1, 3, 2)
            params, opt_state, total, accum = train_step(
                params, opt_state, step_keys[n_batches], dqs, disp,
                mean_dqs, std_dqs, accum,
            )
            n_batches += 1
        epoch_terms = {k: float(v) for k, v in accum.items()}
        epoch_loss = epoch_terms.pop("total")

        mpjpe, mpeepe = evaluate_generator(params, reconstruct, key,
                                           eval_motions, eval_bvhs, skeleton,
                                           means, stds)
        eval_loss = mpjpe + mpeepe
        was_best = eval_loss < best
        if was_best:
            best = eval_loss
            checkpoint.save(
                os.path.join(model_dir, "generator.npz"), params,
                extra={"means": means, "stds": stds},
            )
            checkpoint.save_hparams(model_dir, param)
        checkpoint.save_training_state(
            last_path, params, opt_state,
            extra={"means": means, "stds": stds,
                   "epoch": np.asarray(epoch), "best": np.asarray(best),
                   "rng_key": np.asarray(key)},
        )
        terms_str = " // ".join(
            f"{k}: {v / n_batches:.4f}" for k, v in epoch_terms.items()
        )
        log(
            f"Epoch: {epoch} // Train Loss: {epoch_loss / n_batches:.4f} // "
            f"Time: {time.time() - epoch_time:.1f} ({time.time() - start:.1f})\n"
            f"  {terms_str}\n"
            f"  Eval Loss: {eval_loss:.4f} // MPJPE: {mpjpe:.4f} // "
            f"MPEEPE: {mpeepe:.4f}" + ("*" if was_best else "")
        )
    return params
