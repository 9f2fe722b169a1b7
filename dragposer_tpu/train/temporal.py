"""Temporal-predictor training (reference ``python/src/train_temporal.py`` parity).

Teacher-forced seq2seq over frozen-VAE latents: the encoder sees 14 past
latents ⊕ raw accumulated displacements ⊕ raw heights; the decoder sees the
last past latent followed by the future latents shifted right, under a causal
mask.  Latent normalization stats come from one encoding pass over the train
set (sampled latents — intentional "data augmentation").  Limb-occlusion
augmentation replaces a random limb's (normalized) past dual quats with
denormalized-scale Gaussian noise at p=0.1 per limb per batch — a reference
quirk kept verbatim (``train_temporal.py:192-217``).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dragposer_tpu import config as cfg
from dragposer_tpu.data import datasets
from dragposer_tpu.models import checkpoint, temporal as tmodel, vae
from dragposer_tpu.ops import hash_dropout

LIMBS = tuple(tuple(v) for v in cfg.LIMB_INDICES.values())


def _encode_windows(params, statics, key, dqs):
    """dqs: (N, S, C) normalized windows → sampled latents (N, S, L)."""
    n, s, c = dqs.shape
    x = dqs.reshape(n * s, c)[:, :, None]
    mu, logvar = vae.encode(params["encoder"], statics, x)
    z = vae.reparameterize(key, mu, logvar)
    return z.reshape(n, s, -1)


def compute_latent_stats(vae_params, statics, key, data: datasets.TemporalTrainData,
                         batch: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/std of sampled latents over all past+future windows
    (``train_temporal.py:142-173``)."""
    encode = jax.jit(lambda k, d: _encode_windows(vae_params, statics, k, d))
    buf = []
    both = np.concatenate((data.dqs_past, data.dqs_future), axis=1)
    for i in range(0, both.shape[0], batch):
        key, k = jax.random.split(key)
        buf.append(np.asarray(encode(k, jnp.asarray(both[i : i + batch]))))
    lat = np.concatenate(buf, axis=0).reshape(-1, buf[0].shape[-1])
    return lat.mean(axis=0), lat.std(axis=0, ddof=1)


def _limb_noise(key, dqs_past, mean_dqs, std_dqs, prob):
    """Randomly replace whole limbs in all-but-last past frames with noise.

    Vectorized over limbs: limbs are disjoint joint sets (cfg.LIMB_INDICES),
    so per-limb sequential overwrite ≡ one masked select with a per-joint
    replace flag — no per-limb scatter chain (the reference's loop,
    ``train_temporal.py:192-217``, is per-batch Python; distribution is
    identical: each limb independently replaced w.p. ``prob``)."""
    b, p, c = dqs_past.shape
    dq = dqs_past.reshape(b, p, -1, 8)
    j = dq.shape[2]
    # static per-joint limb membership: limb_of[j] = limb index or n_limbs
    limb_of = np.full(j, len(LIMBS), dtype=np.int32)
    for i, limb in enumerate(LIMBS):
        limb_of[np.asarray(limb)] = i
    k_apply, k_noise = jax.random.split(key)
    applies = jax.random.uniform(k_apply, (len(LIMBS),)) < prob
    replace_j = jnp.concatenate((applies, jnp.zeros(1, bool)))[limb_of]
    seed = jax.random.randint(k_noise, (), 0, 2**31 - 1, jnp.int32)

    def noised(dq):
        noise = (hash_dropout.normal((b, p - 1, j, 8), seed)
                 * std_dqs.reshape(-1, 8) + mean_dqs.reshape(-1, 8))
        head = jnp.where(replace_j[None, None, :, None], noise, dq[:, :-1])
        return jnp.concatenate((head, dq[:, -1:]), axis=1)

    # P(no limb fires) = (1-prob)^4 ≈ 0.66 at prob 0.1: skip the whole
    # noise draw on those steps (top-level step — lax.cond executes one
    # branch on TPU, unlike under vmap)
    dq = jax.lax.cond(jnp.any(applies), noised, lambda d: d, dq)
    return dq.reshape(b, p, c)


def _teacher_forced_loss(tparams, param, latents, latents_future, disp_acc,
                         heights, means_latent, stds_latent, *, train, rng,
                         fused_ff: bool = False, fused_attn: bool = False,
                         layout: str = "rows"):
    """MSE of the teacher-forced predictor (``train_temporal.py:219-268``).

    fused_ff: route the 2048-wide feed-forwards through the Pallas fused
    kernel (ops/ff_fused.py) — training-mode only.
    layout="lanes": run the TRANSPOSED model (batch in the minor/lane
    dimension, ``tmodel.forward_T``) — the TPU training layout.  Same loss
    as "rows" in expectation (exactly, when dropout is 0; dropout masks
    are independent draws otherwise).
    """
    lat = (latents - means_latent) / stds_latent
    lat_t = (latents_future - means_latent) / stds_latent
    enc_tokens = jnp.concatenate((lat, disp_acc, heights), axis=-1)
    enc_in = enc_tokens[:, :-1, :]
    dec_in = jnp.concatenate((lat[:, -1:, :], lat_t[:, :-1, :]), axis=1)
    mask = tmodel.causal_mask(dec_in.shape[1])
    if layout == "lanes":
        out_T = tmodel.forward_T(tparams, param,
                                 jnp.transpose(enc_in, (1, 2, 0)),
                                 jnp.transpose(dec_in, (1, 2, 0)),
                                 tgt_mask=mask, train=train, rng=rng,
                                 fused_ff=fused_ff, fused_attn=fused_attn)
        return jnp.mean((out_T - jnp.transpose(lat_t, (1, 2, 0))) ** 2)
    out = tmodel.forward(tparams, param, enc_in, dec_in, tgt_mask=mask,
                         train=train, rng=rng, fused_ff=fused_ff)
    return jnp.mean((out - lat_t) ** 2)


def make_train_step(vae_params, statics, param, optimizer, *,
                    fused_ff: bool | None = None,
                    fused_attn: bool | None = None,
                    layout: str | None = None,
                    indexed: bool = False):
    """Jitted training step.  On TPU the defaults switch to the fused-FF
    Pallas kernel and the batch-in-lanes transposed layout (measured 5×+
    the plain rows/XLA step at B=4096); elsewhere they keep the plain
    formulation (the Pallas interpret path is slow on CPU).  fused_attn
    is requested on TPU too, but at dropout>0 ``_attn_T`` falls back to
    the non-fused probs path — torch MHA applies dropout to the softmax
    probabilities and the fused kernel has no mask support, so the
    parity-faithful trainer eats the ~8% step cost.

    indexed=True: the step takes ``(…, key, idx, dqs_past_ALL,
    dqs_future_ALL, disp_acc_ALL, heights_ALL, …)`` and gathers the
    batch on DEVICE — with the dataset staged in HBM once
    (:func:`stage_dataset`), a step uploads 4·B int32 indices instead of
    ~28 MB of batch rows (the per-step host gather + tunnel upload
    dominated the training loop's wall clock)."""
    on_tpu = jax.default_backend() == "tpu"
    if fused_ff is None:
        fused_ff = on_tpu
    if fused_attn is None:
        fused_attn = on_tpu
    if layout is None:
        layout = "lanes" if on_tpu else "rows"
    prob = param["limbs_random_prob"]

    def body(tparams, opt_state, key, dqs_past, dqs_future, disp_acc,
             heights, mean_dqs, std_dqs, means_latent, stds_latent):
        k_aug, k_enc, k_drop = jax.random.split(key, 3)
        dqs_past = _limb_noise(k_aug, dqs_past, mean_dqs, std_dqs, prob)
        # past+future through ONE frozen-VAE encode (the two window sets
        # are one big row batch after the reshape — measured: two calls
        # cost ~2× one at B=4096)
        both = jax.lax.stop_gradient(_encode_windows(
            vae_params, statics, k_enc,
            jnp.concatenate((dqs_past, dqs_future), axis=1)))
        p = dqs_past.shape[1]
        latents, latents_future = both[:, :p], both[:, p:]

        def loss(tp):
            return _teacher_forced_loss(
                tp, param, latents, latents_future, disp_acc, heights,
                means_latent, stds_latent, train=True, rng=k_drop,
                fused_ff=fused_ff, fused_attn=fused_attn, layout=layout,
            )

        value, grads = jax.value_and_grad(loss)(tparams)
        updates, opt_state = optimizer.update(grads, opt_state, tparams)
        tparams = optax.apply_updates(tparams, updates)
        return tparams, opt_state, value

    if not indexed:
        return jax.jit(body)

    @jax.jit
    def step_indexed(tparams, opt_state, key, idx, dqs_past_all,
                     dqs_future_all, disp_acc_all, heights_all,
                     mean_dqs, std_dqs, means_latent, stds_latent):
        take = lambda a: jnp.take(a, idx, axis=0)  # noqa: E731
        return body(tparams, opt_state, key, take(dqs_past_all),
                    take(dqs_future_all), take(disp_acc_all),
                    take(heights_all), mean_dqs, std_dqs,
                    means_latent, stds_latent)

    return step_indexed


# Stage datasets on device when they fit comfortably in HBM alongside the
# models and activations (v5e: 16 GB); beyond that the loop falls back to
# per-step host gathers.
STAGE_LIMIT_BYTES = 4 << 30


def stage_dataset(data: datasets.TemporalTrainData):
    """Move the training tensors the loop actually reads into device HBM
    once.  Returns (staged_or_original_data, staged: bool)."""
    fields = ("dqs_past", "dqs_future", "disp_past_acc", "heights")
    total = sum(getattr(data, f).nbytes for f in fields)
    if total > STAGE_LIMIT_BYTES:
        return data, False
    import dataclasses

    return dataclasses.replace(data, **{
        f: jnp.asarray(getattr(data, f)) for f in fields
    }), True


def make_eval_step(vae_params, statics, param):
    @jax.jit
    def step(tparams, key, dqs_past, dqs_future, disp_acc, heights,
             means_latent, stds_latent):
        both = _encode_windows(
            vae_params, statics, key,
            jnp.concatenate((dqs_past, dqs_future), axis=1))
        p = dqs_past.shape[1]
        latents, latents_future = both[:, :p], both[:, p:]
        return _teacher_forced_loss(
            tparams, param, latents, latents_future, disp_acc, heights,
            means_latent, stds_latent, train=False, rng=None,
        )

    return step


def evaluate(eval_step, tparams, key, data: datasets.TemporalTrainData,
             means_latent, stds_latent, batch: int) -> float:
    losses, weights = [], []
    n = data.dqs_past.shape[0]
    for i in range(0, n, batch):
        # The tail (< one batch) runs as its own smaller static shape: one
        # extra compile per dataset, and every window contributes to the
        # checkpoint-selection loss (the reference evaluates whole files,
        # train_temporal.py:324-471).
        key, k = jax.random.split(key)
        sl = slice(i, min(i + batch, n))
        losses.append(float(eval_step(
            tparams, k,
            jnp.asarray(data.dqs_past[sl]), jnp.asarray(data.dqs_future[sl]),
            jnp.asarray(data.disp_past_acc[sl]), jnp.asarray(data.heights[sl]),
            means_latent, stds_latent,
        )))
        weights.append(sl.stop - sl.start)
    return float(np.average(losses, weights=weights)) if losses \
        else float("inf")


def train(
    data_dir: str,
    model_dir: str,
    param=None,
    *,
    epochs: int | None = None,
    load: bool = False,
    eval_window_step: int | None = None,
    seed: int | None = None,
    log=print,
) -> Dict:
    param = param or cfg.TEMPORAL_PARAM
    vae_param = cfg.VAE_PARAM

    from dragposer_tpu.models import loading

    log(f"loading data from {data_dir} ...")
    train_motions, skeleton, _ = datasets.load_motion_dir(
        os.path.join(data_dir, "train"), param,
        height_indices=param["height_indices"],
    )
    eval_motions, _, _ = datasets.load_motion_dir(
        os.path.join(data_dir, "eval"), param,
        height_indices=param["height_indices"],
    )

    vae_params, means, stds = loading.load_generator(
        model_dir, skeleton.parents, vae_param
    )
    statics = vae.build_statics(skeleton.parents, vae_param)

    log("building windows ...")
    data = datasets.load_or_build_temporal_dataset(
        train_motions, param, means, stds, data_dir
    )
    # the reference evaluates on non-overlapping windows (step = window size)
    eval_param = dict(param, window_step=eval_window_step or param["window_size"])
    eval_data = datasets.build_temporal_dataset(eval_motions, eval_param, means, stds)

    key = jax.random.PRNGKey(vae_param["seed"] if seed is None else seed)
    key, init_key, stats_key = jax.random.split(key, 3)
    tparams = tmodel.init_params(init_key, param)

    resume_best = None
    resume_state = None
    last_path = os.path.join(model_dir, "temporal.last.npz")
    if load:
        if os.path.exists(last_path):
            # exact resume: params + Adam moments + RNG chain + best bar —
            # no resume shock (the reference reloads params only and Adam
            # restarts cold, train.py:285-319)
            resume_state = last_path
            tparams, extra = checkpoint.load(os.path.join(model_dir,
                                                          "temporal.npz"))
        else:
            tparams, extra = checkpoint.load(os.path.join(model_dir,
                                                          "temporal.npz"))
            resume_best = True  # re-establish the bar before overwriting
            # (the reference resets best_evaluation to inf after loading,
            # train_temporal.py:176, so a resumed run can overwrite a better
            # checkpoint with a worse one — deliberately fixed here)
        means_latent = jnp.asarray(extra["means_latent"])
        stds_latent = jnp.asarray(extra["stds_latent"])
    else:
        log(f"computing latent stats over {data.dqs_past.shape[0]} windows ...")
        ml, sl = compute_latent_stats(vae_params, statics, stats_key, data)
        means_latent, stds_latent = jnp.asarray(ml), jnp.asarray(sl)
    log(f"training: {data.dqs_past.shape[0]} windows, "
        f"{tmodel.count_params(tparams)} temporal params")

    optimizer = optax.adam(param["learning_rate"], b1=0.9, b2=0.999, eps=1e-8)
    opt_state = optimizer.init(tparams)
    data, staged = stage_dataset(data)
    eval_data, _ = stage_dataset(eval_data)
    train_step = make_train_step(vae_params, statics, param, optimizer,
                                 indexed=staged)
    eval_step = make_eval_step(vae_params, statics, param)
    if staged:
        log("dataset staged in device memory (indexed batching)")

    mean_dqs = jnp.asarray(means["dqs"])
    std_dqs = jnp.asarray(stds["dqs"])

    n = data.dqs_past.shape[0]
    bs = min(param["batch_size"], n)
    best = float("inf")
    start_epoch = 0
    if resume_state:
        tparams, opt_state, rextra = checkpoint.load_training_state(
            resume_state, opt_state)
        best = float(rextra["best"])
        start_epoch = int(rextra["epoch"]) + 1
        key = jnp.asarray(rextra["rng_key"])
        log(f"exact resume from {resume_state}: epoch {start_epoch}, "
            f"best {best:.4f}")
    if resume_best:
        key, bk = jax.random.split(key)
        best = evaluate(eval_step, tparams, bk, eval_data, means_latent,
                        stds_latent,
                        batch=min(bs, eval_data.dqs_past.shape[0]))
        log(f"resumed; previous checkpoint eval loss: {best:.4f}")
    n_epochs = epochs if epochs is not None else param["epochs"]
    start = time.time()
    for epoch in range(start_epoch, n_epochs):
        key, shuffle_key = jax.random.split(key)
        order = np.asarray(jax.random.permutation(shuffle_key, n))
        step_losses = []   # device scalars; ONE blocking fetch per epoch
        epoch_time = time.time()
        for i in range(0, n, bs):
            idx = order[i : i + bs]
            if idx.shape[0] != bs:
                continue  # the reference drops partial batches
            key, k = jax.random.split(key)
            if staged:
                tparams, opt_state, value = train_step(
                    tparams, opt_state, k, jnp.asarray(idx),
                    data.dqs_past, data.dqs_future,
                    data.disp_past_acc, data.heights,
                    mean_dqs, std_dqs, means_latent, stds_latent,
                )
            else:
                tparams, opt_state, value = train_step(
                    tparams, opt_state, k,
                    jnp.asarray(data.dqs_past[idx]),
                    jnp.asarray(data.dqs_future[idx]),
                    jnp.asarray(data.disp_past_acc[idx]),
                    jnp.asarray(data.heights[idx]),
                    mean_dqs, std_dqs, means_latent, stds_latent,
                )
            step_losses.append(value)
        epoch_loss = float(jnp.stack(step_losses).sum()) if step_losses \
            else 0.0
        count = len(step_losses)
        key, ek = jax.random.split(key)
        eval_loss = evaluate(eval_step, tparams, ek, eval_data,
                             means_latent, stds_latent,
                             batch=min(bs, eval_data.dqs_past.shape[0]))
        was_best = eval_loss < best
        if was_best:
            best = eval_loss
            checkpoint.save(
                os.path.join(model_dir, "temporal.npz"), tparams,
                extra={"means_latent": np.asarray(means_latent),
                       "stds_latent": np.asarray(stds_latent)},
            )
        # full training state for exact resume (params + Adam moments +
        # RNG chain + best bar); "best" checkpoint above stays params-only
        checkpoint.save_training_state(
            os.path.join(model_dir, "temporal.last.npz"), tparams, opt_state,
            extra={"means_latent": np.asarray(means_latent),
                   "stds_latent": np.asarray(stds_latent),
                   "epoch": np.asarray(epoch),
                   "best": np.asarray(best),
                   "rng_key": np.asarray(key)},
        )
        log(
            f"Epoch: {epoch} // Train Loss: {epoch_loss / max(count, 1):.4f} // "
            f"Eval Loss: {eval_loss:.4f} // "
            f"Time: {time.time() - epoch_time:.1f} ({time.time() - start:.1f})"
            + ("*" if was_best else "")
        )
    return tparams
