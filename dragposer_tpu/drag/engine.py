"""The drag-optimization runtime: latent-space pose optimization on TPU.

One *frame step* — temporal-transformer rollout, Adam iterations on the
latent, global-pose advance, ring-buffer shifts — is a single pure function;
an entire sequence is one ``lax.scan`` over it, and batches of sequences are
``vmap``-ed and sharded over a device mesh.  This replaces the reference's
per-frame Python interpreter loop (``python/src/drag_pose.py``) with exactly
one compiled device computation per sequence.

Numeric parity notes (each mirrors a reference behavior):

* a *fresh* Adam state every frame (``drag_pose.py:218``);
* the stop rule ``(loss_pos > εp or λr·loss_rot > εr) and iters < max_iter
  and loss_incr > min_incr`` evaluated on the *previous* iteration's values
  (``drag_pose.py:300-304``), realized as a ``lax.while_loop`` condition —
  under ``vmap`` JAX masks per-element updates, preserving per-sequence
  early exit;
* the ring buffers record the latent *before* the final Adam step — the one
  that produced the last decode (``drag_pose.py:309,385``);
* the temporal rollout feeds decoder outputs back autoregressively with *no*
  target mask in the reference (``drag_pose.py:273``) — every position
  attends forward within the real tokens; on a fixed-size token buffer this
  is a per-step *visibility* mask (all rows see columns ≤ k), NOT a causal
  mask (verified equivalent in ``tests/test_temporal_model.py``);
* the "upsample" of rollout predictions is a constant-hold, not a lerp
  (``drag_pose.py:282-289``): target[k] = prediction[max(ceil(k/step), 1)]
  for window > 0;
* the joint adjustment translates the root toward the target end effector
  and adds the same world-space correction to the *root-space* displacement
  buffer entry (``drag_pose.py:373-381``) — kept verbatim;
* heights-buffer entries add the already-advanced global position to
  FK positions that are relative to the previous root (``drag_pose.py:389``)
  — kept verbatim.

End effectors are dense: the mask is a (22,) float vector and targets are
full (22, …) arrays, so tracker dropout / mask edits at runtime never
trigger recompilation (weights of inactive joints simply multiply to zero;
the normalizer is the traced count of active joints).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.models import temporal as temporal_model
from dragposer_tpu.models import vae
from dragposer_tpu.ops import fk, quat
from dragposer_tpu.ops.topology import Skeleton


# ---------------------------------------------------------------------------
# Static configuration / model bundles
# ---------------------------------------------------------------------------

class DragHyper(NamedTuple):
    """Hashable static configuration — changing any field recompiles."""

    max_iter: int = 100
    stop_eps_pos: float = 1e-4
    stop_eps_rot: float = 1e-2
    min_loss_incr: float = 1e-5
    learning_rate: float = 1e-2
    lambda_rot: float = 1.0
    lambda_temporal: float = 0.02
    temporal_future_window: int = 0          # 0 → re-predict every frame
    sample_step: int = 4
    past_frames: Tuple[int, ...] = tuple(range(0, 60, 4))
    height_indices: Tuple[int, ...] = (0, 4, 8, 13, 17, 21)
    use_temporal: bool = True
    joint_adjustment: Optional[Tuple[int, int]] = (0, 0)  # (joint, ee joint) or None
    joint_adjustment_weight: float = 1.0
    # Extension hook: "constraints as losses" (the reference documents these
    # as commented-out code, ``drag_pose.py:129-183``; the paper sells the
    # capability).  Each entry is ``(fn, weight)`` where ``fn`` is a pure
    # function ``ConstraintContext -> scalar``; the weighted sum joins the
    # drag objective.  Built-ins live in ``dragposer_tpu.drag.constraints``.
    constraints: Tuple[Tuple[Any, float], ...] = ()


class DragModel(NamedTuple):
    """Traced model bundle (arrays only — safe to donate / shard)."""

    decoder: Any                 # decoder params pytree
    encoder: Any                 # encoder params pytree
    temporal: Any                # temporal transformer params (or None)
    mean_dqs: jnp.ndarray        # (J*8,)
    std_dqs: jnp.ndarray         # (J*8,)
    mean_disp: jnp.ndarray       # (3,)
    std_disp: jnp.ndarray        # (3,)
    means_latent: jnp.ndarray    # (L,)
    stds_latent: jnp.ndarray     # (L,)
    mask: jnp.ndarray            # (J,) float 0/1 — active end effectors
    weights: jnp.ndarray         # (J, 2) [pos, rot] loss weights


class FrameOutput(NamedTuple):
    """Per-frame outputs of the compiled step (observability parity with the
    reference's --verbose per-frame prints, ``drag_pose.py:361-367``)."""

    pose: jnp.ndarray        # (J*4,) normalized, root slot = world rotation
    global_pos: jnp.ndarray  # (3,)
    iterations: jnp.ndarray  # () int32 — Adam iterations used
    loss_pos: jnp.ndarray    # () final weighted EE position MSE
    loss_rot: jnp.ndarray    # () final weighted EE rotation MSE (λ applied)
    latent: jnp.ndarray      # (L,) optimized latent the frame decoded from
    #                          (GT-free lineage scoring / observability;
    #                           the reference exposes no analog)


class DragState(NamedTuple):
    """Per-sequence recurrent state carried across frames."""

    latent: jnp.ndarray               # (L,)
    global_pos: jnp.ndarray           # (3,)
    global_rot: jnp.ndarray           # (4,)
    latent_buffer: jnp.ndarray        # (past_size, L)
    displacement_buffer: jnp.ndarray  # (past_size, 3)
    heights_buffer: jnp.ndarray       # (past_size, H)
    target_buffer: jnp.ndarray        # (W+1, L) rollout predictions
    current_index: jnp.ndarray        # () int32


def _quat_stats(model: DragModel):
    mean_q = model.mean_dqs.reshape(-1, 8)[:, :4].reshape(-1)
    std_q = model.std_dqs.reshape(-1, 8)[:, :4].reshape(-1)
    return mean_q, std_q


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_state(
    model: DragModel,
    statics: vae.VAEStatics,
    hyper: DragHyper,
    key,
    initial_pose: jnp.ndarray,        # (J*8, T) normalized dqs
    initial_global_pos: jnp.ndarray,  # (3,)
    initial_global_rot: jnp.ndarray,  # (4,)
    initial_heights: jnp.ndarray,     # (H,)
) -> DragState:
    """Encode the initial pose to seed the latent and tile the ring buffers
    (reference ``drag_pose.py:47-64``)."""
    mu, logvar = vae.encode(model.encoder, statics, initial_pose[None])
    latent = vae.reparameterize(key, mu, logvar)[0]
    past_size = hyper.past_frames[-1] + hyper.sample_step  # == future_frames[0]
    return DragState(
        latent=latent,
        global_pos=jnp.asarray(initial_global_pos),
        global_rot=jnp.asarray(initial_global_rot),
        latent_buffer=jnp.tile(latent[None], (past_size, 1)),
        displacement_buffer=jnp.zeros((past_size, 3)),
        heights_buffer=jnp.tile(jnp.asarray(initial_heights)[None], (past_size, 1)),
        target_buffer=jnp.zeros(
            (hyper.temporal_future_window + 1, latent.shape[-1])
        ),
        current_index=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Temporal rollout
# ---------------------------------------------------------------------------

def _hold_index(window: int, step: int) -> np.ndarray:
    """Static map target-buffer slot → rollout prediction index.

    Reproduces the reference's sequence of constant-hold overwrites
    (``drag_pose.py:272-290``).  The first loop writes prediction ``i/step``
    (0-indexed here) into slot ``i`` for ``i in range(0, window+1, step)``;
    the second loop then overwrites slots ``[i : i+step+1]`` with the value
    at slot ``i+step`` (lerp with weight 1).  Net effect: slot ``k`` holds
    prediction ``min(k//step + 1, window//step)`` — prediction 0 is computed
    for the autoregressive chain but never lands in the buffer (window > 0)."""
    if window == 0:
        return np.zeros(1, dtype=np.int32)
    idx = np.minimum(np.arange(window + 1) // step + 1, window // step)
    return idx.astype(np.int32)


def _rollout_inputs(state: DragState, hyper: DragHyper):
    """Extract the predictor's inputs from the (P, ·)-shaped ring buffers."""
    past = np.asarray(hyper.past_frames)
    latp = state.latent_buffer[past]                           # (P, L)
    acc_idx = past[:-1, None] + np.arange(hyper.sample_step)[None, :]
    disp_acc = state.displacement_buffer[acc_idx].sum(axis=1)  # (P-1, 3)
    heights = state.heights_buffer[past][:-1]                  # (P-1, H)
    return latp[:-1], disp_acc, heights, latp[-1]


def _temporal_rollout(model: DragModel, hyper: DragHyper, tparam,
                      state: DragState) -> jnp.ndarray:
    lat, disp_acc, heights, token0 = _rollout_inputs(state, hyper)
    return _temporal_rollout_core(model, hyper, tparam, lat, disp_acc,
                                  heights, token0)


def _temporal_rollout_core(model: DragModel, hyper: DragHyper, tparam,
                           lat, disp_acc, heights, token0) -> jnp.ndarray:
    """Autoregressive prediction of the next ``window+1`` latents.

    ``lat``/``disp_acc``/``heights``: (P-1, ·) sampled buffer rows;
    ``token0``: (L,) the newest sampled latent.  Returns the new target
    buffer (W+1, L), denormalized.
    """
    step = hyper.sample_step
    latent_dim = token0.shape[-1]

    lat = (lat - model.means_latent) / model.stds_latent
    # NOTE: deliberately UNBATCHED (no [None]) — under run_batch's vmap a
    # singleton batch dim padded to a full sublane tile and made the
    # transformer ~8× slower; vmap adds the real batch dim itself.
    enc_in = jnp.concatenate((lat, disp_acc, heights), axis=-1)  # (P-1, 33)

    n_steps = hyper.temporal_future_window // step + 1
    token0 = (token0 - model.means_latent) / model.stds_latent
    tokens0 = jnp.zeros((n_steps, latent_dim)).at[0].set(token0)

    def body(carry, k):
        tokens, outs = carry
        # The reference's rollout is UNMASKED over the first k+1 tokens
        # (``drag_pose.py:273`` passes no tgt_mask), so every position may
        # attend forward within the real tokens.  On the fixed-size buffer
        # that is a per-step visibility mask: all rows see columns ≤ k.
        mask = jnp.where(
            jnp.arange(n_steps) <= k, 0.0, -jnp.inf
        ).astype(jnp.float32)[None, :]
        pred = temporal_model.forward(
            model.temporal, tparam, enc_in, tokens, tgt_mask=mask
        )                                                       # (n_steps, L)
        out_k = jnp.take(pred, k, axis=0)
        tokens = jax.lax.cond(
            k + 1 < n_steps,
            lambda t: t.at[jnp.minimum(k + 1, n_steps - 1)].set(out_k),
            lambda t: t,
            tokens,
        )
        outs = outs.at[k].set(out_k)
        return (tokens, outs), None

    outs0 = jnp.zeros((n_steps, latent_dim))
    (_, outs), _ = jax.lax.scan(body, (tokens0, outs0), jnp.arange(n_steps))
    outs = outs * model.stds_latent + model.means_latent
    return outs[jnp.asarray(_hold_index(hyper.temporal_future_window, step))]


def _temporal_rollout_core_T(model: DragModel, hyper: DragHyper, tparam,
                             lat, disp_acc, heights, token0) -> jnp.ndarray:
    """Whole-batch transposed rollout: same semantics as vmapped
    ``_temporal_rollout_core`` but runs ``temporal.forward_T`` with the
    batch in the minor dimension (one transpose in, one out).

    ``lat`` (B, P-1, L) raw buffer rows, ``disp_acc`` (B, P-1, 3),
    ``heights`` (B, P-1, H), ``token0`` (B, L).  Returns (B, W+1, L)."""
    step = hyper.sample_step
    B, latent_dim = token0.shape
    # NOT fused_ff=True here, by measurement: routing the rollout FFs
    # through the rate-0 lanes kernel (f32) measured 617k vs 663k f/s on
    # the headline bench (-7%) — the autoregressive decode loop makes
    # S·layers small launches per frame whose custom-call boundaries
    # block XLA's surrounding fusions, costing more than the saved
    # (S, 2048, B) hidden-plane HBM round trip.  Env override for
    # re-measurement: DRAGPOSER_ROLLOUT_FUSED_FF=1.
    fused_ff = bool(os.environ.get("DRAGPOSER_ROLLOUT_FUSED_FF"))

    lat = (lat - model.means_latent) / model.stds_latent
    enc_in = jnp.concatenate((lat, disp_acc, heights), axis=-1)
    encT = jnp.moveaxis(enc_in, 0, -1)                    # (P-1, 33, B)

    n_steps = hyper.temporal_future_window // step + 1
    tok0 = ((token0 - model.means_latent) / model.stds_latent).T
    tokens0 = jnp.zeros((n_steps, latent_dim, B)).at[0].set(tok0)

    def body(carry, k):
        tokens, outs = carry
        mask = jnp.where(
            jnp.arange(n_steps) <= k, 0.0, -jnp.inf
        ).astype(jnp.float32)[None, :]
        pred = temporal_model.forward_T(
            model.temporal, tparam, encT, tokens, tgt_mask=mask,
            fused_ff=fused_ff,
        )                                                  # (n_steps, L, B)
        out_k = jnp.take(pred, k, axis=0)
        tokens = jax.lax.cond(
            k + 1 < n_steps,
            lambda t: t.at[jnp.minimum(k + 1, n_steps - 1)].set(out_k),
            lambda t: t,
            tokens,
        )
        outs = outs.at[k].set(out_k)
        return (tokens, outs), None

    outs0 = jnp.zeros((n_steps, latent_dim, B))
    (_, outs), _ = jax.lax.scan(body, (tokens0, outs0), jnp.arange(n_steps))
    outs = jnp.moveaxis(outs, -1, 0)                       # (B, n_steps, L)
    outs = outs * model.stds_latent + model.means_latent
    return outs[:, jnp.asarray(_hold_index(hyper.temporal_future_window,
                                           step))]


def rollout_lane_budget(batch: int, window: int) -> int:
    """Static sub-batch size for :func:`_rollout_where_needed`: a lane's
    ``current_index`` cycles mod ``window`` frames, so in steady state
    ~B/W lanes cross a window boundary per frame; 2× that (rounded up to
    8) absorbs phase clustering before the full-batch fallback kicks in.
    window ≤ 1 (rollout consumed every frame) returns ``batch`` — no
    amortization exists."""
    per_frame = max(1, (batch * 2 + window - 1) // max(window, 1))
    r = ((per_frame + 7) // 8) * 8
    return min(batch, max(r, 8))


def _rollout_where_needed(model: DragModel, hyper: DragHyper, tparam,
                          lat, disp_acc, heights, token0, need,
                          target_buffer):
    """Windowed-config rollout amortization (the begin path computes the
    W-frame rollout but 1-of-W frames consumes it): run the transformer
    only for lanes where ``need``, returning ``target_buffer`` with those
    lanes' rows replaced.

    Mechanics: ``top_k`` picks up to R needing lanes (R static, from
    :func:`rollout_lane_budget`); their inputs are row-GATHERED (cheap on
    TPU — it is per-lane scatters that serialize), the sub-batch runs the
    same ``_temporal_rollout_core_T`` (per-lane arithmetic is batch-
    independent; agreement with the full-batch rollout is fp-level, not
    bitwise — the (R, ·) and (B, ·) programs vectorize differently and
    the buffer is autoregressive, see tests/test_pipeline.py),
    and one ``.at[idx].set`` row-scatter writes the R rows back.  When
    MORE than R lanes need a rollout (first frames, phase clustering),
    fall back to the full-batch rollout — never wrong, just unamortized.
    """
    B = token0.shape[0]
    r = rollout_lane_budget(B, hyper.temporal_future_window)
    if r >= B:
        new_buffer = _temporal_rollout_core_T(model, hyper, tparam, lat,
                                              disp_acc, heights, token0)
        return jnp.where(need[:, None, None], new_buffer, target_buffer)

    n_need = jnp.sum(need.astype(jnp.int32))

    def full(args):
        lat, disp_acc, heights, token0, need, tbuf = args
        nb = _temporal_rollout_core_T(model, hyper, tparam, lat, disp_acc,
                                      heights, token0)
        return jnp.where(need[:, None, None], nb, tbuf)

    def sub(args):
        lat, disp_acc, heights, token0, need, tbuf = args
        _, idx = jax.lax.top_k(need.astype(jnp.int32), r)   # unique lanes
        sel = need[idx]                                     # (r,) valid picks
        nb_r = _temporal_rollout_core_T(
            model, hyper, tparam,
            jnp.take(lat, idx, axis=0), jnp.take(disp_acc, idx, axis=0),
            jnp.take(heights, idx, axis=0), jnp.take(token0, idx, axis=0))
        # invalid picks write their lane's EXISTING rows back (exact no-op
        # even when idx repeats lane 0 for padding)
        nb_r = jnp.where(sel[:, None, None], nb_r,
                         jnp.take(tbuf, idx, axis=0))
        return tbuf.at[idx].set(nb_r)

    def none_needed(args):
        return args[5]

    args = (lat, disp_acc, heights, token0, need, target_buffer)
    # three regimes: nobody at a boundary (lockstep crowds between
    # boundaries) → no rollout at all; ≤ R lanes → sub-batch; else full
    return jax.lax.cond(
        n_need == 0, none_needed,
        lambda a: jax.lax.cond(n_need > r, full, sub, a), args)


# ---------------------------------------------------------------------------
# The per-frame loss (differentiated w.r.t. the latent)
# ---------------------------------------------------------------------------

class ConstraintContext(NamedTuple):
    """Differentiable quantities a constraint loss may read.

    ``positions``/``rotmats`` are world-oriented with the *previous* frame's
    root as origin (the reference's ``pos_qs``/``rotmats_qs``);
    ``global_pos`` is that previous root position, so ``positions +
    global_pos`` is absolute world space — exactly what the reference's
    commented constraints compute (``drag_pose.py:129-165``)."""

    latent: jnp.ndarray       # (L,) the optimized variable
    pose: jnp.ndarray         # (J*4,) normalized decoder output
    positions: jnp.ndarray    # (J, 3) FK positions, previous root = origin
    world_quats: jnp.ndarray  # (J, 4) world joint rotations
    rotmats: jnp.ndarray      # (J, 3, 3) world joint rotation matrices
    global_pos: jnp.ndarray   # (3,) previous frame's global root position
    world_displacement: jnp.ndarray  # (3,) this frame's root displacement


class _LossAux(NamedTuple):
    loss_pos: jnp.ndarray
    loss_rot: jnp.ndarray            # already scaled by lambda_rot
    world_displacement: jnp.ndarray  # (3,)
    displacement: jnp.ndarray        # (3,) root-space
    world_rotation: jnp.ndarray      # (4,)
    positions: jnp.ndarray           # (J, 3) relative to the previous root
    pose: jnp.ndarray                # (J*4,) normalized decoder output


def _drag_loss(latent, model: DragModel, statics, skeleton: Skeleton,
               hyper: DragHyper, global_pos, global_rot, target_ee_pos,
               target_ee_rot, target_latent):
    """Reference ``DragPose.loss`` (``drag_pose.py:66-194``), dense-masked."""
    mean_q, std_q = _quat_stats(model)
    if isinstance(model.decoder, dict) and "ws" in model.decoder:
        # folded inference decoder, flat layout (3 matmuls on (B, C)-shaped
        # arrays under vmap — the conv (1, C, 1) layout would leave the TPU
        # lane dimension at 1 through the whole hot loop)
        pose_n, disp_n = vae.decode_folded_flat(
            model.decoder, latent, model.mean_dqs, model.std_dqs
        )
    else:
        pose_n, disp_n = vae.decode(
            model.decoder, statics, latent[None], model.mean_dqs, model.std_dqs
        )
        pose_n = pose_n[0, :, 0]
        disp_n = disp_n[0, :, 0]
    disp = disp_n * model.std_disp + model.mean_disp
    qs = (pose_n * std_q + mean_q).reshape(-1, 4)

    world_rotation = quat.mul(global_rot, qs[0])      # incremental → world
    rs = qs.at[0].set(world_rotation)
    world_displacement = quat.mul_vec(world_rotation, disp)

    # FK in world space with the previous root as origin
    positions, world_quats = fk.fk_root_space(rs, world_displacement, skeleton)
    rotmats = quat.to_matrix(world_quats)

    n_ee = jnp.maximum(jnp.sum(model.mask), 1.0)
    w_pos = model.mask * model.weights[:, 0]
    w_rot = model.mask * model.weights[:, 1]
    loss_pos = jnp.sum(
        w_pos[:, None] * (positions - target_ee_pos) ** 2
    ) / (n_ee * 3.0)
    loss_rot = jnp.sum(
        w_rot[:, None, None] * (rotmats - target_ee_rot) ** 2
    ) / (n_ee * 9.0)
    loss_temporal = jnp.mean((latent - target_latent) ** 2)

    loss_rot = loss_rot * hyper.lambda_rot
    lam_t = hyper.lambda_temporal if hyper.use_temporal else 0.0
    total = loss_pos + loss_rot + loss_temporal * lam_t

    if hyper.constraints:
        ctx = ConstraintContext(
            latent=latent, pose=pose_n, positions=positions,
            world_quats=world_quats, rotmats=rotmats,
            global_pos=global_pos, world_displacement=world_displacement,
        )
        for fn, weight in hyper.constraints:
            total = total + weight * fn(ctx)
    aux = _LossAux(
        loss_pos=loss_pos,
        loss_rot=loss_rot,
        world_displacement=world_displacement,
        displacement=disp,
        world_rotation=world_rotation,
        positions=positions,
        pose=pose_n,
    )
    return total, aux


# ---------------------------------------------------------------------------
# The optimization loop (fresh Adam on the latent, early exit)
# ---------------------------------------------------------------------------

_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8


class _OptCarry(NamedTuple):
    latent: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray
    t: jnp.ndarray          # iteration counter, int32
    prev_loss: jnp.ndarray
    loss_pos: jnp.ndarray
    loss_rot: jnp.ndarray
    loss_incr: jnp.ndarray
    decoded_latent: jnp.ndarray   # latent that produced `aux` (pre-step)
    aux: _LossAux


def _opt_cond(c: _OptCarry, hyper: DragHyper):
    """The reference stop rule on the *previous* iteration's values
    (``drag_pose.py:300-304``)."""
    return (
        ((c.loss_pos > hyper.stop_eps_pos) | (c.loss_rot > hyper.stop_eps_rot))
        & (c.t < hyper.max_iter)
        & (c.loss_incr > hyper.min_loss_incr)
    )


def _opt_body(c: _OptCarry, model, statics, skeleton, hyper: DragHyper,
              global_pos, global_rot, target_ee_pos, target_ee_rot,
              target_latent) -> _OptCarry:
    """One Adam iteration on the latent (loss + grad + update)."""
    loss_grad = jax.value_and_grad(_drag_loss, has_aux=True)
    (total, aux), g = loss_grad(
        c.latent, model, statics, skeleton, hyper, global_pos,
        global_rot, target_ee_pos, target_ee_rot, target_latent,
    )
    t = c.t + 1
    m = _ADAM_B1 * c.m + (1.0 - _ADAM_B1) * g
    v = _ADAM_B2 * c.v + (1.0 - _ADAM_B2) * g * g
    tf = t.astype(jnp.float32)
    m_hat = m / (1.0 - _ADAM_B1 ** tf)
    v_hat = v / (1.0 - _ADAM_B2 ** tf)
    latent = c.latent - hyper.learning_rate * m_hat / (jnp.sqrt(v_hat) + _ADAM_EPS)
    return _OptCarry(
        latent=latent, m=m, v=v, t=t,
        prev_loss=total,
        loss_pos=aux.loss_pos,
        loss_rot=aux.loss_rot,
        loss_incr=c.prev_loss - total,
        decoded_latent=c.latent,
        aux=aux,
    )


def _opt_init(latent0, n_joints: int) -> _OptCarry:
    """Fresh Adam state for one frame (reference ``drag_pose.py:218``)."""
    return _OptCarry(
        latent=latent0,
        m=jnp.zeros_like(latent0),
        v=jnp.zeros_like(latent0),
        t=jnp.zeros((), jnp.int32),
        prev_loss=jnp.asarray(1e7, jnp.float32),
        loss_pos=jnp.asarray(jnp.inf, jnp.float32),
        loss_rot=jnp.asarray(jnp.inf, jnp.float32),
        loss_incr=jnp.asarray(1.0, jnp.float32),
        decoded_latent=latent0,
        aux=_LossAux(
            loss_pos=jnp.asarray(jnp.inf),
            loss_rot=jnp.asarray(jnp.inf),
            world_displacement=jnp.zeros(3),
            displacement=jnp.zeros(3),
            world_rotation=jnp.zeros(4).at[0].set(1.0),
            positions=jnp.zeros((n_joints, 3)),
            pose=jnp.zeros(n_joints * 4),
        ),
    )


def _optimize(latent0, model, statics, skeleton, hyper: DragHyper,
              global_pos, global_rot, target_ee_pos, target_ee_rot,
              target_latent):
    def cond(c):
        return _opt_cond(c, hyper)

    def body(c):
        return _opt_body(c, model, statics, skeleton, hyper, global_pos,
                         global_rot, target_ee_pos, target_ee_rot,
                         target_latent)

    init = _opt_init(latent0, skeleton.n_joints)
    return jax.lax.while_loop(cond, body, init)


# ---------------------------------------------------------------------------
# One frame
# ---------------------------------------------------------------------------

def _begin_frame(model: DragModel, hyper: DragHyper, tparam,
                 state: DragState, batched: bool = False):
    """Start-of-frame work: the temporal rollout gate and the frame's
    temporal target (reference ``DragPose.run`` preamble,
    ``drag_pose.py:256-295``).  Returns ``(target_buffer, target_latent)``.
    """
    if hyper.use_temporal:
        if batched or hyper.temporal_future_window == 0:
            new_buffer = _temporal_rollout(model, hyper, tparam, state)
            target_buffer = jnp.where(
                state.current_index == 0, new_buffer, state.target_buffer
            )
        else:
            target_buffer = jax.lax.cond(
                state.current_index == 0,
                lambda s: _temporal_rollout(model, hyper, tparam, s),
                lambda s: s.target_buffer,
                state,
            )
        target_latent = target_buffer[state.current_index]
    else:
        target_buffer = state.target_buffer
        target_latent = jnp.zeros_like(state.latent)
    return target_buffer, target_latent


def _advance_core(model: DragModel, hyper: DragHyper, state_global_pos,
                  state_current_index, final: _OptCarry, adj_target):
    """Buffer-layout-independent end-of-frame math: global-transform
    advance, joint adjustment, heights row, output pose (reference
    ``DragPose.run`` postamble, ``drag_pose.py:306-395``).

    ``adj_target``: the (3,) world target of the adjustment end effector
    (only consumed when ``hyper.joint_adjustment`` is set — callers may
    pass zeros otherwise; keeping it a single row lets the pipeline avoid
    materializing batch-leading (B, J, 3) target arrays).  Returns
    ``(global_pos, global_rot, displacement, heights, current_index,
    FrameOutput)`` — the caller shifts its ring buffers."""
    mean_q, std_q = _quat_stats(model)
    aux = final.aux

    global_pos = state_global_pos + aux.world_displacement
    global_rot = aux.world_rotation

    displacement = aux.displacement
    if hyper.joint_adjustment is not None:
        joint_idx, _ = hyper.joint_adjustment
        adjustment = (
            adj_target - aux.positions[joint_idx]
        ) * hyper.joint_adjustment_weight
        global_pos = global_pos + adjustment
        displacement = displacement + adjustment  # world-space add, as reference

    heights = (aux.positions + global_pos)[
        jnp.asarray(hyper.height_indices), 1
    ]
    current_index = (
        jnp.zeros((), jnp.int32)
        if hyper.temporal_future_window == 0
        else (state_current_index + 1) % hyper.temporal_future_window
    )
    pose_out = aux.pose.at[:4].set((global_rot - mean_q[:4]) / std_q[:4])
    out = FrameOutput(
        pose=pose_out, global_pos=global_pos, iterations=final.t,
        loss_pos=final.loss_pos, loss_rot=final.loss_rot,
        # decoded_latent, NOT final.latent: `aux.pose` above was decoded from
        # the PRE-step latent, and the pipelined runtime (pipeline.py) records
        # the same value — both runtimes must agree on FrameOutput.latent.
        latent=final.decoded_latent,
    )
    return global_pos, global_rot, displacement, heights, current_index, out


def _finish_frame(model: DragModel, hyper: DragHyper, state: DragState,
                  final: _OptCarry, target_buffer: jnp.ndarray,
                  target_ee_pos: jnp.ndarray) -> Tuple[DragState, FrameOutput]:
    """End-of-frame work on the (P, ·)-shaped ring-buffer state."""
    adj = (target_ee_pos[hyper.joint_adjustment[1]]
           if hyper.joint_adjustment is not None
           else jnp.zeros(3, target_ee_pos.dtype))
    global_pos, global_rot, displacement, heights, current_index, out = \
        _advance_core(model, hyper, state.global_pos, state.current_index,
                      final, adj)
    new_state = DragState(
        latent=final.latent,
        global_pos=global_pos,
        global_rot=global_rot,
        latent_buffer=jnp.concatenate(
            (state.latent_buffer[1:], final.decoded_latent[None]), axis=0
        ),
        displacement_buffer=jnp.concatenate(
            (state.displacement_buffer[1:], displacement[None]), axis=0
        ),
        heights_buffer=jnp.concatenate(
            (state.heights_buffer[1:], heights[None]), axis=0
        ),
        target_buffer=target_buffer,
        current_index=current_index,
    )
    return new_state, out


def frame_step(
    model: DragModel,
    statics: vae.VAEStatics,
    skeleton: Skeleton,
    hyper: DragHyper,
    tparam,
    state: DragState,
    target_ee_pos: jnp.ndarray,   # (J, 3), garbage at inactive joints
    target_ee_rot: jnp.ndarray,   # (J, 3, 3)
    batched: bool = False,
) -> Tuple[DragState, FrameOutput]:
    """One frame of drag optimization (reference ``DragPose.run``).

    ``batched=True`` marks a call that will run under ``vmap``: the rollout
    gate becomes compute+select instead of ``lax.cond`` — under a batched
    predicate both cond branches execute anyway, and cond batching
    instantiates the model weights along the batch, which demotes the
    transformer matmuls to per-sequence GEMVs (VPU loops, measured 8×)."""
    target_buffer, target_latent = _begin_frame(model, hyper, tparam, state,
                                                batched=batched)
    final = _optimize(
        state.latent, model, statics, skeleton, hyper, state.global_pos,
        state.global_rot, target_ee_pos, target_ee_rot, target_latent,
    )
    return _finish_frame(model, hyper, state, final, target_buffer,
                         target_ee_pos)


# ---------------------------------------------------------------------------
# Offline evaluation: GT-driven targets + scan over all frames
# ---------------------------------------------------------------------------

def _eval_targets(model: DragModel, skeleton: Skeleton, state: DragState,
                  dqs_norm, gt_global_pos, gt_global_rot):
    """Build per-frame end-effector targets from ground truth
    (reference ``eval_drag.py:164-202``)."""
    mean_q, std_q = _quat_stats(model)
    qs = dqs_norm.reshape(-1, 8)[:, :4] * std_q.reshape(-1, 4) + mean_q.reshape(-1, 4)
    rs = qs.at[0].set(gt_global_rot)
    displacement = gt_global_pos - state.global_pos
    positions, world_quats = fk.fk_root_space(rs, displacement, skeleton)
    return positions, quat.to_matrix(world_quats)


def eval_frame_step(model, statics, skeleton, hyper, tparam, state,
                    frame_inputs, batched: bool = False):
    dqs_norm, gt_pos, gt_rot = frame_inputs
    tpos, trot = _eval_targets(model, skeleton, state, dqs_norm, gt_pos, gt_rot)
    return frame_step(model, statics, skeleton, hyper, tparam, state, tpos,
                      trot, batched=batched)


def run_sequence(model, statics, skeleton, hyper: DragHyper, tparam,
                 state: DragState, dqs_norm, gt_pos, gt_rot,
                 batched: bool = False):
    """Reconstruct a full sequence (un-jitted building block; prefer
    :class:`DragEngine` which compiles this once)."""

    def step(carry, inputs):
        return eval_frame_step(model, statics, skeleton, hyper, tparam,
                               carry, inputs, batched=batched)

    return jax.lax.scan(step, state, (dqs_norm, gt_pos, gt_rot))


class DragEngine:
    """Compiled drag runtime for a fixed (skeleton, hyper, temporal-config).

    Static structure (topology, hyperparameters) is closed over; model
    weights and state are traced arguments, so weight updates and batching
    never recompile.  Exposes:

    * ``init_state(key, pose, gp, gr, heights)`` — encode + seed buffers;
    * ``step(state, target_ee_pos, target_ee_rot)`` — one realtime frame;
    * ``run(state, dqs_norm, gt_pos, gt_rot)`` — offline full-sequence scan;
    * ``run_batch(...)`` — the same, vmapped over a leading batch axis.
    """

    def __init__(self, model: DragModel, statics, skeleton: Skeleton,
                 hyper: DragHyper, tparam):
        # Fold the decoder into 3 dense matmuls (halves the op count on the
        # sequential optimization chain), then pin all weights on device:
        # host-resident params would be re-uploaded on every dispatch
        # (~5 MB/frame — fatal for realtime stepping over a tunneled TPU).
        if not (isinstance(model.decoder, dict) and "ws" in model.decoder):
            model = model._replace(
                decoder=vae.fold_decoder(model.decoder, statics)
            )
        self.model = jax.device_put(model)
        self.statics = statics
        self.skeleton = skeleton
        self.hyper = hyper
        self.tparam = tparam

        def _init(model, key, pose, gp, gr, heights):
            return init_state(model, statics, hyper, key, pose, gp, gr, heights)

        def _step(model, state, tpos, trot):
            return frame_step(model, statics, skeleton, hyper, tparam,
                              state, tpos, trot)

        def _run(model, state, dqs, gp, gr):
            return run_sequence(model, statics, skeleton, hyper, tparam,
                                state, dqs, gp, gr)

        def _run_b(model, state, dqs, gp, gr):
            return run_sequence(model, statics, skeleton, hyper, tparam,
                                state, dqs, gp, gr, batched=True)

        def _step_rt(model, state, tpos, trot_quats):
            # Fused realtime frame: target quats→matrices, the frame step,
            # and root-space→parent-local conversion all in ONE device
            # program — the embedded client pays a single dispatch+fetch
            # per frame instead of three (host eager ops cost a tunnel/IPC
            # round trip each in the DLL deployment).
            trot = quat.to_matrix(trot_quats)
            new_state, out = frame_step(model, statics, skeleton, hyper,
                                        tparam, state, tpos, trot)
            mean_q, std_q = _quat_stats(model)
            rs = (out.pose * std_q + mean_q).reshape(-1, 4)
            local = fk.from_root_quat(rs, skeleton)
            return new_state, local, out.global_pos

        self._init = jax.jit(_init)
        self._step = jax.jit(_step)
        self._step_rt = jax.jit(_step_rt)
        self._run = jax.jit(_run)
        self._run_batch = jax.jit(
            jax.vmap(_run_b, in_axes=(None, 0, 0, 0, 0))
        )
        self._run_pipelined = {}  # sync_k -> jitted pipelined runner

    def init_state(self, key, initial_pose, initial_global_pos,
                   initial_global_rot, initial_heights) -> DragState:
        return self._init(self.model, key, initial_pose, initial_global_pos,
                          initial_global_rot, initial_heights)

    def step_realtime(self, state, target_ee_pos, target_ee_rot_quats):
        """One fused realtime frame: (new_state, parent-local wxyz (J,4),
        global_pos (3,)) from dense targets with QUATERNION rotations."""
        return self._step_rt(self.model, state, target_ee_pos,
                             target_ee_rot_quats)

    def step(self, state, target_ee_pos, target_ee_rot):
        return self._step(self.model, state, target_ee_pos, target_ee_rot)

    def run(self, state, dqs_norm, gt_pos, gt_rot):
        return self._run(self.model, state, dqs_norm, gt_pos, gt_rot)

    def run_batch(self, states, dqs_norm, gt_pos, gt_rot):
        return self._run_batch(self.model, states, dqs_norm, gt_pos, gt_rot)

    def run_batch_pipelined(self, states, dqs_norm, gt_pos, gt_rot,
                            sync_k: int = 24, lengths=None,
                            fast: Optional[bool] = None):
        """``run_batch`` with the sync-every-K pipelined loop (equivalent
        per-lane behavior, measured bitwise-identical on TPU; see
        ``drag/pipeline.py``).  ``lengths`` (B,) lets ragged batches halt
        per lane at their true frame count instead of reconstructing
        padding.  ``fast`` selects the batch-in-lanes inner loop
        (``drag/fast_iter.py``; default: auto when eligible)."""
        from dragposer_tpu.drag import pipeline

        key = (sync_k, fast)
        if key not in self._run_pipelined:
            def _run_p(model, state, dqs, gp, gr, lens):
                return pipeline.run_batch_pipelined(
                    model, self.statics, self.skeleton, self.hyper,
                    self.tparam, state, dqs, gp, gr, sync_k=sync_k,
                    lengths=lens, fast=fast,
                )
            self._run_pipelined[key] = jax.jit(_run_p)
        if lengths is None:
            lengths = jnp.full((dqs_norm.shape[0],), dqs_norm.shape[1],
                               jnp.int32)
        return self._run_pipelined[key](self.model, states, dqs_norm,
                                        gt_pos, gt_rot,
                                        jnp.asarray(lengths, jnp.int32))
