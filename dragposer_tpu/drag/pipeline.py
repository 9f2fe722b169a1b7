"""Pipelined batched drag reconstruction: sync-every-K decoupled lanes.

The straightforward batched runtime (``DragEngine.run_batch``) vmaps a
``lax.scan`` over frames whose body contains a ``lax.while_loop`` — under
vmap every sequence in the batch pays the *max* iteration count of that
frame row (~100 when any lane straggles, against a mean of ~17; the
while-loop was ~2.2 ms of the ~3.05 ms frame budget at batch 512).

This module flips the loop structure: ONE global iteration loop over the
whole batch, where each lane (sequence) owns a frame pointer and advances
through its own frames independently.  Every ``sync_k`` Adam iterations,
lanes that satisfied the per-frame stop rule *finish* their frame
(global-transform advance, ring buffers, output write) and *begin* the next
one (temporal rollout, GT targets, fresh Adam).  A straggler frame in one
lane no longer stalls the other lanes — they continue into their own
subsequent frames, so the cost per lane approaches its own mean iteration
count (rounded up to sync blocks) instead of the batch max.

Numerics run the same per-lane math in the same per-lane order (the same
``_opt_body``/``_opt_cond``/``_begin_frame``/``_finish_frame`` building
blocks); only the interleaving *across* lanes changes, which no per-lane
value depends on.  On TPU the two paths are measured bitwise-identical
(iteration counts, poses).  Caveat: the two loop structures may compile
with different fp reassociation on some backends (observed on XLA:CPU with
certain feature flags), and the early-stop rule amplifies ulp differences
into ±1 iteration counts; ``tests/test_pipeline.py`` therefore asserts
exact bookkeeping equality in a knife-edge-free mode plus statistical
equivalence under early stop.

Reference behavior reproduced: ``python/src/eval_drag.py`` full-sequence
evaluation over ``python/src/drag_pose.py`` (stop rule at
``drag_pose.py:300-304`` — evaluated on the previous iteration's losses).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.drag import engine as eng
from dragposer_tpu.drag import fast_iter


class _CompactOuts(NamedTuple):
    """Per-frame records kept inside the loop: the decoded LATENT (L≈16
    floats) instead of the decoded pose (4J≈88 floats).  The pose is a pure
    function of (latent, global_rot), so it is reconstructed in ONE large
    batched decode after the loop — the in-loop one-hot write was the
    second-largest per-block cost (~0.9 ms at B=1024, pure HBM traffic).

    Vector leaves are stored FLATTENED as (B, T·C), not (B, T, C): the TPU
    pads the minor (lane) dimension to 128, so a (B, T, 16) buffer occupies
    — and its per-block read-modify-write touches — 8× its logical bytes.
    Flat (B, T·C) has no lane padding."""

    latent: jnp.ndarray       # (B, T·L) decoded_latent per frame
    global_pos: jnp.ndarray   # (B, T·3)
    global_rot: jnp.ndarray   # (B, T·4)
    iterations: jnp.ndarray   # (B, T) int32
    loss_pos: jnp.ndarray     # (B, T)
    loss_rot: jnp.ndarray     # (B, T)


class _FlatState(NamedTuple):
    """Pipeline-internal DragState with FLATTENED ring buffers.

    A (B, P, C) buffer with small C pads its lane dimension to 128 on TPU,
    so the per-block shift+select read-modify-writes touch up to 40× their
    logical bytes (measured ~0.6 ms/block at B=1024).  Flat (B, P·C) has no
    padding; the rollout's sampled rows become static lane gathers.
    Converted from/to ``DragState`` once at pipeline entry/exit."""

    latent: jnp.ndarray               # (B, L)
    global_pos: jnp.ndarray           # (B, 3)
    global_rot: jnp.ndarray           # (B, 4)
    latent_buffer: jnp.ndarray        # (B, P·L)
    displacement_buffer: jnp.ndarray  # (B, P·3)
    heights_buffer: jnp.ndarray       # (B, P·H)
    target_buffer: jnp.ndarray        # (B, W+1, L)
    current_index: jnp.ndarray        # (B,)


def _flatten_state(s: eng.DragState) -> _FlatState:
    B = s.latent.shape[0]
    return _FlatState(
        latent=s.latent, global_pos=s.global_pos, global_rot=s.global_rot,
        latent_buffer=s.latent_buffer.reshape(B, -1),
        displacement_buffer=s.displacement_buffer.reshape(B, -1),
        heights_buffer=s.heights_buffer.reshape(B, -1),
        target_buffer=s.target_buffer, current_index=s.current_index,
    )


def _unflatten_state(f: _FlatState, P: int) -> eng.DragState:
    B = f.latent.shape[0]
    return eng.DragState(
        latent=f.latent, global_pos=f.global_pos, global_rot=f.global_rot,
        latent_buffer=f.latent_buffer.reshape(B, P, -1),
        displacement_buffer=f.displacement_buffer.reshape(B, P, -1),
        heights_buffer=f.heights_buffer.reshape(B, P, -1),
        target_buffer=f.target_buffer, current_index=f.current_index,
    )


def _rollout_inputs_flat(fs: _FlatState, hyper: eng.DragHyper, L: int,
                         H: int):
    """Per-lane equivalent of ``engine._rollout_inputs`` on flat buffers
    (static lane gathers instead of row indexing)."""
    past = np.asarray(hyper.past_frames)
    step = hyper.sample_step
    idx_lat = (past[:, None] * L + np.arange(L)[None, :]).ravel()
    latp = jnp.take(fs.latent_buffer, jnp.asarray(idx_lat)).reshape(
        len(past), L)
    acc = past[:-1, None] + np.arange(step)[None, :]
    idx_d = (acc[..., None] * 3 + np.arange(3)).ravel()
    disp_acc = jnp.take(fs.displacement_buffer, jnp.asarray(idx_d)).reshape(
        len(past) - 1, step, 3).sum(axis=1)
    idx_h = (past[:-1, None] * H + np.arange(H)[None, :]).ravel()
    heights = jnp.take(fs.heights_buffer, jnp.asarray(idx_h)).reshape(
        len(past) - 1, H)
    return latp[:-1], disp_acc, heights, latp[-1]




def _finish_frame_flat(model, hyper: eng.DragHyper, fs: _FlatState,
                       final: eng._OptCarry, target_buffer, adj_target,
                       L: int, H: int):
    """Flat-state equivalent of ``engine._finish_frame`` — the ring-buffer
    shift is a pure lane-dimension concatenation.  ``adj_target``: (3,)
    world target of the adjustment end effector (zeros when unused)."""
    global_pos, global_rot, displacement, heights, current_index, out = \
        eng._advance_core(model, hyper, fs.global_pos, fs.current_index,
                          final, adj_target)
    new = _FlatState(
        latent=final.latent, global_pos=global_pos, global_rot=global_rot,
        latent_buffer=jnp.concatenate(
            (fs.latent_buffer[L:], final.decoded_latent)),
        displacement_buffer=jnp.concatenate(
            (fs.displacement_buffer[3:], displacement)),
        heights_buffer=jnp.concatenate(
            (fs.heights_buffer[H:], heights)),
        target_buffer=target_buffer, current_index=current_index,
    )
    return new, out


class _PipeCarry(NamedTuple):
    opt: eng._OptCarry            # batched Adam state, leaves (B, ...)
    state: _FlatState             # batched recurrent state, flat buffers
    target_buffer: jnp.ndarray    # (B, W+1, L) rollout predictions
    target_latent: jnp.ndarray    # (B, L) this frame's temporal target
    tpos: jnp.ndarray             # fast: (J, 3, B) planes; else (B, J, 3)
    trot: jnp.ndarray             # fast: (J, 3, 3, B); else (B, J, 3, 3)
    frame: jnp.ndarray            # (B,) int32 — the frame each lane is solving
    outs: _CompactOuts            # (B, T, ...) completed-frame records


def _select(mask, new, old):
    """Per-lane select over a pytree whose leaves lead with the batch dim."""
    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


def _write_rows_flat(flat, frame, done, val, T):
    """Write ``val`` (B, C) into ``flat`` (B, T·C) at per-lane frame index,
    only where ``done`` — one-hot select on the unpadded flat layout."""
    Bv, TC = flat.shape
    C = TC // T
    onehot = done[:, None] & (jnp.arange(T)[None, :] == frame[:, None])
    m = jnp.broadcast_to(onehot[:, :, None], (Bv, T, C)).reshape(Bv, TC)
    v = jnp.broadcast_to(val[:, None, :], (Bv, T, C)).reshape(Bv, TC)
    return jnp.where(m, v, flat)


def _write_rows(tree, frame, done, vals, T):
    """Write ``vals`` leaves (B, ...) into ``tree`` leaves (B, T, ...) at the
    per-lane time index ``frame``, only where ``done``.

    Formulated as a one-hot masked select, NOT a scatter: a vmapped
    ``dynamic_update_index_in_dim`` lowers to an XLA scatter with per-lane
    indices, which the TPU serializes lane-by-lane — measured ~9 ms/block at
    batch 512, dwarfing everything else.  The dense select is pure VPU work
    (~90 MB of elementwise traffic) and costs ~0.2 ms."""
    onehot = done[:, None] & (jnp.arange(T)[None, :] == frame[:, None])  # (B,T)

    def w(a, v):
        m = onehot.reshape(onehot.shape + (1,) * (a.ndim - 2))
        return jnp.where(m, jnp.expand_dims(v, 1), a)

    return jax.tree.map(w, tree, vals)


def run_batch_pipelined(model, statics, skeleton, hyper: eng.DragHyper,
                        tparam, states: eng.DragState, dqs_norm, gt_pos,
                        gt_rot, sync_k: int = 24, lengths=None,
                        fast: bool | None = None):
    """Drop-in replacement for ``vmap(run_sequence)``: same inputs
    (``states`` batched, ``dqs_norm`` (B, T, J*8), ``gt_pos`` (B, T, 3),
    ``gt_rot`` (B, T, 4)), same outputs (final states, FrameOutput stacked
    (B, T, ...)).  2.5× the plain vmapped scan at batch 2048 (442k vs 179k
    frames/s on one v5e chip) from three structural changes: lanes advance
    through their own frames (no batch-max iteration tax), the inner Adam
    loop and rollout run in batch-in-lanes transposed layouts, and all
    in-loop accumulation uses unpadded flat buffers with the pose decoded
    once at the end.

    ``lengths`` (B,) optionally gives each lane's true frame count: lanes
    halt at their own length, so ragged directory batches stop paying for
    padding (the plain ``run_batch`` reconstructs the repeated-last-frame
    tail like any other frames).  Outputs at and beyond a lane's length are
    zeros; real-frame numerics are unchanged."""
    B, T = dqs_norm.shape[0], dqs_norm.shape[1]
    limit = jnp.full((B,), T, jnp.int32) if lengths is None \
        else jnp.minimum(jnp.asarray(lengths, jnp.int32), T)
    n_joints = skeleton.n_joints

    # Batch-in-lanes inner loop (drag/fast_iter.py, 3.1× per iteration)
    # whenever its preconditions hold; the vmapped per-lane path remains for
    # constraint bundles and unfolded decoders.
    if fast is None:
        fast = (not hyper.constraints
                and isinstance(model.decoder, dict) and "ws" in model.decoder)
    fast_ctx = fast_iter.make_context(model, skeleton, hyper) if fast else None

    L = states.latent.shape[-1]
    H = states.heights_buffer.shape[-1]
    P = states.latent_buffer.shape[1]

    def begin_all(state_b, began):
        """Batched flat-state equivalent of ``engine._begin_frame``: the
        buffer sampling is vmapped lane gathers; the transformer rollout
        runs in transposed layout (``forward_T``) — and, for windowed
        configs, only for the ``began & current_index == 0`` sub-batch
        (``engine._rollout_where_needed``): at window W, (W-1)/W of
        whole-batch rollouts would be computed and discarded."""
        if not hyper.use_temporal:
            return state_b.target_buffer, jnp.zeros_like(state_b.latent)
        lat, disp_acc, heights, token0 = jax.vmap(
            lambda s: _rollout_inputs_flat(s, hyper, L, H))(state_b)
        target_buffer = eng._rollout_where_needed(
            model, hyper, tparam, lat, disp_acc, heights, token0,
            began & (state_b.current_index == 0), state_b.target_buffer)
        target_latent = jax.vmap(lambda tb, ci: tb[ci])(
            target_buffer, state_b.current_index)
        return target_buffer, target_latent

    def targets_all(state_b, f_idx):
        take = jax.vmap(
            lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        )
        d, p, r = take(dqs_norm, f_idx), take(gt_pos, f_idx), take(gt_rot, f_idx)
        if fast:
            # whole-batch plane-math FK (the vmapped per-lane version
            # measured ~21% of the block at B=2048 — lane-4 layouts)
            return fast_iter.eval_targets_T(fast_ctx, hyper,
                                            state_b.global_pos, d, p, r)
        return jax.vmap(
            lambda s, dd, pp, rr: eng._eval_targets(model, skeleton, s, dd, pp, rr)
        )(state_b, d, p, r)

    opt_cond_b = jax.vmap(lambda c: eng._opt_cond(c, hyper))
    opt_init_b = jax.vmap(lambda lat: eng._opt_init(lat, n_joints))

    def opt_body_b(opt, state_b, tpos, trot, tlat):
        return jax.vmap(
            lambda c, gp, gr, tp, tr, tl: eng._opt_body(
                c, model, statics, skeleton, hyper, gp, gr, tp, tr, tl
            )
        )(opt, state_b.global_pos, state_b.global_rot, tpos, trot, tlat)

    def finish_b(state_b, opt, tbuf, adj_b):
        return jax.vmap(
            lambda s, c, tb, tp: _finish_frame_flat(model, hyper, s, c, tb,
                                                    tp, L, H)
        )(state_b, opt, tbuf, adj_b)

    def adj_targets(tpos):
        """(B, 3) world target of the adjustment EE (zeros when unused) —
        extracted without materializing a batch-leading (B, J, 3) array."""
        if hyper.joint_adjustment is None:
            return jnp.zeros((B, 3))
        ee = hyper.joint_adjustment[1]
        return tpos[ee].T if fast else tpos[:, ee]

    # ------------------------------------------------------------------
    # Prologue: every lane begins frame 0.
    # ------------------------------------------------------------------
    fstates = _flatten_state(states)
    tbuf0, tlat0 = begin_all(fstates, jnp.ones((B,), bool))
    tpos0, trot0 = targets_all(fstates, jnp.zeros((B,), jnp.int32))
    opt0 = opt_init_b(states.latent)
    outs0 = _CompactOuts(
        latent=jnp.zeros((B, T * L)),
        global_pos=jnp.zeros((B, T * 3)),
        global_rot=jnp.zeros((B, T * 4)),
        iterations=jnp.zeros((B, T), jnp.int32),
        loss_pos=jnp.zeros((B, T)),
        loss_rot=jnp.zeros((B, T)),
    )
    carry0 = _PipeCarry(opt0, fstates, tbuf0, tlat0, tpos0, trot0,
                        jnp.zeros((B,), jnp.int32), outs0)

    # ------------------------------------------------------------------
    # Global loop: K masked Adam steps, then a sync point.
    # ------------------------------------------------------------------
    def cond(c: _PipeCarry):
        return jnp.any(c.frame < limit)

    def body(c: _PipeCarry):
        lane_active = c.frame < limit
        if fast:
            opt = fast_iter.run_block(
                fast_ctx, hyper, sync_k, c.opt, lane_active, c.state,
                c.tpos, c.trot, c.target_latent, model, statics, skeleton,
            )
        else:
            def istep(opt, _):
                active = opt_cond_b(opt) & lane_active
                new = opt_body_b(opt, c.state, c.tpos, c.trot,
                                 c.target_latent)
                return _select(active, new, opt), None

            opt, _ = jax.lax.scan(istep, c.opt, None, length=sync_k,
                                  unroll=min(sync_k, 4))

        # Lanes whose stop rule now holds have FINISHED frame c.frame.
        done = (~opt_cond_b(opt)) & (c.frame < limit)

        new_state, _ = finish_b(c.state, opt, c.target_buffer,
                                adj_targets(c.tpos))
        state = _select(done, new_state, c.state)

        f_cl = jnp.minimum(c.frame, T - 1)
        outs = _CompactOuts(
            latent=_write_rows_flat(c.outs.latent, f_cl, done,
                                    opt.decoded_latent, T),
            global_pos=_write_rows_flat(c.outs.global_pos, f_cl, done,
                                        new_state.global_pos, T),
            global_rot=_write_rows_flat(c.outs.global_rot, f_cl, done,
                                        new_state.global_rot, T),
            iterations=_write_rows(c.outs.iterations, f_cl, done, opt.t, T),
            loss_pos=_write_rows(c.outs.loss_pos, f_cl, done,
                                 opt.loss_pos, T),
            loss_rot=_write_rows(c.outs.loss_rot, f_cl, done,
                                 opt.loss_rot, T),
        )

        frame = c.frame + done.astype(jnp.int32)
        f_next = jnp.minimum(frame, T - 1)

        # Advanced lanes BEGIN their next frame (rollout + GT targets +
        # fresh Adam); others keep their in-flight values.
        tbuf_new, tlat_new = begin_all(state, done)
        target_buffer = _select(done, tbuf_new, c.target_buffer)
        target_latent = _select(done, tlat_new, c.target_latent)

        tpos_new, trot_new = targets_all(state, f_next)
        if fast:  # (… , B) layout: mask broadcasts on the last axis
            tpos = jnp.where(done[None, None, :], tpos_new, c.tpos)
            trot = jnp.where(done[None, None, None, :], trot_new, c.trot)
        else:
            tpos = _select(done, tpos_new, c.tpos)
            trot = _select(done, trot_new, c.trot)

        opt = _select(done, opt_init_b(state.latent), opt)

        return _PipeCarry(opt, state, target_buffer, target_latent, tpos,
                          trot, frame, outs)

    final = jax.lax.while_loop(cond, body, carry0)
    co = final.outs

    # ------------------------------------------------------------------
    # Epilogue: reconstruct the pose outputs from the stored latents in
    # one large lane-efficient decode (B·T lanes at once).
    # ------------------------------------------------------------------
    from dragposer_tpu.models import vae

    mean_q, std_q = eng._quat_stats(model)
    pose_n, _ = vae.decode_folded_flat(
        model.decoder, co.latent.reshape(B * T, -1),
        model.mean_dqs, model.std_dqs,
    )
    pose = pose_n.reshape(B, T, -1)
    gr_btc = co.global_rot.reshape(B, T, 4)
    root = (gr_btc - mean_q[:4]) / std_q[:4]
    pose = jnp.concatenate((root, pose[..., 4:]), axis=-1)
    valid = (jnp.arange(T)[None, :] < limit[:, None])[..., None]
    pose = jnp.where(valid, pose, 0.0)

    outs = eng.FrameOutput(
        pose=pose,
        global_pos=co.global_pos.reshape(B, T, 3),
        iterations=co.iterations,
        loss_pos=co.loss_pos,
        loss_rot=co.loss_rot,
        latent=jnp.where(valid, co.latent.reshape(B, T, -1), 0.0),
    )
    return _unflatten_state(final.state, P), outs
