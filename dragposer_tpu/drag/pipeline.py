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

from dragposer_tpu.drag import engine as eng
from dragposer_tpu.drag import fast_iter


class _PipeCarry(NamedTuple):
    opt: eng._OptCarry            # batched Adam state, leaves (B, ...)
    state: eng.DragState          # batched recurrent state
    target_buffer: jnp.ndarray    # (B, W+1, L) rollout predictions
    target_latent: jnp.ndarray    # (B, L) this frame's temporal target
    tpos: jnp.ndarray             # (B, J, 3) end-effector position targets
    trot: jnp.ndarray             # (B, J, 3, 3) end-effector rotation targets
    frame: jnp.ndarray            # (B,) int32 — the frame each lane is solving
    outs: eng.FrameOutput         # (B, T, ...) completed-frame outputs


def _select(mask, new, old):
    """Per-lane select over a pytree whose leaves lead with the batch dim."""
    def sel(n, o):
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


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
    (B, T, ...)), faster at large batch by not paying the per-frame batch
    max of the Adam while-loop.

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

    def begin_all(state_b):
        return jax.vmap(
            lambda s: eng._begin_frame(model, hyper, tparam, s, batched=True)
        )(state_b)

    def targets_all(state_b, f_idx):
        take = jax.vmap(
            lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
        )
        d, p, r = take(dqs_norm, f_idx), take(gt_pos, f_idx), take(gt_rot, f_idx)
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

    def finish_b(state_b, opt, tbuf, tpos):
        return jax.vmap(
            lambda s, c, tb, tp: eng._finish_frame(model, hyper, s, c, tb, tp)
        )(state_b, opt, tbuf, tpos)

    # ------------------------------------------------------------------
    # Prologue: every lane begins frame 0.
    # ------------------------------------------------------------------
    tbuf0, tlat0 = begin_all(states)
    tpos0, trot0 = targets_all(states, jnp.zeros((B,), jnp.int32))
    opt0 = opt_init_b(states.latent)
    outs0 = eng.FrameOutput(
        pose=jnp.zeros((B, T, n_joints * 4)),
        global_pos=jnp.zeros((B, T, 3)),
        iterations=jnp.zeros((B, T), jnp.int32),
        loss_pos=jnp.zeros((B, T)),
        loss_rot=jnp.zeros((B, T)),
    )
    carry0 = _PipeCarry(opt0, states, tbuf0, tlat0, tpos0, trot0,
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

        new_state, out = finish_b(c.state, opt, c.target_buffer, c.tpos)
        state = _select(done, new_state, c.state)

        outs = _write_rows(c.outs, jnp.minimum(c.frame, T - 1), done, out, T)

        frame = c.frame + done.astype(jnp.int32)
        f_next = jnp.minimum(frame, T - 1)

        # Advanced lanes BEGIN their next frame (rollout + GT targets +
        # fresh Adam); others keep their in-flight values.
        tbuf_new, tlat_new = begin_all(state)
        target_buffer = _select(done, tbuf_new, c.target_buffer)
        target_latent = _select(done, tlat_new, c.target_latent)

        tpos_new, trot_new = targets_all(state, f_next)
        tpos = _select(done, tpos_new, c.tpos)
        trot = _select(done, trot_new, c.trot)

        opt = _select(done, opt_init_b(state.latent), opt)

        return _PipeCarry(opt, state, target_buffer, target_latent, tpos,
                          trot, frame, outs)

    final = jax.lax.while_loop(cond, body, carry0)
    return final.state, final.outs
