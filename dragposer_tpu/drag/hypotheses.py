"""Sequential hypothesis beam for underconstrained tracker configs.

``eval_drag --restarts N`` (``cli/eval_drag.py:run_restarts``) reconstructs
the SAME sequence from N latent inits and keeps ONE whole run by tracker-fit
loss.  That helps the degenerate 3-tracker regime (~35% MPJPE cut), but a
whole-clip winner is a blunt instrument: the committed 8-seed sweep
(``PARITY.json.seed_sweep_3_trackers``) shows different inits winning
different *stretches* of the clip — the drag objective is non-convex and a
lane that nails the first dance phrase can fall into a bad basin later.

This module upgrades restarts to a sequential beam (resampling Monte Carlo
over drag states): run R hypothesis lanes concurrently — the marginal cost
of R = 16 lanes on a TPU is near zero next to the reference's
one-CPU-frame-at-a-time loop (``drag_pose.py:196-414``) — and every
``branch_every`` frames

1. extend each lane's cumulative tracker-fit loss (position + rotation
   terms of the drag objective — NO ground truth) and its private
   trajectory lineage;
2. resample: the ``survivors`` best lineages continue; every other lane is
   re-seeded from one of them with a latent perturbation
   ``z ← z_parent + σ · stds_latent · ε`` (each survivor keeps one exact,
   unperturbed continuation, so the beam can never lose its incumbents to
   re-seeding);
3. at the end, emit the lineage with the lowest cumulative fit loss.

Lineages make commitment *lazy*: unlike a greedy per-chunk winner, a lane
that looks best for one chunk but ruins the next is out-competed by a
sibling lineage that stayed consistent — measured, this removes the
greedy variant's seed fragility.  With ``survivors=1`` the beam degrades
to greedy per-chunk commit; with ``branch_every >= n_frames`` to
``--restarts``; with R = 1 it computes the same trajectory as the anchor
``engine.run`` path.  Chunking a ``lax.scan`` is exact — bit-identical
WITHIN one compiled program (tested: chunked ``run_batch`` vs one-chunk
``run_batch``).  Against ``engine.run`` — a separately compiled program —
agreement is fp-level only: XLA codegen (fusion/vectorization choices)
differs across programs and hosts, and the drag objective amplifies
ulp-level input differences over thousands of frames, so cross-program
bitwise equality is not a portable invariant.  The reference has no analog
of any of these modes: its init is one fixed seed (``drag_pose.py:47-64``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.drag import engine as eng


def run_hypotheses(engine: "eng.DragEngine", key, n_hypotheses: int,
                   dqs, gp, gr, heights0, initial_pose, *,
                   branch_every: int = 512, sigma: float = 0.25,
                   survivors: int = 8, return_all: bool = False):
    """Beam-drag a full sequence.

    Args:
      engine: compiled :class:`DragEngine`.
      key: PRNG key (init diversity + re-branch noise).
      n_hypotheses: beam width R.
      dqs/gp/gr: the normalized sequence inputs (T, ...) as for
        ``engine.run``.
      heights0/initial_pose: initial-state seeds as for ``init_state``.
      branch_every: frames between resampling points.
      sigma: re-seed latent noise scale, in units of the model's
        per-dimension latent stds.
      survivors: lineages kept alive at each resampling point (clamped to
        R; 1 = greedy per-chunk commit).

    Returns:
      (out, parents, scores): ``out`` is the winning lineage's trajectory
      as a stacked FrameOutput pytree of length T; ``parents`` the
      resampling map per chunk (n_chunks, R) — ``parents[c, j]`` is the
      lane whose lineage lane ``j`` carried INTO chunk ``c``; ``scores``
      the per-chunk per-lane fit losses (n_chunks, R).

      With ``return_all=True``, ``out`` instead stacks EVERY surviving
      lineage with a leading R axis and a fourth element ``cum`` (R,) —
      the final cumulative fit losses (winner = argmin) — is appended.
      Diagnostic surface for selection-quality studies
      (``tools/diag_beam_selection.py``); the product path keeps the
      3-tuple shape.
    """
    R = int(n_hypotheses)
    K = max(1, min(int(survivors), R))
    T = dqs.shape[0]
    key, init_key = jax.random.split(key)
    keys = jax.random.split(init_key, R)
    states = jax.vmap(
        lambda k: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            initial_pose, gp[0], gr[0], heights0,
        )
    )(keys)

    stds_latent = engine.model.stds_latent

    @jax.jit
    def _resample(states, parent_idx, noise_key):
        """states[j] ← states[parent_idx[j]]; perturb lanes j >= K."""
        base = jax.tree.map(lambda a: a[parent_idx], states)
        eps = jax.random.normal(noise_key,
                                (R,) + states.latent.shape[1:],
                                states.latent.dtype)
        keep = (jnp.arange(R) < K)[:, None]  # exact survivor continuations
        eps = jnp.where(keep, 0.0, eps)
        return base._replace(latent=base.latent + sigma * stds_latent * eps)

    # per-lane lineage: list of host chunk pytrees + cumulative fit loss
    hist = [[] for _ in range(R)]
    cum = np.zeros(R)
    parents_log, scores_log = [], []
    chunk_starts = list(range(0, T, branch_every))
    for ci, lo in enumerate(chunk_starts):
        hi = min(lo + branch_every, T)
        dqs_c = np.broadcast_to(dqs[lo:hi], (R, hi - lo) + dqs.shape[1:])
        gp_c = np.broadcast_to(gp[lo:hi], (R, hi - lo) + gp.shape[1:])
        gr_c = np.broadcast_to(gr[lo:hi], (R, hi - lo) + gr.shape[1:])
        states, out = engine.run_batch(states, dqs_c, gp_c, gr_c)
        out = jax.tree.map(np.asarray, out)
        score = out.loss_pos.mean(axis=1) + out.loss_rot.mean(axis=1)
        frac = (hi - lo) / T
        cum = cum + score * frac
        for j in range(R):
            hist[j].append(jax.tree.map(lambda a, j=j: a[j], out))
        scores_log.append(score)

        last = hi >= T
        if R > 1 and not last:
            order = np.argsort(cum)          # best lineages first
            surv = order[:K]
            parent_idx = np.asarray([surv[j % K] for j in range(R)])
            key, nk = jax.random.split(key)
            states = _resample(states, jnp.asarray(parent_idx), nk)
            hist = [list(hist[p]) for p in parent_idx]
            cum = cum[parent_idx]
            parents_log.append(parent_idx)
        else:
            parents_log.append(np.arange(R))

    if return_all:
        lineages = [
            jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *hist[j])
            for j in range(R)
        ]
        out = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *lineages)
        return out, np.stack(parents_log), np.stack(scores_log), cum
    best = int(np.argmin(cum))
    out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *hist[best])
    return out, np.stack(parents_log), np.stack(scores_log)


def run_hypotheses_batched(engine: "eng.DragEngine", key, n_hypotheses: int,
                           dqs, gp, gr, heights0, initial_poses, *,
                           lengths=None, branch_every: int = 512,
                           sigma: float = 0.25, survivors: int = 8):
    """Beam-drag F sequences concurrently: the directory-mode counterpart
    of :func:`run_hypotheses` (used by ``eval_drag --batch`` and the
    daemon's ``eval_batch`` when branching is enabled).

    All F·R lanes run as ONE batched device program per chunk; scoring,
    lineage bookkeeping, and resampling happen independently per file.
    Padded tail frames (files shorter than the longest — ``lengths``) are
    masked out of the fit scores so padding never drives selection.

    Args:
      dqs/gp/gr: (F, T, ...) padded sequence inputs.
      heights0: (F, H); initial_poses: (F, C, W).
      lengths: (F,) true frame counts (default: all T).

    Returns:
      (out, cum): ``out`` — the winning lineage per file as a stacked
      FrameOutput pytree with leading (F, T) axes; ``cum`` — (F, R) final
      cumulative fit losses (winning lane = argmin per row).
    """
    R = int(n_hypotheses)
    K = max(1, min(int(survivors), R))
    F, T = dqs.shape[0], dqs.shape[1]
    lengths = np.full((F,), T) if lengths is None else np.asarray(lengths)

    key, init_key = jax.random.split(key)
    keys = jax.random.split(init_key, F * R).reshape(F, R, -1)
    states = jax.vmap(jax.vmap(
        lambda k, p, g0, r0, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k, p, g0, r0, h),
        in_axes=(0, None, None, None, None)))(
            keys, jnp.asarray(initial_poses), jnp.asarray(gp[:, 0]),
            jnp.asarray(gr[:, 0]), jnp.asarray(heights0))
    # flatten (F, R) lanes → (F·R)
    states = jax.tree.map(
        lambda a: a.reshape((F * R,) + a.shape[2:]), states)

    stds_latent = engine.model.stds_latent

    @jax.jit
    def _resample(states, parent_flat, noise_key, keep_flat):
        base = jax.tree.map(lambda a: a[parent_flat], states)
        eps = jax.random.normal(noise_key,
                                (F * R,) + states.latent.shape[1:],
                                states.latent.dtype)
        eps = jnp.where(keep_flat[:, None], 0.0, eps)
        return base._replace(latent=base.latent + sigma * stds_latent * eps)

    def rep(x):  # (F, T, ...) → (F·R, T, ...) lane replication
        return np.broadcast_to(
            x[:, None], (F, R) + x.shape[1:]).reshape((F * R,) + x.shape[1:])

    hist = [[[] for _ in range(R)] for _ in range(F)]
    cum = np.zeros((F, R))
    keep_template = np.zeros((F, R), bool)
    keep_template[:, :K] = True
    for lo in range(0, T, branch_every):
        hi = min(lo + branch_every, T)
        states, out = engine.run_batch(states, rep(dqs[:, lo:hi]),
                                       rep(gp[:, lo:hi]),
                                       rep(gr[:, lo:hi]))
        out = jax.tree.map(np.asarray, out)
        # mask padded frames out of the fit score, per file
        valid = (np.arange(lo, hi)[None] < lengths[:, None])  # (F, C)
        w = np.repeat(valid, R, axis=0).astype(np.float64)    # (F·R, C)
        denom = np.maximum(w.sum(axis=1), 1.0)
        score = ((out.loss_pos * w).sum(axis=1)
                 + (out.loss_rot * w).sum(axis=1)) / denom
        cum = cum + (score * (w.sum(axis=1) / np.maximum(lengths.repeat(R)
                                                         .astype(np.float64),
                                                         1.0))).reshape(F, R)
        for f in range(F):
            for j in range(R):
                hist[f][j].append(
                    jax.tree.map(lambda a, i=f * R + j: a[i], out))

        if R > 1 and hi < T:
            order = np.argsort(cum, axis=1)            # (F, R), best first
            parent = np.stack(
                [order[:, j % K] for j in range(R)], axis=1)  # (F, R)
            parent_flat = (np.arange(F)[:, None] * R + parent).reshape(-1)
            key, nk = jax.random.split(key)
            states = _resample(states, jnp.asarray(parent_flat), nk,
                               jnp.asarray(keep_template.reshape(-1)))
            hist = [[list(hist[f][p]) for p in parent[f]] for f in range(F)]
            cum = np.take_along_axis(cum, parent, axis=1)

    best = cum.argmin(axis=1)
    per_file = [
        jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                     *hist[f][int(best[f])])
        for f in range(F)
    ]
    out = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_file)
    return out, cum
