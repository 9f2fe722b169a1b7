"""Pipelined batched runtime vs the plain vmapped scan.

The sync-every-K pipelined loop (``drag/pipeline.py``) runs the same
per-lane math in the same per-lane order as ``run_batch``.  The two loop
structures compile differently, so results are equal only up to compiler
fp-reassociation — and the early-stop rule (reference
``drag_pose.py:300-304``) amplifies ulp-level differences: one flipped
iteration count changes that lane's trajectory from there on (the ring
buffers feed forward).  On some XLA build environments the two paths match
bitwise; on others they drift.  The contract is therefore verified in two
parts:

* **Lockstep bookkeeping equality** (``max_iter=1``): with early exit
  impossible, every lane does exactly one Adam step per frame in both
  runtimes, so targets, ring buffers, rollout ``current_index`` cycling,
  and output writes must agree tightly frame-for-frame.
* **Early-stop equivalence** (normal ``max_iter``): per-frame iteration
  counts agree on ≥90% of frames, total optimization work matches within
  5%, and tracking quality (final per-frame position loss) is
  statistically indistinguishable.
"""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


def _build(example_bvh_path, use_temporal, window_key, max_iter=20):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config(window_key),
        use_temporal=use_temporal, skeleton=sk, max_iter=max_iter,
    )
    m = encoding.encode_motion(offsets, pos[2000:2030, 0, :], rots[2000:2030],
                               sk, height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)

    b = 4
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    # per-lane phase offsets so iteration counts differ across lanes — the
    # pipelining exists exactly for that case
    dqs = np.stack([np.roll(n.dqs, -i, axis=0) for i in range(b)])
    gp = np.stack([np.roll(n.global_pos, -i, axis=0) for i in range(b)])
    gr = np.stack([np.roll(n.global_rot, -i, axis=0) for i in range(b)])
    h0 = jnp.tile(jnp.asarray(m.heights[0])[None], (b, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)
    return engine, states, dqs, gp, gr


def _assert_lockstep(out, ref, atol=2e-3):
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               rtol=1e-3, atol=atol)
    np.testing.assert_allclose(np.asarray(out.global_pos),
                               np.asarray(ref.global_pos),
                               rtol=1e-3, atol=atol)


def _assert_equivalent(out, ref, min_agree=0.9):
    it_o = np.asarray(out.iterations).astype(int)
    it_r = np.asarray(ref.iterations).astype(int)
    frac = (it_o == it_r).mean()
    assert frac >= min_agree, f"iteration agreement only {frac:.2%}"
    assert abs(it_o.sum() - it_r.sum()) <= max(2, 0.05 * it_r.sum()), (
        it_o.sum(), it_r.sum())
    lp_o = np.asarray(out.loss_pos).mean()
    lp_r = np.asarray(ref.loss_pos).mean()
    assert lp_o <= lp_r * 1.15 + 1e-6, (lp_o, lp_r)
    assert lp_r <= lp_o * 1.15 + 1e-6, (lp_o, lp_r)


@pytest.mark.parametrize("sync_k", [1, 8])
def test_pipelined_bookkeeping_lockstep(example_bvh_path, sync_k):
    """max_iter=1 removes early-stop knife edges: both runtimes perform the
    identical one-step-per-frame computation, so any disagreement is a
    pipelined bookkeeping bug (targets, buffers, output writes)."""
    engine, states, dqs, gp, gr = _build(example_bvh_path, False,
                                         "6_trackers", max_iter=1)
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=sync_k)
    _assert_lockstep(out, ref)


def test_pipelined_bookkeeping_lockstep_windowed(example_bvh_path):
    """window > 0 (4-tracker config) in lockstep: per-lane current_index
    cycling and the rollout hold must survive the pipelined interleaving."""
    engine, states, dqs, gp, gr = _build(example_bvh_path, True, "4_trackers",
                                         max_iter=1)
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=4)
    _assert_lockstep(out, ref)


@pytest.mark.parametrize("sync_k", [8, 32])
def test_pipelined_equivalent_no_temporal(example_bvh_path, sync_k):
    engine, states, dqs, gp, gr = _build(example_bvh_path, False, "6_trackers")
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=sync_k)
    _assert_equivalent(out, ref)


def test_pipelined_equivalent_temporal_window0(example_bvh_path):
    """Rollout-every-frame path (6-tracker config, window 0)."""
    engine, states, dqs, gp, gr = _build(example_bvh_path, True, "6_trackers",
                                         max_iter=12)
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=16)
    _assert_equivalent(out, ref)


def test_pipelined_ragged_lengths(example_bvh_path):
    """With per-lane ``lengths``, each lane's real frames reproduce the
    single-sequence trajectory of that length (lockstep mode); padded tail
    outputs are zeros and never computed."""
    import jax

    engine, states, dqs, gp, gr = _build(example_bvh_path, False,
                                         "6_trackers", max_iter=1)
    lengths = np.array([30, 12, 20, 5], dtype=np.int32)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=8,
                                        lengths=lengths)
    it_o = np.asarray(out.iterations).astype(int)
    po = np.asarray(out.pose)
    for i, L in enumerate(lengths):
        s_i = jax.tree.map(lambda a: a[i], states)
        _, ref = engine.run(s_i, dqs[i, :L], gp[i, :L], gr[i, :L])
        np.testing.assert_array_equal(it_o[i, :L],
                                      np.asarray(ref.iterations))
        np.testing.assert_allclose(po[i, :L], np.asarray(ref.pose),
                                   rtol=1e-3, atol=5e-3)
        # padded tail untouched
        assert (it_o[i, L:] == 0).all()
        np.testing.assert_array_equal(po[i, L:], 0.0)


def test_rollout_where_needed_matches_full(example_bvh_path):
    """Sub-batch rollout (gather → rollout → row-scatter) equals the
    full-batch rollout with a per-lane select, in both regimes: n_need ≤
    budget (sub-batch path) and n_need > budget (fallback).  Equality is
    ulp-tight, not bitwise: XLA vectorizes the (R, ·) and (B, ·) batches
    differently (SIMD remainders on CPU, lane tiling on TPU)."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.ops.topology import Skeleton

    # the reference model dir has no temporal net (use_temporal silently
    # degrades); the repo's example model dir carries temporal.npz
    bvh = BVH().load(example_bvh_path)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, _, _ = build_engine(
        "models/model_dancedb_example", parents, resolve_config("4_trackers"),
        use_temporal=True, skeleton=sk, max_iter=4)
    model, hyper, tparam = engine.model, engine.hyper, engine.tparam
    assert hyper.use_temporal and model.temporal is not None

    B = 24
    r = eng.rollout_lane_budget(B, hyper.temporal_future_window)
    assert 8 <= r < B, "test must exercise the sub-batch path"

    key = jax.random.PRNGKey(7)
    P = len(hyper.past_frames)
    L = model.means_latent.shape[-1]
    H = len(hyper.height_indices)
    ks = jax.random.split(key, 5)
    lat = jax.random.normal(ks[0], (B, P - 1, L))
    disp = jax.random.normal(ks[1], (B, P - 1, 3)) * 0.01
    hts = jax.random.normal(ks[2], (B, P - 1, H))
    tok0 = jax.random.normal(ks[3], (B, L))

    full = eng._temporal_rollout_core_T(model, hyper, tparam, lat, disp,
                                        hts, tok0)
    tbuf = jax.random.normal(ks[4], full.shape)

    for n_need in (0, 3, r, r + 1, B):  # both sides of the budget
        need = np.zeros(B, bool)
        need[np.linspace(0, B - 1, max(n_need, 1), dtype=int)[:n_need]] = 1
        got = eng._rollout_where_needed(
            model, hyper, tparam, lat, disp, hts, tok0,
            jnp.asarray(need), tbuf)
        ref = jnp.where(jnp.asarray(need)[:, None, None], full, tbuf)
        # the sub-batch path runs the SAME per-lane arithmetic, but as a
        # differently-shaped compiled program: XLA's batch vectorization
        # (SIMD remainders on CPU — and, under the axon sitecustomize
        # hook's CPU flags, different codegen again) reassociates the
        # per-step reductions, and the rollout is AUTOREGRESSIVE over
        # W+1 steps, so ulp-level step noise amplifies down the buffer
        # rows.  Portable assertions: the first rollout row (one
        # transformer pass, no amplification) is tight; whole-buffer
        # agreement is sanity-bounded.  (Observed on one host: plain env
        # max|Δ| ~1e-6, axon-hook env max|Δ| 4.3e-3 on the last rows.)
        np.testing.assert_allclose(np.asarray(got)[:, 0],
                                   np.asarray(ref)[:, 0],
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"n_need={n_need} row0")
        # whole-buffer bound at the observed cross-program envelope with
        # ~4x margin (worst seen 4.3e-3 absolute): tight enough that a
        # real gather/scatter or row-permutation bug in later rows fails,
        # loose enough for autoregressive fp divergence (advisor, r4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-2, atol=2e-2,
                                   err_msg=f"n_need={n_need}")
        # un-needed lanes keep their buffer BITWISE (pure select)
        keep = ~need
        np.testing.assert_array_equal(np.asarray(got)[keep],
                                      np.asarray(tbuf)[keep])
        # needed lanes in the n_need <= budget regime: the fallback and
        # sub-batch programs agree bitwise with THEMSELVES across calls
        got2 = eng._rollout_where_needed(
            model, hyper, tparam, lat, disp, hts, tok0,
            jnp.asarray(need), tbuf)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))


def test_pipelined_windowed_temporal_subbatch_lockstep(example_bvh_path):
    """End-to-end pipelined run on a windowed config WITH the temporal
    net (B > rollout budget, so the sub-batch gather/scatter path runs),
    against the plain batched runtime.  The reference-model fixture has
    no temporal net — this builds from the repo's example model dir."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        "models/model_dancedb_example", parents, resolve_config("4_trackers"),
        use_temporal=True, skeleton=sk, max_iter=1)
    assert engine.hyper.use_temporal

    b = 12  # > rollout_lane_budget(12, 16) = 8 → sub-batch path runs
    assert eng.rollout_lane_budget(b, engine.hyper.temporal_future_window) < b
    m = encoding.encode_motion(offsets, pos[2000:2010, 0, :],
                               rots[2000:2010], sk,
                               height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)
    dqs = np.stack([np.roll(n.dqs, -i, axis=0) for i in range(b)])
    gp = np.stack([np.roll(n.global_pos, -i, axis=0) for i in range(b)])
    gr = np.stack([np.roll(n.global_rot, -i, axis=0) for i in range(b)])
    h0 = jnp.tile(jnp.asarray(m.heights[0])[None], (b, 1))
    keys = jax.random.split(jax.random.PRNGKey(1), b)
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)

    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=1000)
    _assert_lockstep(out, ref)
