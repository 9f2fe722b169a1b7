"""Sequential hypothesis beam (drag/hypotheses.py) — mechanics.

(The quality effect — lineage-based beam resampling beats whole-clip
restarts on the degenerate 3-tracker regime — is measured on TPU over the
full clip and recorded in ROADMAP/PARITY; these tests guard the chunking
exactness, lineage bookkeeping, selection wiring, and determinism on CPU.)
"""

import jax
import numpy as np

from dragposer_tpu.config import HEIGHT_INDICES, VAE_PARAM
from dragposer_tpu.data import encoding
from dragposer_tpu.drag.hypotheses import run_hypotheses
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL

import pytest
pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


def _setup(example_bvh_path, config="3_trackers", frames=(2000, 2016),
           max_iter=6):
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config(config),
        use_temporal=False, skeleton=sk, max_iter=max_iter,
    )
    lo, hi = frames
    m = encoding.encode_motion(offsets, pos[lo:hi, 0, :], rots[lo:hi], sk,
                               height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)
    initial_pose = np.tile(n.dqs[0][:, None], (1, VAE_PARAM["window_size"]))
    return engine, n, m, initial_pose


def test_single_lane_chunked_equals_single_chunk_run(example_bvh_path):
    """R=1: chunking the scan must be BIT-identical to running the whole
    sequence as ONE chunk — both sides execute the same compiled
    ``run_batch`` program, so equality is a portable invariant (unlike a
    comparison against the separately-compiled ``engine.run``, whose
    XLA codegen differs across hosts; see the fp-level test below)."""
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(0)
    out, parents, scores = run_hypotheses(
        engine, key, 1, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=5)
    ref, parents1, _ = run_hypotheses(
        engine, key, 1, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=10_000)  # >= T: a single chunk
    np.testing.assert_array_equal(np.asarray(out.pose), np.asarray(ref.pose))
    np.testing.assert_array_equal(np.asarray(out.global_pos),
                                  np.asarray(ref.global_pos))
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    assert parents.shape == (4, 1) and np.all(parents == 0)
    assert parents1.shape == (1, 1)


def test_single_lane_tracks_anchor_run(example_bvh_path):
    """R=1 vs ``engine.run``: same trajectory at fp tolerance.  These are
    two different compiled programs (vmapped run_batch vs scalar run), so
    bitwise equality is NOT portable across hosts — XLA:CPU codegen
    differs — but over a short window the chaotic amplification stays
    bounded and the trajectories must agree tightly."""
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(0)
    out, _, _ = run_hypotheses(
        engine, key, 1, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=5)
    # reproduce the init exactly: run_hypotheses splits (key → init_key)
    # and vmaps init over R=1 split keys
    _, init_key = jax.random.split(key)
    (k0,) = jax.random.split(init_key, 1)
    state = engine.init_state(k0, initial_pose, n.global_pos[0],
                              n.global_rot[0], m.heights[0])
    _, ref = engine.run(state, n.dqs, n.global_pos, n.global_rot)
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               atol=5e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(out.global_pos),
                               np.asarray(ref.global_pos), atol=5e-3, rtol=0)


def test_beam_resamples_and_emits_best_lineage(example_bvh_path):
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(1)
    R, K = 4, 2
    out, parents, scores = run_hypotheses(
        engine, key, R, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=8, sigma=0.5, survivors=K)
    n_chunks = scores.shape[0]
    assert scores.shape == (n_chunks, R)
    assert parents.shape == (n_chunks, R)
    # resampling maps lanes onto at most K parents, each an existing lane
    for c in range(n_chunks - 1):
        assert len(set(parents[c])) <= K
        assert set(parents[c]) <= set(range(R))
    # the last chunk never resamples
    np.testing.assert_array_equal(parents[-1], np.arange(R))
    # lanes explored distinct basins in at least one chunk
    assert any(np.unique(np.round(s, 7)).size > 1 for s in scores)
    # the emitted trajectory covers every frame, finitely
    assert out.pose.shape[0] == n.dqs.shape[0]
    assert np.all(np.isfinite(out.pose))

    # determinism: same key → same trajectory, resampling, scores
    out2, parents2, scores2 = run_hypotheses(
        engine, key, R, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=8, sigma=0.5, survivors=K)
    np.testing.assert_array_equal(parents, parents2)
    np.testing.assert_array_equal(np.asarray(out.pose),
                                  np.asarray(out2.pose))
    np.testing.assert_array_equal(scores, scores2)


def test_branch_every_full_length_degrades_to_restarts(example_bvh_path):
    """branch_every >= T: one chunk, whole-clip best-of-R — the --restarts
    semantics (selection by total fit loss, no resampling)."""
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(2)
    out, parents, scores = run_hypotheses(
        engine, key, 3, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=10_000)
    assert scores.shape == (1, 3) and parents.shape == (1, 3)
    best = int(scores[0].argmin())
    # the emitted trajectory IS the best lane's whole run (its mean fit
    # loss equals the winning score)
    assert float(np.asarray(out.loss_pos).mean()
                 + np.asarray(out.loss_rot).mean()) == scores[0, best]


def test_batched_beam_ragged_and_padding_invariant(example_bvh_path):
    """run_hypotheses_batched: per-file beams over a ragged 2-file batch.
    The padded tail of the shorter file must not influence its committed
    trajectory or the selection (scores are length-masked)."""
    from dragposer_tpu.drag.hypotheses import run_hypotheses_batched

    engine, n, m, initial_pose = _setup(example_bvh_path,
                                        frames=(2000, 2020))
    T, t2 = 20, 13
    lengths = np.array([T, t2])

    def build(pad_mode):
        def pad(x):
            if pad_mode == "repeat":
                tail = np.repeat(x[t2 - 1:t2], T - t2, axis=0)
            else:
                tail = np.zeros((T - t2,) + x.shape[1:], x.dtype)
            return np.concatenate([x[:t2], tail], axis=0)

        dqs = np.stack([n.dqs, pad(n.dqs)])
        gp = np.stack([n.global_pos, pad(n.global_pos)])
        gr = np.stack([n.global_rot, pad(n.global_rot)])
        return dqs, gp, gr

    h0 = np.stack([m.heights[0], m.heights[0]])
    ip = np.stack([initial_pose, initial_pose])
    key = jax.random.PRNGKey(4)
    outs = []
    for mode in ("repeat", "zeros"):
        dqs, gp, gr = build(mode)
        out, cum = run_hypotheses_batched(
            engine, key, 4, dqs, gp, gr, h0, ip, lengths=lengths,
            branch_every=6, sigma=0.4, survivors=2)
        assert out.pose.shape[:2] == (2, T)
        assert cum.shape == (2, 4)
        assert np.all(np.isfinite(out.pose[0]))
        assert np.all(np.isfinite(out.pose[1, :t2]))
        outs.append(out)
    # real-frame outputs identical regardless of padding content
    np.testing.assert_array_equal(outs[0].pose[1, :t2],
                                  outs[1].pose[1, :t2])
    np.testing.assert_array_equal(outs[0].pose[0], outs[1].pose[0])


def test_evaluate_batched_beam_cli_path(example_bvh_path, tmp_path):
    """evaluate_batched with branch_every: the directory-mode beam."""
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_batched,
                                             resolve_config)

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("3_trackers"),
        use_temporal=False, skeleton=sk, max_iter=4,
    )
    files = ["/root/reference/python/data/example/eval/example.bvh",
             "/root/reference/python/data/example/eval/example_2.bvh"]
    results = evaluate_batched(engine, means, stds, sk, files,
                               max_frames=14, save_dir=str(tmp_path),
                               restarts=3, branch_every=6,
                               branch_survivors=2)
    assert len(results) == 2
    for mpjpe, mpeepe in results:
        assert 0.0 < mpjpe < 1.0


def test_return_all_exposes_pool_and_matches_winner(example_bvh_path):
    """return_all=True (the selection-diagnostics surface): stacks all R
    final lineages plus their cumulative fit losses, and the argmin-cum
    lineage is bit-identical to the default path's emitted winner."""
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(5)
    R = 4
    kw = dict(branch_every=8, sigma=0.5, survivors=2)
    win, parents_w, scores_w = run_hypotheses(
        engine, key, R, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, **kw)
    allout, parents_a, scores_a, cum = run_hypotheses(
        engine, key, R, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, return_all=True, **kw)
    T = n.dqs.shape[0]
    assert allout.pose.shape[:2] == (R, T)
    assert cum.shape == (R,)
    np.testing.assert_array_equal(parents_w, parents_a)
    np.testing.assert_array_equal(scores_w, scores_a)
    best = int(np.argmin(cum))
    np.testing.assert_array_equal(np.asarray(allout.pose[best]),
                                  np.asarray(win.pose))
    np.testing.assert_array_equal(np.asarray(allout.global_pos[best]),
                                  np.asarray(win.global_pos))


def test_incumbent_never_lost(example_bvh_path):
    """Survivor lanes continue exactly: with sigma=0 every lane collapses
    onto the survivors, and the emitted lineage's per-chunk losses must
    each appear among that chunk's lane scores (no mixed/phantom chunks)."""
    engine, n, m, initial_pose = _setup(example_bvh_path)
    key = jax.random.PRNGKey(3)
    out, parents, scores = run_hypotheses(
        engine, key, 3, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, branch_every=8, sigma=0.0, survivors=1)
    lp = np.asarray(out.loss_pos)
    lr = np.asarray(out.loss_rot)
    T = n.dqs.shape[0]
    for c, lo in enumerate(range(0, T, 8)):
        hi = min(lo + 8, T)
        chunk_score = lp[lo:hi].mean() + lr[lo:hi].mean()
        assert np.isclose(chunk_score, scores[c], rtol=1e-6).any(), c
