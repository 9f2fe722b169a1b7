"""Pipelined batched runtime vs the plain vmapped scan.

The sync-every-K pipelined loop (``drag/pipeline.py``) must reproduce the
``run_batch`` trajectories exactly per lane: same Adam iterates, same stop
rule (reference ``drag_pose.py:300-304``), same ring-buffer evolution —
only the interleaving across lanes differs.
"""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL


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


@pytest.mark.parametrize("sync_k", [1, 8, 32])
def test_pipelined_matches_run_batch_no_temporal(example_bvh_path, sync_k):
    engine, states, dqs, gp, gr = _build(example_bvh_path, False, "6_trackers")
    fs_ref, ref = engine.run_batch(states, dqs, gp, gr)
    fs_pipe, out = engine.run_batch_pipelined(states, dqs, gp, gr,
                                              sync_k=sync_k)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.global_pos),
                               np.asarray(ref.global_pos),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs_pipe.latent),
                               np.asarray(fs_ref.latent),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs_pipe.latent_buffer),
                               np.asarray(fs_ref.latent_buffer),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_ragged_lengths(example_bvh_path):
    """With per-lane ``lengths``, each lane's real frames must equal the
    single-sequence trajectory of that length; padded tail outputs are
    zeros and never computed."""
    import jax

    engine, states, dqs, gp, gr = _build(example_bvh_path, False, "6_trackers")
    lengths = np.array([30, 12, 20, 5], dtype=np.int32)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=8,
                                        lengths=lengths)
    for i, L in enumerate(lengths):
        s_i = jax.tree.map(lambda a: a[i], states)
        _, ref = engine.run(s_i, dqs[i, :L], gp[i, :L], gr[i, :L])
        np.testing.assert_array_equal(np.asarray(out.iterations)[i, :L],
                                      np.asarray(ref.iterations))
        np.testing.assert_allclose(np.asarray(out.pose)[i, :L],
                                   np.asarray(ref.pose), rtol=1e-3, atol=5e-3)
        # padded tail untouched
        assert (np.asarray(out.iterations)[i, L:] == 0).all()
        np.testing.assert_array_equal(np.asarray(out.pose)[i, L:], 0.0)


def test_pipelined_matches_run_batch_temporal_window0(example_bvh_path):
    """Rollout-every-frame path (6-tracker config, window 0)."""
    engine, states, dqs, gp, gr = _build(example_bvh_path, True, "6_trackers",
                                         max_iter=12)
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=16)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_matches_run_batch_windowed(example_bvh_path):
    """window > 0 (4-tracker config): per-lane current_index cycling means
    lanes at different frames are in different phases of the rollout hold —
    the pipelined bookkeeping must keep each lane's cycle intact."""
    engine, states, dqs, gp, gr = _build(example_bvh_path, True, "4_trackers",
                                         max_iter=12)
    _, ref = engine.run_batch(states, dqs, gp, gr)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=16)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(ref.pose),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.loss_pos),
                               np.asarray(ref.loss_pos),
                               rtol=1e-5, atol=1e-5)
