"""Multi-restart drag: selection wiring + determinism.

(The quality effect — best-of-16 by tracker-fit loss cuts the degenerate
3-tracker MPJPE ~25% on a 1000-frame clip — is measured on TPU and
recorded in README/ROADMAP; this test guards the selection mechanics.)
"""

import numpy as np

from dragposer_tpu.config import HEIGHT_INDICES, VAE_PARAM
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL

import pytest
pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


def test_run_restarts_picks_lowest_fit_loss(example_bvh_path):
    import jax

    from dragposer_tpu.cli.eval_drag import (build_engine, resolve_config,
                                             run_restarts)
    from dragposer_tpu.drag import engine as eng

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("3_trackers"),
        use_temporal=False, skeleton=sk, max_iter=6,
    )
    m = encoding.encode_motion(offsets, pos[2000:2015, 0, :],
                               rots[2000:2015], sk,
                               height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)
    initial_pose = np.tile(n.dqs[0][:, None], (1, VAE_PARAM["window_size"]))

    key = jax.random.PRNGKey(0)
    out, best, scores = run_restarts(
        engine, key, 4, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, sync_k=4,
    )
    assert scores.shape == (4,)
    assert best == int(np.argmin(scores))
    # different inits actually explored different basins
    assert np.unique(np.round(scores, 7)).size > 1
    # deterministic: same key → same selection and same trajectory
    out2, best2, scores2 = run_restarts(
        engine, key, 4, n.dqs, n.global_pos, n.global_rot, m.heights[0],
        initial_pose, sync_k=4,
    )
    assert best2 == best
    np.testing.assert_array_equal(np.asarray(out.pose), np.asarray(out2.pose))
    # the kept trajectory is the best lane's, not a mixture
    assert float(np.asarray(out.loss_pos).mean()
                 + np.asarray(out.loss_rot).mean()) == scores[best]


def test_batched_directory_restarts(example_bvh_path, tmp_path):
    """evaluate_batched with restarts: per-file best-of-N selection."""
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
                               max_frames=12, save_dir=str(tmp_path),
                               restarts=3)
    assert len(results) == 2
    for mpjpe, mpeepe in results:
        assert 0.0 < mpjpe < 1.0
