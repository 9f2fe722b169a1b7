"""Drag-engine behavior tests (CPU, imported reference generator)."""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES, VAE_PARAM
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL


@pytest.fixture(scope="module")
def setup(example_bvh_path):
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=sk, max_iter=20,
    )
    m = encoding.encode_motion(
        offsets, pos[2000:2040, 0, :], rots[2000:2040], sk,
        height_indices=HEIGHT_INDICES,
    )
    n = encoding.normalize(m, means, stds)
    return engine, m, n, sk


def _init(engine, m, n, key=0):
    import jax

    from dragposer_tpu.drag import engine as eng

    return eng.init_state(
        engine.model, engine.statics, engine.hyper, jax.random.PRNGKey(key),
        n.dqs[0][:, None], n.global_pos[0], n.global_rot[0], m.heights[0],
    )


def test_run_is_deterministic(setup):
    engine, m, n, _ = setup
    state = _init(engine, m, n)
    _, o1 = engine.run(state, n.dqs, n.global_pos, n.global_rot)
    _, o2 = engine.run(state, n.dqs, n.global_pos, n.global_rot)
    p1, i1 = o1.pose, o1.iterations
    p2, i2 = o2.pose, o2.iterations
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_always_at_least_one_iteration(setup):
    engine, m, n, _ = setup
    state = _init(engine, m, n)
    _, out = engine.run(state, n.dqs, n.global_pos, n.global_rot)
    iters = out.iterations
    iters = np.asarray(iters)
    assert iters.min() >= 1
    assert iters.max() <= 20


def test_tracking_reduces_error(setup):
    """Reconstructed joint positions must track GT far better than a frozen
    initial pose would."""
    import jax

    from dragposer_tpu import export, metrics

    engine, m, n, sk = setup
    state = _init(engine, m, n)
    _, out = engine.run(state, n.dqs, n.global_pos, n.global_rot)
    poses, gp = out.pose, out.global_pos
    from dragposer_tpu.cli.eval_drag import build_engine  # noqa: F401  (docs)

    # export + measure vs GT segment
    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    import copy

    seg = copy.deepcopy(bvh)
    seg.rotations = bvh.rotations[2000:2040]
    seg.positions = bvh.positions[2000:2040]
    params, means, stds = None, None, None
    from dragposer_tpu.models import torch_import

    _, means, stds = torch_import.load_generator(
        REFERENCE_MODEL, sk.parents, VAE_PARAM
    )
    out = export.result_to_bvh(
        np.asarray(poses), means, stds, seg, sk,
        global_pos=np.asarray(gp), are_root_rot_incr=False,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        gt_p = os.path.join(d, "gt.bvh")
        ev_p = os.path.join(d, "ev.bvh")
        seg.save(gt_p)
        out.save(ev_p)
        mpjpe, mpeepe = metrics.positional_error(BVH().load(gt_p), BVH().load(ev_p))
    assert mpjpe < 0.06, f"MPJPE too high: {mpjpe}"
    assert mpeepe < 0.06, f"MPEEPE too high: {mpeepe}"


def test_dense_mask_matches_indexed_loss(setup):
    """The dense 22-slot masked loss must equal the reference's
    indexed-end-effector mean formulation."""
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng

    engine, m, n, sk = setup
    model = engine.model
    rng = np.random.default_rng(5)
    latent = rng.normal(size=(24,)).astype(np.float32)
    grot = np.asarray([1.0, 0, 0, 0], np.float32)
    tpos = rng.normal(size=(22, 3)).astype(np.float32)
    trot = rng.normal(size=(22, 3, 3)).astype(np.float32)
    tlat = rng.normal(size=(24,)).astype(np.float32)

    total, aux = eng._drag_loss(
        jnp.asarray(latent), model, engine.statics, sk, engine.hyper,
        jnp.zeros(3), jnp.asarray(grot), jnp.asarray(tpos),
        jnp.asarray(trot), jnp.asarray(tlat),
    )

    # indexed oracle
    idx = np.nonzero(np.asarray(model.mask))[0]
    w = np.asarray(model.weights)[idx]
    pos = np.asarray(aux.positions)
    from dragposer_tpu.ops import quat as q

    # recompute world rotmats exactly as the loss does
    mean_q = np.asarray(model.mean_dqs).reshape(-1, 8)[:, :4].reshape(-1)
    std_q = np.asarray(model.std_dqs).reshape(-1, 8)[:, :4].reshape(-1)
    from dragposer_tpu.models import vae as vae_mod

    pose_n, _ = vae_mod.decode_folded(model.decoder, latent[None],
                                      model.mean_dqs, model.std_dqs)
    qs = (np.asarray(pose_n)[0, :, 0] * std_q + mean_q).reshape(22, 4)
    world_rot = np.asarray(q.mul(grot, qs[0]))
    rs = qs.copy()
    rs[0] = world_rot
    from dragposer_tpu.ops import fk as fk_mod

    _, wq = fk_mod.fk_root_space(rs, np.zeros(3), sk)
    rotm = np.asarray(q.to_matrix(np.asarray(wq)))

    want_pos = np.mean(
        ((pos[idx] - tpos[idx]) ** 2) * w[:, 0][:, None]
    )
    want_rot = np.mean(
        ((rotm[idx] - trot[idx]) ** 2) * w[:, 1][:, None, None]
    )
    np.testing.assert_allclose(float(aux.loss_pos), want_pos, rtol=1e-5)
    np.testing.assert_allclose(
        float(aux.loss_rot), want_rot * engine.hyper.lambda_rot, rtol=1e-5
    )


def test_joint_adjustment_moves_root(setup):
    """With adjustment weight 1 toward end effector 0 (the root), the new
    global position is pulled to the target."""
    engine, m, n, sk = setup
    state = _init(engine, m, n)
    new_state, _ = engine.step(
        state,
        np.asarray(n.global_pos[1] - n.global_pos[0])[None, :].repeat(22, 0),
        np.tile(np.eye(3, dtype=np.float32), (22, 1, 1)),
    )
    # ja = (0, 0) weight 1: global_pos_new = gp + wd + (target0 - pos0)
    assert np.isfinite(np.asarray(new_state.global_pos)).all()
    assert not np.allclose(np.asarray(new_state.global_pos),
                           np.asarray(state.global_pos))


def test_batched_matches_single(setup):
    """vmapped batched run must reproduce the single-sequence trajectories."""
    import jax

    engine, m, n, _ = setup
    s1 = _init(engine, m, n, key=0)
    s2 = _init(engine, m, n, key=1)
    F = 10
    _, o1 = engine.run(s1, n.dqs[:F], n.global_pos[:F], n.global_rot[:F])
    _, o2 = engine.run(s2, n.dqs[:F], n.global_pos[:F], n.global_rot[:F])
    p1, i1 = o1.pose, o1.iterations
    p2, i2 = o2.pose, o2.iterations

    states = jax.tree.map(lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
                          s1, s2)
    dqs = np.stack([n.dqs[:F]] * 2)
    gp = np.stack([n.global_pos[:F]] * 2)
    gr = np.stack([n.global_rot[:F]] * 2)
    _, ob = engine.run_batch(states, dqs, gp, gr)
    pb, ib = ob.pose, ob.iterations
    # batched matmuls reduce in a different order than single-sequence ones;
    # the fp noise is amplified by the tiny per-channel stds, so compare with
    # a relative tolerance and allow early-stop counts to differ by a step
    np.testing.assert_allclose(np.asarray(pb)[0], np.asarray(p1),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pb)[1], np.asarray(p2),
                               rtol=1e-3, atol=5e-3)
    assert np.abs(np.asarray(ib)[0].astype(int) - np.asarray(i1).astype(int)).max() <= 2
    assert np.abs(np.asarray(ib)[1].astype(int) - np.asarray(i2).astype(int)).max() <= 2


def test_frame_output_latent_decodes_output_pose(setup):
    """``FrameOutput.latent`` must be the latent the output pose decoded
    from — the PRE-step ``decoded_latent``, matching the pipelined runtime
    (``pipeline.py`` records ``opt.decoded_latent``), not the post-Adam-step
    latent (advisor finding, round 4)."""
    import jax.numpy as jnp

    from dragposer_tpu.models import vae as vae_mod

    engine, m, n, _ = setup
    state = _init(engine, m, n)
    F = 6
    _, out = engine.run(state, n.dqs[:F], n.global_pos[:F], n.global_rot[:F])
    model = engine.model
    pose_n, _ = vae_mod.decode_folded_flat(
        model.decoder, jnp.asarray(out.latent), model.mean_dqs, model.std_dqs
    )
    # slot 0 (root quat) is overwritten with the world rotation after the
    # decode; every other channel must match the decode of the recorded
    # latent (cross-program tolerance: separately compiled decode).
    np.testing.assert_allclose(
        np.asarray(pose_n)[:, 4:], np.asarray(out.pose)[:, 4:],
        rtol=2e-4, atol=1e-4,
    )


def _reference_hold_simulation(window: int, step: int) -> np.ndarray:
    """Slot-for-slot simulation of the reference's target-buffer fill
    (``drag_pose.py:272-290``) using 0-indexed prediction ids.

    Loop 1 writes prediction ``i//step`` into slot ``i`` for
    ``i in range(0, window+1, step)``; loop 2 overwrites slots
    ``[i : i+step+1]`` with slot ``i+step``'s value (torch.lerp with
    weight 1, RHS evaluated before assignment).
    """
    buf = np.full(window + 1, -1, dtype=np.int32)
    for i in range(0, window + 1, step):
        buf[i] = i // step
    for i in range(0, window, step):
        buf[i : i + step + 1] = buf[i + step]
    return buf


@pytest.mark.parametrize("window,step", [(0, 4), (16, 4), (60, 4), (8, 2),
                                         (4, 4), (60, 10)])
def test_hold_index_matches_reference_overwrites(window, step):
    from dragposer_tpu.drag.engine import _hold_index

    ours = _hold_index(window, step)
    if window == 0:
        # reference skips loop 2 entirely; slot 0 keeps prediction 0
        np.testing.assert_array_equal(ours, [0])
        return
    ref = _reference_hold_simulation(window, step)
    np.testing.assert_array_equal(ours, ref)
