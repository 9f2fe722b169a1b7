"""FK kernel tests: parallel forms vs a naive sequential NumPy oracle."""

import numpy as np

from dragposer_tpu.ops import fk, quat
from dragposer_tpu.ops.topology import Skeleton

RNG = np.random.default_rng(7)


def make_skeleton(parents):
    offsets = RNG.normal(size=(len(parents), 3))
    offsets[0] = 0.0
    return Skeleton.build(parents, offsets)


def rand_unit_quats(*shape):
    q = RNG.normal(size=shape + (4,))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float64)


def naive_fk(local_q, root_pos, offsets, parents):
    """Sequential per-joint FK oracle (the reference's algorithm)."""
    n = len(parents)
    world = np.zeros_like(local_q)
    pos = np.zeros(local_q.shape[:-2] + (n, 3))
    world[..., 0, :] = local_q[..., 0, :]
    pos[..., 0, :] = root_pos
    for j in range(1, n):
        p = parents[j]
        world[..., j, :] = np.asarray(
            quat.mul(world[..., p, :], local_q[..., j, :])
        )
        pos[..., j, :] = pos[..., p, :] + np.asarray(
            quat.mul_vec(world[..., p, :], offsets[j])
        )
    return pos, world


def test_fk_local_matches_sequential(example_parents):
    sk = make_skeleton(example_parents)
    local = rand_unit_quats(5, 22)
    root_pos = RNG.normal(size=(5, 3))
    want_pos, want_rot = naive_fk(local, root_pos, sk.offsets, sk.parents)
    got_pos, got_rot = fk.fk_local(local, root_pos, sk)
    np.testing.assert_allclose(np.asarray(got_pos), want_pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rot), want_rot, atol=1e-5)


def test_root_space_roundtrip(example_parents):
    sk = make_skeleton(example_parents)
    local = rand_unit_quats(4, 22)
    root_pos = RNG.normal(size=(4, 3))
    rs, rs_pos = fk.to_root_space(local, root_pos, sk)
    # root slot keeps the root world rotation
    np.testing.assert_allclose(np.asarray(rs)[:, 0], local[:, 0], atol=1e-6)
    # inverse transform recovers the local rotations
    back = np.asarray(fk.from_root_quat(rs, sk))
    np.testing.assert_allclose(back, local, atol=1e-5)


def test_fk_root_space_matches_fk_local(example_parents):
    """world[j] = root ⊗ rootspace[j] must equal the sequential chain."""
    sk = make_skeleton(example_parents)
    local = rand_unit_quats(4, 22)
    root_pos = RNG.normal(size=(4, 3))
    rs, _ = fk.to_root_space(local, np.zeros((4, 3)), sk)
    got_pos, got_rot = fk.fk_root_space(rs, root_pos, sk)
    want_pos, want_rot = fk.fk_local(local, root_pos, sk)
    np.testing.assert_allclose(np.asarray(got_pos), np.asarray(want_pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rot), np.asarray(want_rot), atol=1e-5)


def test_root_space_positions_exclude_root_rotation(example_parents):
    """Root-frame positions must be invariant to the root's world rotation."""
    sk = make_skeleton(example_parents)
    local = rand_unit_quats(1, 22)
    local2 = local.copy()
    local2[:, 0] = rand_unit_quats(1)
    _, p1 = fk.to_root_space(local, np.zeros((1, 3)), sk)
    _, p2 = fk.to_root_space(local2, np.zeros((1, 3)), sk)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
