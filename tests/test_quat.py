"""Quaternion kernel tests against independent NumPy oracles."""

import numpy as np
import pytest

from dragposer_tpu.ops import quat

RNG = np.random.default_rng(0)


def rand_unit_quats(*shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float64)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def np_quat_matrix(q):
    """Independent oracle: quaternion → rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3))
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def test_mul_matches_matrix_composition():
    q1 = rand_unit_quats(64)
    q2 = rand_unit_quats(64)
    got = np_quat_matrix(np.asarray(quat.mul(q1, q2)))
    want = np_quat_matrix(q1) @ np_quat_matrix(q2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mul_vec_matches_matrix():
    q = rand_unit_quats(32)
    v = RNG.normal(size=(32, 3))
    got = np.asarray(quat.mul_vec(q, v))
    want = np.einsum("bij,bj->bi", np_quat_matrix(q), v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inverse_roundtrip():
    q = rand_unit_quats(16) * RNG.uniform(0.5, 2.0, size=(16, 1))  # non-unit
    ident = np.asarray(quat.mul(q, quat.inverse(q)))
    np.testing.assert_allclose(ident[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[..., 1:], 0.0, atol=1e-5)


def test_to_matrix_matches_oracle():
    q = rand_unit_quats(20)
    np.testing.assert_allclose(np.asarray(quat.to_matrix(q)), np_quat_matrix(q), atol=1e-6)


def test_from_matrix_roundtrip():
    q = rand_unit_quats(50)
    back = np.asarray(quat.from_matrix(quat.to_matrix(q)))
    # q and -q encode the same rotation
    sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * sign, q, atol=1e-5)


def test_unroll_matches_sequential_oracle():
    q = rand_unit_quats(40, 3)
    # inject sign flips
    flip = RNG.random((40, 3, 1)) < 0.4
    q = np.where(flip, -q, q)
    got = np.asarray(quat.unroll(q, axis=0))
    want = q.copy()
    for i in range(1, want.shape[0]):
        d = np.sum(want[i] * want[i - 1], axis=-1, keepdims=True)
        want[i] = np.where(d < 0, -want[i], want[i])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # continuity holds
    dots = np.sum(got[1:] * got[:-1], axis=-1)
    assert (dots >= -1e-6).all()


AXIS_MATS = {
    0: lambda a: np.array(
        [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]]
    ),
    1: lambda a: np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    ),
    2: lambda a: np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    ),
}

ALL_ORDERS = ["xyz", "xzy", "yxz", "yzx", "zxy", "zyx"]


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_from_euler_matches_matrix_chain(order):
    angles = RNG.uniform(-np.pi, np.pi, size=(10, 3))
    idx = quat.order_to_indices(np.array([list(order)] * 10))
    q = np.asarray(quat.from_euler(angles, idx))
    for b in range(10):
        want = (
            AXIS_MATS[idx[b, 0]](angles[b, 0])
            @ AXIS_MATS[idx[b, 1]](angles[b, 1])
            @ AXIS_MATS[idx[b, 2]](angles[b, 2])
        )
        np.testing.assert_allclose(np_quat_matrix(q[b]), want, atol=1e-6)


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_euler_roundtrip(order):
    # keep middle angle away from gimbal lock
    angles = RNG.uniform(-1.2, 1.2, size=(50, 3))
    idx = quat.order_to_indices(np.array([list(order)] * 50))
    q = quat.from_euler(angles, idx)
    back = np.asarray(quat.to_euler(q, idx))
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_order_to_indices():
    got = quat.order_to_indices(np.array([["z", "x", "y"], ["x", "y", "z"]]))
    np.testing.assert_array_equal(got, [[2, 0, 1], [0, 1, 2]])


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_euler_gimbal_lock(order):
    """At |b| = π/2 the a/c split is degenerate; the rotation must survive."""
    n = 16
    idx = np.tile(quat.order_to_indices(np.array([list(order)])), (n, 1))
    a = RNG.uniform(-np.pi, np.pi, (n,))
    c = RNG.uniform(-np.pi, np.pi, (n,))
    b = np.concatenate([np.full(n // 2, np.pi / 2), np.full(n // 2, -np.pi / 2)])
    q = quat.from_euler(np.stack([a, b, c], -1), idx)
    q2 = quat.from_euler(np.asarray(quat.to_euler(q, idx)), idx)
    qdot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1))
    np.testing.assert_allclose(qdot, 1.0, atol=1e-5)
