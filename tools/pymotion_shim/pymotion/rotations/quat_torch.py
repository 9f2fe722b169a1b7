"""Torch quaternion API (pymotion-compatible subset for the reference code)."""

from __future__ import annotations

import torch


def _own(q):
    """Detach the result of view-taking from the caller's storage.

    The reference mutates quaternion buffers in place between graph
    construction and backward (e.g. ``from_root_quat``'s per-joint loop,
    ``loss.py:7-32``, writes ``rotations[..., j, :] = mul(...)`` on the
    same tensor it reads).  If these ops saved VIEWS of that buffer for
    backward, the later in-place writes would bump the version counter
    and the grad-of-grad consecutive loss (``loss.py:158``) would fail.
    A ``clone`` is differentiable, numerically identity, and gives
    backward version-stable operands."""
    return q.clone() if torch.is_tensor(q) and q.requires_grad else q


def normalize(q):
    return q / torch.norm(q, dim=-1, keepdim=True)


def inverse(q):
    q = _own(q)
    conj = q * torch.tensor([1.0, -1.0, -1.0, -1.0], device=q.device)
    return conj / torch.sum(q * q, dim=-1, keepdim=True)


def mul(q1, q2):
    q1, q2 = _own(q1), _own(q2)
    w1, x1, y1, z1 = torch.unbind(q1, -1)
    w2, x2, y2, z2 = torch.unbind(q2, -1)
    return torch.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        dim=-1,
    )


def mul_vec(q, v):
    q, v = _own(q), _own(v)
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * torch.cross(qv, v, dim=-1)
    return v + qw * t + torch.cross(qv, t, dim=-1)


def to_matrix(q):
    q = _own(q)
    w, x, y, z = torch.unbind(q, -1)
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    one = torch.ones_like(w)
    row0 = torch.stack((one - (yy + zz), xy - wz, xz + wy), dim=-1)
    row1 = torch.stack((xy + wz, one - (xx + zz), yz - wx), dim=-1)
    row2 = torch.stack((xz - wy, yz + wx, one - (xx + yy)), dim=-1)
    return torch.stack((row0, row1, row2), dim=-2)
