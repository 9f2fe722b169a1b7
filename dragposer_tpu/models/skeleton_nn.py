"""Skeleton-aware neural-net building blocks (pure functions + pytrees).

The skeleton convolution is a dense 1-D convolution whose weight is hard
masked to per-joint graph neighborhoods; pooling/unpooling are constant
matmuls derived from the topology (reference ``python/src/skeleton.py``).
On TPU, with the reference's kernel size 1, every block lowers to a single
masked matmul on the MXU.

Parameters are plain dicts of ``jnp`` arrays; static structure (masks, pool
matrices, neighbor schedules) lives in :class:`VAEStatics` so it never enters
the optimizer state.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.ops import topology

_PRECISION = "highest"


# ---------------------------------------------------------------------------
# Initialization (mirrors torch's kaiming_uniform(a=√5) block-restricted init,
# reference ``skeleton.py:68-115`` — bounds are 1/√fan_in on the masked block)
# ---------------------------------------------------------------------------

def init_skeleton_conv(key, neighbors: List[List[int]], in_cpj: int,
                       out_cpj: int, kernel: int) -> Dict[str, jnp.ndarray]:
    n = len(neighbors)
    w = np.zeros((n * out_cpj, n * in_cpj, kernel), dtype=np.float32)
    b = np.zeros((n * out_cpj,), dtype=np.float32)
    expanded = topology.expand_neighbors(neighbors, in_cpj)
    keys = jax.random.split(key, 2 * n)
    for i, cols in enumerate(expanded):
        fan_in = len(cols) * kernel
        bound = 1.0 / math.sqrt(fan_in)
        rows = slice(i * out_cpj, (i + 1) * out_cpj)
        w[rows, cols, :] = np.asarray(
            jax.random.uniform(keys[2 * i], (out_cpj, len(cols), kernel),
                               minval=-bound, maxval=bound)
        )
        b[rows] = np.asarray(
            jax.random.uniform(keys[2 * i + 1], (out_cpj,),
                               minval=-bound, maxval=bound)
        )
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def init_linear(key, in_dim: int, out_dim: int, zero_weight: bool = False):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = (jnp.zeros((out_dim, in_dim)) if zero_weight else
         jax.random.uniform(kw, (out_dim, in_dim), minval=-bound, maxval=bound))
    b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def skeleton_conv(x, params, mask, padding: int, stride: int):
    """Masked conv1d with reflect padding.  x: (B, C_in, T) → (B, C_out, T')."""
    w = params["w"] * mask
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=_PRECISION,
    )
    return y + params["b"][None, :, None]


def pool(x, pool_mat):
    """(B, C_old, T) → (B, C_new, T) via the constant averaging matrix."""
    return jnp.einsum("oc,bct->bot", pool_mat, x, precision=_PRECISION)


def unpool(x, unpool_mat):
    return jnp.einsum("oc,bct->bot", unpool_mat, x, precision=_PRECISION)


def linear(x, params):
    """Torch convention: y = x @ Wᵀ + b with W (out, in)."""
    return jnp.einsum("...i,oi->...o", x, params["w"], precision=_PRECISION) + params["b"]


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)
