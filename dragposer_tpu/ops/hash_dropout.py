"""Counter-hash dropout: Bernoulli masks without full-tensor threefry.

``jax.random.bernoulli`` draws a threefry block per element — measured
5.9 ms of a 25.5 ms temporal train step at B=4096 (14 mask sites on
(15, 48, 4096) activations; see tools/profile_temporal_step.py).  Here a
mask element is the murmur3 finalizer (fmix32, a full-avalanche uint32
bijection — the same generator as the fused-FF kernel's on-core mask,
ops/ff_fused.py:48-73) of ``position + seed * golden_ratio``: a handful
of VPU integer ops that XLA fuses straight into the consuming
``select``, with no mask tensor materialized.  The per-site seeds come
from ONE tiny threefry draw per step, so sites stay independent and the
whole scheme remains keyed by the standard JAX PRNG chain.

P(keep) matches Bernoulli(1-rate) to 2^-32 per element; distinct
positions map to distinct hash inputs (bijective mixing), so elements
are pairwise decorrelated — the standard counter-based-RNG argument
(Salmon et al., "Parallel random numbers: as easy as 1, 2, 3").
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def fmix32(h):
    """murmur3 finalizer: full-avalanche bijection on uint32."""
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def keep_mask(shape, rate: float, seed):
    """Boolean keep mask, P(keep) = 1-rate; ``seed`` a scalar int32."""
    n = math.prod(shape)
    pos = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = fmix32(pos + seed.astype(jnp.uint32) * np.uint32(0x9E3779B1))
    thresh = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return h >= thresh


def seeds_for(key, n: int):
    """n independent per-site seeds from ONE threefry call (non-negative so
    uint32 casts are exact)."""
    return jax.random.randint(key, (n,), 0, 2**31 - 1, jnp.int32)


def dropout(x, rate: float, seed, train: bool):
    """Inverted dropout with a counter-hash mask.  ``rate`` static."""
    if not train or rate == 0.0:
        return x
    keep = keep_mask(x.shape, rate, seed)
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0)


def normal(shape, seed, dtype=jnp.float32):
    """Counter-hash standard normals (Box–Muller on two fmix32 streams).

    ~8 integer + 4 transcendental VPU ops per sample vs a full threefry
    block per sample for ``jax.random.normal`` — used for high-volume
    augmentation noise where a counter-based generator's distributional
    quality suffices (see module docstring).
    """
    n = math.prod(shape)
    pos = jax.lax.iota(jnp.uint32, n).reshape(shape)
    base = seed.astype(jnp.uint32) * np.uint32(0x9E3779B1)
    h1 = fmix32(pos + base)
    h2 = fmix32(pos + base + np.uint32(0x632BE59B))  # independent stream
    # uniforms in (0, 1]: (h+1) / 2^32 — u1 > 0 keeps log finite
    scale = np.float32(1.0 / 4294967296.0)
    u1 = (h1.astype(jnp.float32) + 1.0) * scale
    u2 = h2.astype(jnp.float32) * scale
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return (r * jnp.cos(2.0 * np.float32(np.pi) * u2)).astype(dtype)
