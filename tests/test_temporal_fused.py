"""Fused Pallas temporal kernel vs the XLA forward (interpret mode on CPU)."""

import numpy as np
import pytest

from dragposer_tpu import config as cfg

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


@pytest.fixture(scope="module")
def setup():
    import jax

    from dragposer_tpu.models import temporal
    from dragposer_tpu.ops import temporal_fused

    param = cfg.TEMPORAL_PARAM
    params = temporal.init_params(jax.random.PRNGKey(0), param)
    packed = temporal_fused.pack_params(params, param)
    return params, packed, param


@pytest.mark.parametrize("b,s_dec", [(3, 1), (5, 5), (1, 1)])
def test_matches_xla_forward(setup, b, s_dec):
    import jax.numpy as jnp

    from dragposer_tpu.models import temporal
    from dragposer_tpu.ops import temporal_fused

    params, packed, param = setup
    rng = np.random.default_rng(b * 10 + s_dec)
    enc = rng.normal(size=(b, 14, 33)).astype(np.float32)
    dec = rng.normal(size=(b, s_dec, 24)).astype(np.float32)
    mask = np.where(np.arange(s_dec) <= s_dec // 2, 0.0,
                    -np.inf).astype(np.float32)[None, :]
    ref = temporal.forward(params, param, enc, dec, tgt_mask=jnp.asarray(mask))
    got = temporal_fused.forward(packed, param, enc, dec, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_matches_under_vmap(setup):
    """The engine calls the forward per-sequence under vmap with singleton
    batch dims; the custom_vmap rule must merge them into the kernel grid."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.models import temporal
    from dragposer_tpu.ops import temporal_fused

    params, packed, param = setup
    rng = np.random.default_rng(7)
    enc = rng.normal(size=(6, 14, 33)).astype(np.float32)
    dec = rng.normal(size=(6, 1, 24)).astype(np.float32)
    mask = jnp.zeros((1, 1), np.float32)
    ref = jax.vmap(lambda e, d: temporal.forward(
        params, param, e, d, tgt_mask=mask))(enc, dec)
    got = jax.vmap(lambda e, d: temporal_fused.forward(
        packed, param, e, d, mask))(enc, dec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
