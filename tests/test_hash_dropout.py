"""Counter-hash RNG (ops/hash_dropout.py): distribution + determinism.

These are the statistical contracts the training step relies on: keep
masks hit P(keep)=1-rate, Box–Muller normals have unit moments, and
everything is a pure function of (shape, seed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dragposer_tpu.ops import hash_dropout as hd


def _seed(v):
    return jnp.asarray(v, jnp.int32)


def test_keep_rate():
    for rate in (0.1, 0.5, 0.9):
        m = np.asarray(hd.keep_mask((400, 512), rate, _seed(7)))
        assert abs(m.mean() - (1 - rate)) < 0.01, rate


def test_mask_deterministic_and_seed_dependent():
    a = np.asarray(hd.keep_mask((64, 128), 0.3, _seed(5)))
    b = np.asarray(hd.keep_mask((64, 128), 0.3, _seed(5)))
    c = np.asarray(hd.keep_mask((64, 128), 0.3, _seed(6)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).mean() > 0.2  # different seeds → different masks


def test_dropout_semantics():
    x = jnp.ones((100, 200))
    assert hd.dropout(x, 0.0, _seed(1), True) is x
    assert hd.dropout(x, 0.5, _seed(1), False) is x
    y = np.asarray(hd.dropout(x, 0.25, _seed(1), True))
    kept = y != 0.0
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
    assert abs(kept.mean() - 0.75) < 0.02
    # inverted scaling: E[y] == E[x]
    assert abs(y.mean() - 1.0) < 0.02


def test_normal_moments():
    z = np.asarray(hd.normal((512, 1024), _seed(3)))
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    # third/fourth standardized moments of N(0,1): 0 and 3
    assert abs((z**3).mean()) < 0.02
    assert abs((z**4).mean() - 3.0) < 0.05


def test_normal_decorrelated_across_positions_and_seeds():
    z = np.asarray(hd.normal((2, 4096), _seed(11)))
    # adjacent-position correlation (counter +1) and cross-seed correlation
    r_pos = np.corrcoef(z[0, :-1], z[0, 1:])[0, 1]
    z2 = np.asarray(hd.normal((2, 4096), _seed(12)))
    r_seed = np.corrcoef(z.ravel(), z2.ravel())[0, 1]
    assert abs(r_pos) < 0.05
    assert abs(r_seed) < 0.05


def test_seeds_for_independent():
    s = np.asarray(hd.seeds_for(jax.random.PRNGKey(0), 64))
    assert (s >= 0).all() and len(np.unique(s)) == 64


@pytest.mark.parametrize("shape", [(3, 5, 7), (1, 128), (60,)])
def test_shapes(shape):
    assert hd.normal(shape, _seed(1)).shape == shape
    assert hd.keep_mask(shape, 0.5, _seed(1)).shape == shape
