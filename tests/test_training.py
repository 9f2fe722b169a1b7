"""Training-step behavior (small synthetic data, CPU)."""

import numpy as np
import pytest

from dragposer_tpu.config import TEMPORAL_PARAM, VAE_PARAM


@pytest.fixture(scope="module")
def vae_setup(example_parents):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.models import vae
    from dragposer_tpu.ops.topology import Skeleton

    rng = np.random.default_rng(0)
    offsets = rng.normal(scale=0.2, size=(22, 3)).astype(np.float32)
    offsets[0] = 0
    sk = Skeleton.build(example_parents, offsets)
    statics = vae.build_statics(example_parents, VAE_PARAM)
    params = vae.init_params(jax.random.PRNGKey(0), example_parents, VAE_PARAM)
    return params, statics, sk, jnp.asarray(offsets)


def _synth_batch(b=4):
    rng = np.random.default_rng(1)
    # plausible normalized inputs: unit quats jittered
    dq = rng.normal(scale=0.3, size=(b, 2, 22, 8, 1)).astype(np.float32)
    dq[:, :, :, 0, :] += 1.0
    dqs = dq.reshape(b, 2, 176, 1)
    disp = rng.normal(scale=0.1, size=(b, 2, 3, 1)).astype(np.float32)
    return dqs, disp


@pytest.mark.heavy
def test_loss_terms_finite_and_weighted(vae_setup):
    import jax

    from dragposer_tpu.train.vae import loss_fn

    params, statics, sk, offsets = vae_setup
    dqs, disp = _synth_batch()
    m = np.zeros(176, np.float32)
    s = np.ones(176, np.float32)
    total, terms = loss_fn(params, statics, sk, jax.random.PRNGKey(1),
                           (dqs, disp), m, s, offsets, VAE_PARAM, True)
    assert set(terms) == {"kld", "root", "displacement", "consecutive",
                          "fk", "joints"}
    for k, v in terms.items():
        assert np.isfinite(float(v)), k
    np.testing.assert_allclose(float(total),
                               sum(float(v) for v in terms.values()), rtol=1e-6)


@pytest.mark.heavy
def test_consecutive_grad_matches_finite_differences(vae_setup):
    """The drag-consistency term uses ∇_z f; check jax.grad against FD."""
    import functools

    import jax
    import jax.numpy as jnp

    from dragposer_tpu.train.vae import _positions_of_latent

    params, statics, sk, offsets = vae_setup
    m = jnp.zeros(176)
    s = jnp.ones(176)
    pos_fn = functools.partial(
        _positions_of_latent, dec_params=params["decoder"], statics=statics,
        skeleton=sk, mean_dqs=m, std_dqs=s, offsets=offsets, pair_shape=(1, 2),
    )

    def f(z):
        p = pos_fn(z)
        return jnp.sum((p[:, 0] - p[:, 1]) ** 2)

    rng = np.random.default_rng(2)
    z = rng.normal(size=(2, 24)).astype(np.float32)
    g = np.asarray(jax.grad(f)(jnp.asarray(z)))
    eps = 1e-3
    for idx in [(0, 0), (0, 13), (1, 7)]:
        zp = z.copy()
        zp[idx] += eps
        zm = z.copy()
        zm[idx] -= eps
        fd = (float(f(jnp.asarray(zp))) - float(f(jnp.asarray(zm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-3)


def test_vae_train_step_learns(vae_setup):
    import jax

    from dragposer_tpu.train.vae import make_optimizer, make_train_step

    params, statics, sk, offsets = vae_setup
    optimizer = make_optimizer(VAE_PARAM)
    opt_state = optimizer.init(params)
    step = make_train_step(statics, sk, offsets, VAE_PARAM, True, optimizer)
    dqs, disp = _synth_batch()
    m = np.zeros(176, np.float32)
    s = np.ones(176, np.float32)
    losses = []
    for i in range(8):
        params, opt_state, total, _ = step(
            params, opt_state, jax.random.PRNGKey(i), dqs, disp, m, s
        )
        losses.append(float(total))
    assert losses[-1] < losses[0], losses


def test_limb_noise(vae_setup):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.train.temporal import _limb_noise

    rng = np.random.default_rng(3)
    dq = rng.normal(size=(2, 15, 176)).astype(np.float32)
    m = jnp.zeros(176)
    s = jnp.ones(176)
    # p=0: untouched
    out = np.asarray(_limb_noise(jax.random.PRNGKey(0), jnp.asarray(dq), m, s, 0.0))
    np.testing.assert_array_equal(out, dq)
    # p=1: every limb replaced in all-but-last past frames; last frame intact
    out = np.asarray(_limb_noise(jax.random.PRNGKey(0), jnp.asarray(dq), m, s, 1.0))
    limb_ch = np.asarray(
        [j * 8 + c for j in (14, 15, 16, 17, 18, 19, 20, 21, 1, 2, 3, 4, 5, 6, 7, 8)
         for c in range(8)]
    )
    assert (out[:, :-1, limb_ch] != dq[:, :-1, limb_ch]).all()
    np.testing.assert_array_equal(out[:, -1, :], dq[:, -1, :])
    root_spine = np.asarray([j * 8 + c for j in (0, 9, 10, 11, 12, 13)
                             for c in range(8)])
    np.testing.assert_array_equal(out[:, :, root_spine], dq[:, :, root_spine])


@pytest.mark.heavy
def test_temporal_train_step_learns(vae_setup):
    import jax
    import optax

    from dragposer_tpu.models import temporal as tmodel
    from dragposer_tpu.train.temporal import make_train_step

    params, statics, sk, _ = vae_setup
    tparam = dict(TEMPORAL_PARAM, dropout=0.0)
    tparams = tmodel.init_params(jax.random.PRNGKey(4), tparam)
    opt = optax.adam(1e-3)
    opt_state = opt.init(tparams)
    step = make_train_step(params, statics, tparam, opt)

    rng = np.random.default_rng(5)
    b, p, f = 4, 15, 15
    dqs_past = rng.normal(size=(b, p, 176)).astype(np.float32)
    dqs_future = rng.normal(size=(b, f, 176)).astype(np.float32)
    acc = rng.normal(size=(b, p, 3)).astype(np.float32)
    heights = rng.normal(size=(b, p, 6)).astype(np.float32)
    m = np.zeros(176, np.float32)
    s = np.ones(176, np.float32)
    ml = np.zeros(24, np.float32)
    sl = np.ones(24, np.float32)
    losses = []
    for i in range(6):
        tparams, opt_state, value = step(
            tparams, opt_state, jax.random.PRNGKey(10 + i),
            dqs_past, dqs_future, acc, heights, m, s, ml, sl,
        )
        losses.append(float(value))
    assert losses[-1] < losses[0], losses
