"""Fused Pallas iteration kernel vs the scan-based fast_iter block.

``iter_kernel.run_block_fused`` runs the same formulas as
``fast_iter.run_block`` with the state VMEM-resident across iterations;
the backward inside the kernel is jax.vjp of the in-kernel forward.
Results must match the scan path ulp-tight on every carry field
(iteration counts exactly — the stop rule quantizes them).
"""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


@pytest.fixture(scope="module")
def setup(example_bvh_path):
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=True, skeleton=sk,
    )
    return engine, sk


def _block_inputs(engine, sk, B, seed=0):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.ops import quat

    L = engine.model.means_latent.shape[0]
    J = sk.n_joints
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    z0 = jax.random.normal(ks[0], (B, L)) * 0.7
    opt = jax.vmap(lambda z: eng._opt_init(z, J))(z0)
    gr = quat.normalize(jax.random.normal(ks[1], (B, 4)))
    tpos = jax.random.normal(ks[2], (B, J, 3)) * 0.3
    trot = quat.to_matrix(quat.normalize(
        jax.random.normal(ks[3], (B, J, 4))))
    tlat = jax.random.normal(ks[4], (B, L)) * 0.2
    active = jnp.arange(B) % 5 != 3          # a few masked-out lanes

    class FakeState:
        global_rot = gr

    # transposed targets as run_block consumes them
    tposT = jnp.moveaxis(tpos, 0, -1)        # (J, 3, B)
    trotT = jnp.moveaxis(trot, 0, -1)        # (J, 3, 3, B)
    return opt, active, FakeState, tposT, trotT, tlat


def test_kernel_forward_grad_matches_forward_T(setup):
    """The in-kernel forward (padded JP=24 layout) and its jax.vjp
    gradient agree tightly with ``fast_iter.forward_T`` — this is the
    formula-equality anchor; block-level drift below is Adam
    amplification of fp reassociation, not formula error."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import fast_iter, iter_kernel

    engine, sk = setup
    model, hyper = engine.model, engine.hyper
    ctx = fast_iter.make_context(model, sk, hyper)
    kctx = iter_kernel.make_kernel_context(ctx)
    B = 32
    opt, active, state, tposT, trotT, tlat = _block_inputs(engine, sk, B)
    z = opt.latent.T                                     # (L, B)
    grT = state.global_rot.T
    tlatT = tlat.T

    ref = fast_iter.forward_T(ctx, hyper, z, grT, tposT, trotT, tlatT)

    # gradient through the scan path's formulation
    def ref_fwd(zz):
        return jnp.sum(fast_iter.forward_T(ctx, hyper, zz, grT, tposT,
                                           trotT, tlatT).total)

    g_ref = jax.grad(ref_fwd)(z)

    JP = iter_kernel.JP
    J = sk.n_joints
    pad_j = ((0, 0), (0, JP - J), (0, 0))
    tpos3 = jnp.pad(jnp.moveaxis(tposT, 1, 0), pad_j)
    trot9 = jnp.pad(jnp.moveaxis(trotT.reshape(J, 9, -1), 1, 0), pad_j)
    gr4 = grT[:, None, :]
    C = {"W1": kctx.W1, "b1": kctx.b1, "W2": kctx.W2, "b2": kctx.b2,
         "W3k": kctx.W3k, "b3k": kctx.b3k, "sq": kctx.sq, "mq": kctx.mq,
         "sd": kctx.sd, "md": kctx.md, "P": kctx.P, "A": kctx.A,
         "offs": kctx.offs}
    wp = jnp.broadcast_to(kctx.w_pos, (JP, B))
    wr = jnp.broadcast_to(kctx.w_rot, (JP, B))
    ne = jnp.broadcast_to(jnp.asarray(kctx.n_ee, jnp.float32).reshape(
        (1, -1)), (1, B))

    def ker_fwd(zz):
        total, _ = iter_kernel._forward(hyper, C, zz, gr4, tpos3, trot9,
                                        tlatT, wp, wr, ne)
        return jnp.sum(total)

    total, aux = iter_kernel._forward(hyper, C, z, gr4, tpos3, trot9,
                                      tlatT, wp, wr, ne)
    g_ker = jax.grad(ker_fwd)(z)

    np.testing.assert_allclose(np.asarray(aux[0]).ravel(),
                               np.asarray(ref.loss_pos), rtol=1e-5,
                               atol=1e-7, err_msg="loss_pos")
    np.testing.assert_allclose(np.asarray(aux[1]).ravel(),
                               np.asarray(ref.loss_rot), rtol=1e-5,
                               atol=1e-7, err_msg="loss_rot")
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7, err_msg="grad")


@pytest.mark.parametrize("sync_k,B", [(1, 16), (4, 130)])
def test_fused_block_matches_scan(setup, sync_k, B):
    """All carry fields agree with the scan path; lane padding (B=130
    spans a partial lane tile) must not leak.  Tolerances are loose
    relative to the forward/grad anchor above: the t=1 Adam rescale is
    sign-like (lr·10g / (31.6|g| + eps)), so latent dims with |g| near
    eps amplify ~1e-5-relative reassociation differences in g into
    ~1e-5-absolute latent differences, compounding per iteration."""
    from dragposer_tpu.drag import fast_iter, iter_kernel

    engine, sk = setup
    model, hyper = engine.model, engine.hyper
    ctx = fast_iter.make_context(model, sk, hyper)
    kctx = iter_kernel.make_kernel_context(ctx)
    opt, active, state, tposT, trotT, tlat = _block_inputs(engine, sk, B)

    ref = fast_iter.run_block(ctx, hyper, sync_k, opt, active, state,
                              tposT, trotT, tlat, model, engine.statics, sk)
    got = iter_kernel.run_block_fused(ctx, kctx, hyper, sync_k, opt, active,
                                      state, tposT, trotT, tlat)

    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    tol = dict(rtol=5e-4, atol=5e-5 * sync_k)
    for name in ("latent", "m", "v", "decoded_latent", "prev_loss",
                 "loss_pos", "loss_rot", "loss_incr"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            err_msg=name, **tol)
    for name in ("loss_pos", "loss_rot", "world_displacement",
                 "displacement", "world_rotation", "positions", "pose"):
        # aux is recomputed at decoded latents that differ slightly
        # between the two paths; near-zero pose channels amplify
        np.testing.assert_allclose(
            np.asarray(getattr(got.aux, name)),
            np.asarray(getattr(ref.aux, name)),
            err_msg=f"aux.{name}", **tol)


def test_fused_block_respects_stop_rule(setup):
    """Lanes that satisfy the stop rule at block entry must not move."""
    import jax.numpy as jnp

    from dragposer_tpu.drag import fast_iter, iter_kernel

    engine, sk = setup
    model, hyper = engine.model, engine.hyper
    ctx = fast_iter.make_context(model, sk, hyper)
    kctx = iter_kernel.make_kernel_context(ctx)
    opt, active, state, tposT, trotT, tlat = _block_inputs(engine, sk, 16)
    # force lanes 0..3 to look converged
    done = jnp.arange(16) < 4
    opt = opt._replace(
        loss_pos=jnp.where(done, 0.0, opt.loss_pos),
        loss_rot=jnp.where(done, 0.0, opt.loss_rot),
    )
    got = iter_kernel.run_block_fused(ctx, kctx, hyper, 3, opt,
                                      jnp.ones(16, bool), state,
                                      tposT, trotT, tlat)
    np.testing.assert_array_equal(np.asarray(got.t[:4]), 0)
    np.testing.assert_allclose(np.asarray(got.latent[:4]),
                               np.asarray(opt.latent[:4]), rtol=0, atol=0)
