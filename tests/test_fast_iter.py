"""Transposed batch-in-lanes loss vs the reference-parity vmapped loss.

``fast_iter.forward_T`` must reproduce ``engine._drag_loss`` (values AND
gradients) on random latents/targets — same formulas, different layout.
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


def _random_inputs(engine, sk, B=16, seed=0):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.ops import quat

    L = engine.model.means_latent.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    z = jax.random.normal(k1, (B, L)) * 0.7
    gr = quat.normalize(jax.random.normal(k2, (B, 4)))
    tpos = jax.random.normal(k3, (B, sk.n_joints, 3)) * 0.3
    trot = quat.to_matrix(quat.normalize(
        jax.random.normal(k4, (B, sk.n_joints, 4))))
    tlat = jax.random.normal(k5, (B, L)) * 0.2
    return z, gr, tpos, trot, tlat


def test_forward_matches_drag_loss(setup):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter

    engine, sk = setup
    model, statics, hyper = engine.model, engine.statics, engine.hyper
    z, gr, tpos, trot, tlat = _random_inputs(engine, sk)
    gp = jnp.zeros((z.shape[0], 3))

    ref_fn = jax.vmap(
        lambda zz, g1, g2, tp, tr, tl: eng._drag_loss(
            zz, model, statics, sk, hyper, g1, g2, tp, tr, tl))
    ref_total, ref_aux = ref_fn(z, gp, gr, tpos, trot, tlat)

    ctx = fast_iter.make_context(model, sk, hyper)
    f = fast_iter.forward_T(ctx, hyper, z.T, gr.T,
                            jnp.moveaxis(tpos, 0, -1),
                            jnp.moveaxis(trot, 0, -1), tlat.T)

    np.testing.assert_allclose(np.asarray(f.total), np.asarray(ref_total),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(f.loss_pos),
                               np.asarray(ref_aux.loss_pos),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(f.loss_rot),
                               np.asarray(ref_aux.loss_rot),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(f.wd.T),
                               np.asarray(ref_aux.world_displacement),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.disp.T),
                               np.asarray(ref_aux.displacement),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.wr.T),
                               np.asarray(ref_aux.world_rotation),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(f.pos, -1, 0)),
                               np.asarray(ref_aux.positions),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.pose_cm[ctx.unperm].T),
                               np.asarray(ref_aux.pose),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match(setup):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter

    engine, sk = setup
    model, statics, hyper = engine.model, engine.statics, engine.hyper
    z, gr, tpos, trot, tlat = _random_inputs(engine, sk, seed=7)
    gp = jnp.zeros((z.shape[0], 3))

    ref_g = jax.vmap(
        lambda zz, g1, g2, tp, tr, tl: jax.grad(
            lambda l: eng._drag_loss(l, model, statics, sk, hyper,
                                     g1, g2, tp, tr, tl)[0])(zz))(
        z, gp, gr, tpos, trot, tlat)

    ctx = fast_iter.make_context(model, sk, hyper)

    def total(zT):
        return jnp.sum(fast_iter.forward_T(
            ctx, hyper, zT, gr.T, jnp.moveaxis(tpos, 0, -1),
            jnp.moveaxis(trot, 0, -1), tlat.T).total)

    g = jax.grad(total)(z.T).T
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                               rtol=1e-3, atol=1e-5)


def test_fast_pipeline_lockstep(setup, example_bvh_path):
    """Pipelined fast inner loop vs the vmapped inner loop, knife-edge-free
    (max_iter=1): the full bookkeeping path through fast_iter.run_block."""
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=True, skeleton=sk, max_iter=1,
    )
    m = encoding.encode_motion(offsets, pos[2000:2020, 0, :],
                               rots[2000:2020], sk,
                               height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)
    b = 3
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    dqs = np.stack([np.roll(n.dqs, -i, axis=0) for i in range(b)])
    gp = np.stack([np.roll(n.global_pos, -i, axis=0) for i in range(b)])
    gr = np.stack([np.roll(n.global_rot, -i, axis=0) for i in range(b)])
    h0 = jnp.tile(jnp.asarray(m.heights[0])[None], (b, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)

    _, slow = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=4,
                                         fast=False)
    _, out = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=4,
                                        fast=True)
    np.testing.assert_array_equal(np.asarray(out.iterations),
                                  np.asarray(slow.iterations))
    np.testing.assert_allclose(np.asarray(out.pose), np.asarray(slow.pose),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.global_pos),
                               np.asarray(slow.global_pos),
                               rtol=1e-3, atol=2e-3)


def test_eval_targets_T_matches_vmapped(setup):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter
    from dragposer_tpu.ops import quat

    engine, sk = setup
    model, hyper = engine.model, engine.hyper
    B = 8
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dqs_f = jax.random.normal(k1, (B, sk.n_joints * 8)) * 0.5
    gt_pos = jax.random.normal(k2, (B, 3))
    gt_rot = quat.normalize(jax.random.normal(k3, (B, 4)))
    gpos = jax.random.normal(k4, (B, 3)) * 0.2

    class _S:  # _eval_targets only reads .global_pos
        def __init__(self, gp):
            self.global_pos = gp

    ref_pos, ref_rot = jax.vmap(
        lambda g, d, p, r: eng._eval_targets(model, sk, _S(g), d, p, r)
    )(gpos, dqs_f, gt_pos, gt_rot)

    ctx = fast_iter.make_context(model, sk, hyper)
    tposT, trotT = fast_iter.eval_targets_T(ctx, hyper, gpos, dqs_f,
                                            gt_pos, gt_rot)
    np.testing.assert_allclose(np.moveaxis(np.asarray(tposT), -1, 0),
                               np.asarray(ref_pos), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(trotT), -1, 0),
                               np.asarray(ref_rot), rtol=1e-4, atol=1e-5)
