"""Constraints-as-losses extension hook (reference drag_pose.py:129-183)."""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

from conftest import REFERENCE_MODEL


@pytest.fixture(scope="module")
def setup(example_bvh_path):
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=sk, max_iter=10,
    )
    m = encoding.encode_motion(
        offsets, pos[2000:2020, 0, :], rots[2000:2020], sk,
        height_indices=HEIGHT_INDICES,
    )
    n = encoding.normalize(m, means, stds)
    return engine, m, n, sk


def _loss_args(engine, sk, seed=7):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    latent = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    gpos = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    grot = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    tpos = jnp.asarray(rng.normal(size=(22, 3)).astype(np.float32))
    trot = jnp.asarray(rng.normal(size=(22, 3, 3)).astype(np.float32))
    tlat = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    return latent, gpos, grot, tpos, trot, tlat


def test_constraint_sum_joins_objective(setup):
    """total(with constraints) == total(base) + Σ wᵢ·fᵢ(ctx)."""
    from dragposer_tpu.drag import constraints as C
    from dragposer_tpu.drag import engine as eng

    engine, _, _, sk = setup
    latent, gpos, grot, tpos, trot, tlat = _loss_args(engine, sk)

    base, aux = eng._drag_loss(latent, engine.model, engine.statics, sk,
                               engine.hyper, gpos, grot, tpos, trot, tlat)

    bundle = ((C.feet_floor(), 2.0), (C.head_hips_colinear(), 0.5))
    hyper_c = engine.hyper._replace(constraints=bundle)
    with_c, aux_c = eng._drag_loss(latent, engine.model, engine.statics, sk,
                                   hyper_c, gpos, grot, tpos, trot, tlat)

    ctx = eng.ConstraintContext(
        latent=latent, pose=aux.pose, positions=aux.positions,
        world_quats=np.zeros((22, 4)),  # unused by these two constraints
        rotmats=np.zeros((22, 3, 3)), global_pos=gpos,
        world_displacement=aux.world_displacement,
    )
    expect = float(base) + sum(w * float(f(ctx)) for f, w in bundle)
    np.testing.assert_allclose(float(with_c), expect, rtol=1e-5)
    # aux losses are unchanged — constraints only shape the total
    np.testing.assert_allclose(float(aux_c.loss_pos), float(aux.loss_pos))


def test_feet_floor_oracle():
    """feet_floor equals the reference formula (drag_pose.py:132-134)."""
    import jax.numpy as jnp

    from dragposer_tpu.drag import constraints as C
    from dragposer_tpu.drag.engine import ConstraintContext

    rng = np.random.default_rng(3)
    positions = rng.normal(size=(22, 3)).astype(np.float32)
    gpos = rng.normal(size=(3,)).astype(np.float32)
    ctx = ConstraintContext(
        latent=jnp.zeros(24), pose=jnp.zeros(88),
        positions=jnp.asarray(positions), world_quats=jnp.zeros((22, 4)),
        rotmats=jnp.zeros((22, 3, 3)), global_pos=jnp.asarray(gpos),
        world_displacement=jnp.zeros(3),
    )
    got = float(C.feet_floor()(ctx))
    want = np.mean((gpos[1] + positions[[4, 8], 1]) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_reference_bundle_differentiates(setup):
    """grad of the full 4-constraint objective w.r.t. the latent is finite
    (the gated forward-cone term must not NaN under jnp.where)."""
    import jax

    from dragposer_tpu.drag import constraints as C
    from dragposer_tpu.drag import engine as eng

    engine, _, _, sk = setup
    latent, gpos, grot, tpos, trot, tlat = _loss_args(engine, sk)
    hyper_c = engine.hyper._replace(constraints=C.REFERENCE_BUNDLE)

    g = jax.grad(
        lambda z: eng._drag_loss(z, engine.model, engine.statics, sk,
                                 hyper_c, gpos, grot, tpos, trot, tlat)[0]
    )(latent)
    assert np.all(np.isfinite(np.asarray(g)))


def test_feet_floor_pulls_feet_down(setup):
    """End-to-end: a heavy feet_floor constraint lowers the mean world foot
    height produced by the optimizer versus the unconstrained engine."""
    import jax

    from dragposer_tpu.drag import constraints as C
    from dragposer_tpu.drag import engine as eng

    engine, m, n, sk = setup
    hyper_c = engine.hyper._replace(constraints=((C.feet_floor(), 50.0),))
    engine_c = eng.DragEngine(engine.model, engine.statics, sk, hyper_c,
                              engine.tparam)

    def run(e):
        state = eng.init_state(
            e.model, e.statics, e.hyper, jax.random.PRNGKey(0),
            n.dqs[0][:, None], n.global_pos[0], n.global_rot[0], m.heights[0],
        )
        _, out = e.run(state, n.dqs, n.global_pos, n.global_rot)
        return out

    base = run(engine)
    cons = run(engine_c)
    assert not np.allclose(np.asarray(base.pose), np.asarray(cons.pose))

    def foot_height(e, out):
        # decode final latents is overkill; use exported global_pos as a
        # proxy: the constraint pushes the root (and thus feet) toward y=0
        return float(np.mean(np.abs(np.asarray(out.global_pos)[:, 1])))

    assert foot_height(engine_c, cons) <= foot_height(engine, base) + 1e-6


def test_parse_spec():
    """CLI/config spec string → DragHyper.constraints tuples."""
    from dragposer_tpu.drag.constraints import parse_spec

    out = parse_spec("feet_floor:0.5, head_hips_colinear:0.1")
    assert len(out) == 2
    assert callable(out[0][0]) and out[0][1] == 0.5
    assert out[1][1] == 0.1
    assert parse_spec("") == () and parse_spec(None) == ()
    # weightless form defaults to 1.0
    assert parse_spec("feet_floor")[0][1] == 1.0
    with pytest.raises(ValueError):
        parse_spec("no_such_term:1.0")


def test_build_engine_constraints_plumbing(setup, example_bvh_path):
    """eval_drag.build_engine activates constraint terms from an explicit
    spec and from the config's default_constraints; '' forces off."""
    import dataclasses

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config

    bvh = BVH().load(example_bvh_path)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    cfg_c = dataclasses.replace(resolve_config("6_trackers"),
                                default_constraints="feet_floor:0.1")
    # explicit spec wins
    e1, _, _ = build_engine(REFERENCE_MODEL, parents, cfg_c,
                            use_temporal=False, skeleton=sk, max_iter=2,
                            constraints="feet_floor:0.2,hips_feet_colinear:1")
    assert len(e1.hyper.constraints) == 2
    assert e1.hyper.constraints[0][1] == 0.2
    # None falls back to config default
    e2, _, _ = build_engine(REFERENCE_MODEL, parents, cfg_c,
                            use_temporal=False, skeleton=sk, max_iter=2)
    assert len(e2.hyper.constraints) == 1 and e2.hyper.constraints[0][1] == 0.1
    # empty string forces off
    e3, _, _ = build_engine(REFERENCE_MODEL, parents, cfg_c,
                            use_temporal=False, skeleton=sk, max_iter=2,
                            constraints="")
    assert e3.hyper.constraints == ()
