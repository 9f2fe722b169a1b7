"""Multi-chip execution on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton
from dragposer_tpu.parallel import mesh as meshlib

from conftest import REFERENCE_MODEL

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return meshlib.make_mesh(data=4, model=2)


def test_make_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (4, 2)


def test_shard_batch_places_leading_axis(mesh8):
    import jax

    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    sx = meshlib.shard_batch(x, mesh8)
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_sharded_run_batch_matches_unsharded(mesh8, example_bvh_path):
    """The sharded batched drag must reproduce the unsharded results."""
    import jax

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=sk, max_iter=8,
    )
    m = encoding.encode_motion(offsets, pos[2000:2010, 0, :], rots[2000:2010],
                               sk, height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)

    b = 8
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    import jax.numpy as jnp

    dqs = np.stack([n.dqs] * b)
    gp = np.stack([n.global_pos] * b)
    gr = np.stack([n.global_rot] * b)
    h0 = jnp.tile(jnp.asarray(m.heights[0])[None], (b, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)

    _, plain = engine.run_batch(states, dqs, gp, gr)
    s_states = meshlib.shard_batch(states, mesh8)
    s_dqs, s_gp, s_gr = meshlib.shard_batch((dqs, gp, gr), mesh8)
    _, sharded = engine.run_batch(s_states, s_dqs, s_gp, s_gr)

    np.testing.assert_allclose(np.asarray(sharded.pose), np.asarray(plain.pose),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(sharded.iterations),
                                  np.asarray(plain.iterations))


def test_sharded_pipelined_matches_unsharded(mesh8, example_bvh_path):
    """The sync-K pipelined runner must produce identical results when the
    batch is sharded over the data axis (the global any(frame<limit) loop
    condition becomes an all-reduce XLA inserts automatically)."""
    import jax

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.drag import engine as eng

    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=sk, max_iter=8,
    )
    m = encoding.encode_motion(offsets, pos[2000:2010, 0, :], rots[2000:2010],
                               sk, height_indices=HEIGHT_INDICES)
    n = encoding.normalize(m, means, stds)

    b = 8
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    import jax.numpy as jnp

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

    _, plain = engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=8)
    s_states = meshlib.shard_batch(states, mesh8)
    s_dqs, s_gp, s_gr = meshlib.shard_batch((dqs, gp, gr), mesh8)
    _, sharded = engine.run_batch_pipelined(s_states, s_dqs, s_gp, s_gr,
                                            sync_k=8)
    np.testing.assert_allclose(np.asarray(sharded.pose),
                               np.asarray(plain.pose), rtol=1e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(sharded.iterations),
                                  np.asarray(plain.iterations))


def test_temporal_param_sharding_layout(mesh8):
    import jax

    from dragposer_tpu.config import TEMPORAL_PARAM
    from dragposer_tpu.models import temporal as tmodel

    tparams = tmodel.init_params(jax.random.PRNGKey(0), TEMPORAL_PARAM)
    sharded = meshlib.temporal_param_sharding(tparams, mesh8)
    ff1 = sharded["enc_layers"][0]["ff1"]["w"]
    assert ff1.sharding.spec == jax.sharding.PartitionSpec("model", None)
    ff2 = sharded["enc_layers"][0]["ff2"]["w"]
    assert ff2.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    ln = sharded["enc_layers"][0]["ln1"]["g"]
    assert ln.sharding.spec == jax.sharding.PartitionSpec()


def test_evaluate_batched_mesh_cli_path(mesh8, example_bvh_path, tmp_path):
    """The PRODUCT surface for multi-chip eval: ``evaluate_batched(...,
    mesh_devices=8)`` (the ``eval_drag --batch --mesh`` path, also serving
    the daemon's OP_EVAL_BATCH) must reproduce the single-device metrics on
    a ragged directory whose lane count does not divide the mesh (padding
    lanes are inert)."""
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_batched,
                                             resolve_config)

    src = BVH().load(example_bvh_path)
    files = []
    for i, nfr in enumerate((20, 16, 12)):  # 3 lanes on 8 devices → pad 5
        b = BVH().load(example_bvh_path)
        s = 2000 + 40 * i
        b.rotations = src.rotations[s : s + nfr]
        b.positions = src.positions[s : s + nfr]
        p = str(tmp_path / f"clip{i}.bvh")
        b.save(p)
        files.append(p)

    _, _, parents, offsets, _ = encoding.info_from_bvh(src)
    sk = Skeleton.build(parents, offsets, src.names)
    engine, means, stds = build_engine(
        REFERENCE_MODEL, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=sk, max_iter=8,
    )
    single = evaluate_batched(
        engine, means, stds, sk, files, mesh_devices=1,
        save_dir=str(tmp_path / "single"))
    sharded = evaluate_batched(
        engine, means, stds, sk, files, mesh_devices=8,
        save_dir=str(tmp_path / "mesh"))
    for (m1, e1), (m8, e8) in zip(single, sharded):
        np.testing.assert_allclose(m8, m1, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(e8, e1, rtol=1e-3, atol=1e-5)
