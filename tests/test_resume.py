"""Exact training resume: interrupted + resumed == uninterrupted.

The reference saves params only (``train.py:285-319``), so ``--load``
restarts Adam cold and the loss spikes for many epochs (resume shock).
``checkpoint.save_training_state`` stores Adam moments + the RNG chain +
the best bar, and a resumed run reproduces the uninterrupted run's
epoch-by-epoch eval losses.
"""

import os
import re
import shutil

import numpy as np
import pytest

from conftest import REFERENCE_DATA, REFERENCE_MODEL

pytestmark = pytest.mark.heavy  # compile-heavy integration tier: excluded from `-m "not slow and not heavy"` (fast dev tier)


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    """Trimmed copy of the example data (training on it is seconds/epoch)."""
    from dragposer_tpu.io.bvh import BVH

    root = tmp_path_factory.mktemp("tinydata")
    for sub, n_frames in (("train", 420), ("eval", 300)):
        os.makedirs(root / sub, exist_ok=True)
        src_dir = os.path.join(REFERENCE_DATA, sub)
        src = sorted(f for f in os.listdir(src_dir) if f.endswith(".bvh"))[0]
        b = BVH().load(os.path.join(src_dir, src))
        b.rotations = b.rotations[2000:2000 + n_frames]
        b.positions = b.positions[2000:2000 + n_frames]
        b.save(str(root / sub / "clip.bvh"))
    return str(root)


def _run(data_dir, model_dir, epochs, load=False):
    from dragposer_tpu.train import temporal

    lines = []
    temporal.train(data_dir, model_dir, epochs=epochs, load=load,
                   log=lambda m: lines.append(str(m)))
    losses = {}
    for ln in lines:
        m = re.search(r"Epoch: (\d+) .*Eval Loss: ([0-9.]+)", ln)
        if m:
            losses[int(m.group(1))] = float(m.group(2))
    return losses


def test_resumed_run_matches_uninterrupted(tiny_data, tmp_path):
    dir_a = str(tmp_path / "model_a")
    dir_b = str(tmp_path / "model_b")
    for d in (dir_a, dir_b):
        os.makedirs(d)
        for f in ("generator.pt", "data.pt"):
            shutil.copy(os.path.join(REFERENCE_MODEL, f), os.path.join(d, f))

    full = _run(tiny_data, dir_a, epochs=4)
    first = _run(tiny_data, dir_b, epochs=2)
    resumed = _run(tiny_data, dir_b, epochs=4, load=True)

    assert set(full) == {0, 1, 2, 3}
    assert set(first) == {0, 1}
    assert set(resumed) == {2, 3}, "resume must continue at epoch 2"
    for e in (0, 1):
        np.testing.assert_allclose(first[e], full[e], rtol=1e-5)
    for e in (2, 3):
        # identical params + Adam moments + RNG chain -> identical epochs
        np.testing.assert_allclose(resumed[e], full[e], rtol=1e-4,
                                   err_msg=f"epoch {e} diverged after resume")


def test_optimizer_state_round_trip(tmp_path):
    """save_training_state/load_training_state reproduce optax Adam state."""
    import jax
    import jax.numpy as jnp
    import optax

    from dragposer_tpu.models import checkpoint

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    # take two real steps so the moments are non-trivial
    for i in range(2):
        grads = jax.tree.map(lambda p: p * 0.1 + i, params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "state.npz")
    checkpoint.save_training_state(path, params, state,
                                   extra={"epoch": np.asarray(7)})
    p2, s2, extra = checkpoint.load_training_state(path, opt.init(params))
    assert int(extra["epoch"]) == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state continues identically
    grads = jax.tree.map(lambda p: p * 0.1, params)
    u1, _ = opt.update(grads, state, params)
    u2, _ = opt.update(grads, s2, p2)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
