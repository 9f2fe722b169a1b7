"""Device meshes and sharding helpers.

The reference is single-process/single-device (``eval_drag.py:27-30``); the
TPU framework treats scale-out as first-class:

* **batched eval** — sequences are embarrassingly parallel: shard the batch
  axis of the vmapped drag scan over a 1-D ``data`` mesh (model weights are
  replicated — 168k params);
* **data-parallel training** — batch sharded over ``data``; XLA inserts the
  gradient ``psum`` over ICI;
* **tensor-parallel temporal training** — the transformer FFN (2048 hidden)
  and attention heads shard over a ``model`` axis.

No explicit collectives appear in user code: shardings are declared with
``NamedSharding`` and XLA's SPMD partitioner places all-reduces on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(tree, mesh: Mesh):
    """Place every array in the pytree with its leading axis on ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def temporal_param_sharding(tparams, mesh: Mesh):
    """Tensor-parallel layout for the temporal transformer.

    FFN: ``ff1`` (ff, d) row-sharded, ``ff2`` (d, ff) column-sharded →
    one ``psum`` per FF block.  Attention in/out projections shard across
    heads (rows of the packed QKV / columns of out).  Everything else
    (LayerNorms, small projections) is replicated.
    """

    def spec_for(path: str, x):
        if x.ndim < 2:
            return P()
        if path.endswith("ff1/w"):
            return P("model", None)
        if path.endswith("ff2/w"):
            return P(None, "model")
        if path.endswith("in_w"):       # packed QKV (3d, d): head-sharded rows
            return P("model", None)
        if path.endswith("out_w"):      # (d, d): head-sharded columns
            return P(None, "model")
        return P()

    flat = jax.tree_util.tree_flatten_with_path(tparams)[0]

    def place(path, x):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        return jax.device_put(x, NamedSharding(mesh, spec_for(name, x)))

    leaves = [place(p, x) for p, x in flat]
    treedef = jax.tree_util.tree_structure(tparams)
    return jax.tree_util.tree_unflatten(treedef, leaves)
