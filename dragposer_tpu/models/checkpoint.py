"""Native checkpoint format: flat .npz with slash-separated pytree paths.

Mirrors the reference checkpoint *capability* (best-metric save, resume,
normalization stats bundled — ``python/src/train.py:257-319``) with a
dependency-free container.  Model directories hold::

    generator.npz   VAE params (+ means/stds under "__stats__/...")
    temporal.npz    temporal params + latent means/stds
    parameters.json training hyperparameters (the reference's parameters.txt)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _to_host(tree: Any) -> Any:
    """ONE batched device→host transfer for a whole pytree.

    Per-leaf ``np.asarray`` inside ``_flatten`` pays a blocking round
    trip per leaf — over the tunneled dev chip (~25 ms each) a ~300-leaf
    params+Adam checkpoint measured 8.2 s; ``jax.device_get`` issues all
    copies async and blocks once (~0.3 s)."""
    import jax

    return jax.device_get(tree)


def save(path: str, params: Any, extra: Dict[str, Any] | None = None) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(_to_host(params), "params/", flat)
    if extra:
        _flatten(extra, "extra/", flat)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load(path: str) -> Tuple[Any, Dict[str, Any]]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params_flat = {k[len("params/"):]: v for k, v in flat.items()
                   if k.startswith("params/")}
    extra_flat = {k[len("extra/"):]: v for k, v in flat.items()
                  if k.startswith("extra/")}
    return _unflatten(params_flat), (_unflatten(extra_flat) if extra_flat else {})


def save_training_state(path: str, params: Any, opt_state: Any,
                        extra: Dict[str, Any] | None = None) -> None:
    """Full resume checkpoint: params + optimizer state + scalars.

    Fixes the reference's resume shock (``train.py:285-319`` saves params
    only, so ``--load`` restarts Adam's moments from zero and the loss
    spikes for many epochs).  ``opt_state`` is stored as ordered tree
    leaves; :func:`load_training_state` restores it into a freshly
    ``optimizer.init``-ed structure."""
    import jax

    flat: Dict[str, np.ndarray] = {}
    params, opt_leaves = _to_host((params, jax.tree.leaves(opt_state)))
    _flatten(params, "params/", flat)
    if extra:
        _flatten(extra, "extra/", flat)
    for i, leaf in enumerate(opt_leaves):
        flat[f"opt/{i:05d}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_training_state(path: str, opt_state_template: Any):
    """Returns (params, opt_state, extra); ``opt_state_template`` is a fresh
    ``optimizer.init(params)`` providing the pytree structure."""
    import jax

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    extra_flat = {k[len("extra/"):]: v for k, v in flat.items()
                  if k.startswith("extra/")}
    opt_keys = sorted(k for k in flat if k.startswith("opt/"))
    treedef = jax.tree.structure(opt_state_template)
    template_leaves = jax.tree.leaves(opt_state_template)
    assert len(opt_keys) == len(template_leaves), (
        f"optimizer state mismatch: checkpoint has {len(opt_keys)} leaves, "
        f"optimizer expects {len(template_leaves)}")
    leaves = [np.asarray(flat[k], dtype=l.dtype)
              for k, l in zip(opt_keys, template_leaves)]
    opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, (_unflatten(extra_flat) if extra_flat else {})


def save_hparams(model_dir: str, param: Dict) -> None:
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "parameters.json"), "w") as f:
        json.dump(param, f, indent=1)


def model_paths(name: str, data_dir: str, root: str = "models") -> str:
    """models/model_<name>_<datadir>/ — same layout rule as the reference."""
    model_name = f"model_{name}_{os.path.basename(os.path.normpath(data_dir))}"
    return os.path.join(root, model_name)
