"""Model-directory loading: native .npz checkpoints or reference .pt files.

A model directory is interchangeable with the reference's
(``models/model_<name>_<data>/``): ``generator.npz``/``generator.pt`` +
``data.pt`` stats, ``temporal.npz``/``temporal.pt``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from dragposer_tpu.models import checkpoint, torch_import


def load_generator(model_dir: str, parents, param) -> Tuple[Dict, Dict, Dict]:
    """Returns (vae_params, means, stds); prefers the native format."""
    native = os.path.join(model_dir, "generator.npz")
    if os.path.exists(native):
        params, extra = checkpoint.load(native)
        return params, extra["means"], extra["stds"]
    return torch_import.load_generator(model_dir, parents, param)


def load_temporal(model_dir: str, param) -> Optional[Tuple[Dict, np.ndarray, np.ndarray]]:
    """Returns (params, means_latent, stds_latent), or None if absent."""
    native = os.path.join(model_dir, "temporal.npz")
    if os.path.exists(native):
        params, extra = checkpoint.load(native)
        return params, extra["means_latent"], extra["stds_latent"]
    torch_path = os.path.join(model_dir, "temporal.pt")
    if os.path.exists(torch_path):
        return torch_import.load_temporal(model_dir, param)
    return None
