"""Train the pose-generator VAE (reference ``train.py`` CLI parity).

Usage::

    python -m dragposer_tpu.cli.train_vae <data_path> <name> [--fk] [--load]
        [--epochs N] [--models-root models]

``<data_path>`` must contain ``train/`` and ``eval/`` subdirectories of
.bvh files; the model lands in ``<models-root>/model_<name>_<datadir>/``.
"""

from __future__ import annotations

import argparse
import os

from dragposer_tpu import config as cfg
from dragposer_tpu.models import checkpoint
from dragposer_tpu.train import vae as train_vae



def _enable_compilation_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DRAGPOSER_JAX_CACHE",
                                     "/tmp/dragposer_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Train Pose Generator VAE")
    parser.add_argument("data_path", type=str)
    parser.add_argument("name", type=str)
    parser.add_argument("--load", action="store_true",
                        help="resume from the saved checkpoint")
    parser.add_argument("--fk", action="store_true",
                        help="use the forward-kinematics loss term")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override the configured epoch count")
    parser.add_argument("--models-root", type=str, default="models")
    args = parser.parse_args(argv)

    model_dir = checkpoint.model_paths(args.name, args.data_path,
                                       root=args.models_root)
    train_vae.train(
        args.data_path, model_dir, cfg.VAE_PARAM,
        use_fk=args.fk, epochs=args.epochs, load=args.load,
    )


if __name__ == "__main__":
    main()
