"""Train the temporal latent predictor (reference ``train_temporal.py`` parity).

Usage::

    python -m dragposer_tpu.cli.train_temporal <data_path> <name> [--load]
        [--epochs N] [--models-root models]

Requires a trained generator checkpoint in the same model directory.
"""

from __future__ import annotations

import argparse
import os

from dragposer_tpu.models import checkpoint
from dragposer_tpu.train import temporal as train_temporal



def _enable_compilation_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DRAGPOSER_JAX_CACHE",
                                     "/tmp/dragposer_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Train Temporal Network")
    parser.add_argument("data_path", type=str)
    parser.add_argument("name", type=str)
    parser.add_argument("--load", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--models-root", type=str, default="models")
    parser.add_argument("--seed", type=int, default=None,
                        help="init-seed override (default: the recipe's "
                             "seed, 2222) — used for independent-draw runs")
    args = parser.parse_args(argv)

    model_dir = checkpoint.model_paths(args.name, args.data_path,
                                       root=args.models_root)
    train_temporal.train(
        args.data_path, model_dir, epochs=args.epochs, load=args.load,
        seed=args.seed,
    )


if __name__ == "__main__":
    main()
