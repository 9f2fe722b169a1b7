"""Test configuration: force a deterministic 8-device CPU mesh.

Must run before anything imports jax (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hermetic tests: never the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: on machines with the axon TPU tunnel, a sitecustomize hook (gated on
# PALLAS_AXON_POOL_IPS) initializes the JAX backends at interpreter startup,
# freezing the CPU device count before this file runs; the multi-device mesh
# tests then skip.  Run `tests/run_all.sh` (scrubbed environment) to include
# them.  (A conftest re-exec does not work: pytest's fd-level capture
# swallows the child's output.)

import jax  # noqa: E402

# The persistent cache dir must be keyed by environment: the axon
# sitecustomize hook builds CPU executables with different target-machine
# features (+prefer-no-scatter, …) than a scrubbed environment, and XLA
# happily LOADS the mismatched AOT entry and computes garbage (observed:
# poses off by 1e3 in tests that pass in either environment alone).
_env_tag = "axoncpu" if os.environ.get("PALLAS_AXON_POOL_IPS") else "cpu"
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/dragposer_jax_cache_test_{_env_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/python/data/example"
REFERENCE_MODEL = "/root/reference/python/models/model_dancedb"

# 22-joint AMASS skeleton of the example data (verified against the BVH
# hierarchy; see SURVEY.md A.1).
EXAMPLE_PARENTS = np.array(
    [0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 12, 11, 14, 15, 16, 11, 18, 19, 20],
    dtype=np.int64,
)


@pytest.fixture(scope="session")
def example_parents():
    return EXAMPLE_PARENTS.copy()


@pytest.fixture(scope="session")
def example_bvh_path():
    return os.path.join(REFERENCE_DATA, "eval", "example.bvh")
