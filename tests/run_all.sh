#!/bin/sh
# Full test suite including the 8-device virtual-mesh tests.
#
# On hosts with the axon TPU tunnel, a sitecustomize hook freezes the CPU
# device count at interpreter startup; scrub its gate so the virtual mesh
# can be created (tests always run on CPU regardless).
cd "$(dirname "$0")/.." || exit 1
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
