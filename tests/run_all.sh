#!/bin/sh
# Full test suite: the fast suite plus the @pytest.mark.slow stage
# (2-process jax.distributed run, full-clip parity re-certification).
#
# On hosts with the axon TPU tunnel, a sitecustomize hook freezes the CPU
# device count at interpreter startup; scrub its gate so the virtual mesh
# can be created (tests always run on CPU regardless).
#
#   tests/run_all.sh              # fast suite + slow stage
#   tests/run_all.sh --fast       # fast suite only
#   tests/run_all.sh -k foo       # extra pytest args pass through
cd "$(dirname "$0")/.." || exit 1

SLOW=1
if [ "$1" = "--fast" ]; then
    SLOW=0
    shift
fi

# Build the native layer first (≈30 s warm toolchain) so the L7 proofs —
# including the drop-in test compiled against the reference's unmodified
# exportFunc.h — run instead of silently skipping on a fresh checkout.
echo "== native build (cmake -S native -B build) =="
cmake -S native -B build -G Ninja >/dev/null || exit 1
cmake --build build >/dev/null || exit 1
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    DRAGPOSER_REQUIRE_NATIVE=1 \
    python -m pytest tests/ -q "$@" || exit 1

if [ "$SLOW" = "1" ]; then
    echo "== slow stage (-m slow): multi-process + full-clip parity =="
    # PALLAS_AXON_SAVED lets test_parity_full_clip's subprocess restore the
    # TPU tunnel (scrubbed here for the virtual-mesh tests) so the
    # re-certification runs on the real chip.
    env -u PALLAS_AXON_POOL_IPS \
        PALLAS_AXON_SAVED="${PALLAS_AXON_POOL_IPS:-}" JAX_PLATFORMS=cpu \
        python -m pytest tests/ -q -m slow --override-ini="addopts=" "$@"
fi
