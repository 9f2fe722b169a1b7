#!/bin/bash
# Serial queue of reference-side (torch CPU) measurement jobs for the
# multi-clip parity evidence: matrices for the two eval clips the parity
# artifact did not yet cover, then 3-tracker init-seed sweeps on them
# (the chaotic-regime / hypothesis-beam criterion needs the reference's
# per-clip seed distribution).  Pure CPU: never touches the TPU tunnel;
# our side fills in afterwards via `parity_matrix.py --reuse-ref` /
# `parity_sweep.py --skip-reference` on the real chip.
#
# Usage: setsid nohup bash tools/ref_queue.sh > /tmp/ref_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS || true

stamp() { date "+%F %T"; }

for job in \
    "tools/parity_matrix.py --clip example_2 --configs 6,5,4 --ref-only" \
    "tools/parity_matrix.py --clip example_3 --configs 6,5,4 --ref-only" \
    "tools/parity_matrix.py --clip example_2 --configs 3 --ref-only" \
    "tools/parity_matrix.py --clip example_3 --configs 3 --ref-only" \
    "tools/parity_sweep.py --clip example_2 --config 3_trackers --seeds 6 --ref-only" \
    "tools/parity_sweep.py --clip example_3 --config 3_trackers --seeds 6 --ref-only" \
; do
    echo "== [$(stamp)] START $job"
    python $job
    echo "== [$(stamp)] DONE  $job (rc=$?)"
done
echo "== [$(stamp)] QUEUE COMPLETE"
