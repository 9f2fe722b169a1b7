#!/bin/bash
# Second reference-measurement queue: 4-/5-tracker init-seed sweeps on the
# two non-primary clips (their anchor/pipelined single-seed diffs exceed 1%
# on the shorter clips — chaotic windowed configs — so the dispersion-aware
# sweep criterion needs the reference's per-clip seed distributions).
# Waits for the first queue (tools/ref_queue.sh) to finish to keep the
# single CPU serial.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS || true

while ! grep -q "QUEUE COMPLETE" /tmp/ref_queue.log 2>/dev/null; do
    sleep 30
done

stamp() { date "+%F %T"; }
for job in \
    "tools/parity_sweep.py --clip example_2 --config 5_trackers --seeds 6 --ref-only" \
    "tools/parity_sweep.py --clip example_2 --config 4_trackers --seeds 6 --ref-only" \
    "tools/parity_sweep.py --clip example_3 --config 5_trackers --seeds 6 --ref-only" \
    "tools/parity_sweep.py --clip example_3 --config 4_trackers --seeds 6 --ref-only" \
; do
    echo "== [$(stamp)] START $job"
    python $job
    echo "== [$(stamp)] DONE  $job (rc=$?)"
done
echo "== [$(stamp)] QUEUE2 COMPLETE"
