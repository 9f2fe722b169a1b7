#!/bin/bash
# Contrast diagnostics for the beam-selection study: fit<->GT correlation
# of 64 INDEPENDENT lanes on the clips where the beam DOES win, to pair
# with the committed example_2 anti-correlation finding.
#   setsid nohup bash tools/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

stamp() { echo "== [$(date '+%F %T')] $*"; }

stamp "WAIT for tpu_queue5"
while ! grep -q TPU_QUEUE5_COMPLETE /tmp/tpu_queue5.log 2>/dev/null \
      && ! grep -q "TPU_QUEUE5 COMPLETE" /tmp/tpu_queue5.log 2>/dev/null; do
    sleep 30
done
stamp "queue5 done"

for clip in example example_3; do
    stamp "START free-lanes diag $clip"
    python tools/diag_beam_selection.py models/model_dancedb_example \
        --clip "$clip" --seed 0 --restarts 64 --branch-every 100000 \
        --json-out /tmp/diag_${clip}_free.json
    stamp "DONE free-lanes diag $clip (rc=$?)"
done
stamp "TPU_QUEUE6 COMPLETE"
