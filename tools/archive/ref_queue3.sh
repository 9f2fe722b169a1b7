#!/bin/bash
# Round-4 CPU measurement queue #3 (torch-CPU reference sides, sequential —
# single-core host).  Launch detached:
#   setsid nohup bash tools/ref_queue3.sh > /tmp/ref_queue3.log 2>&1 &
# 1. reference train.py from scratch, 100 epochs (train_h2h --side ref)
# 2. reference realtime 3-tracker seed sweep (realtime_h2h --side ref x6)
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS

stamp() { echo "== [$(date '+%F %T')] $*"; }

stamp "START train_h2h ref side (100 epochs)"
python tools/train_h2h.py --side ref --epochs 100 \
    --workdir /tmp/train_h2h/ref --json-out /tmp/train_h2h/ref/ref_train.json
stamp "DONE train_h2h ref side (rc=$?)"

for s in 2222 100 107 114 121 128; do
    out=/tmp/rt_h2h_ref_example_3_trackers_${s}.json
    if [ -s "$out" ]; then stamp "SKIP rt ref 3_trackers seed $s"; continue; fi
    stamp "START rt ref 3_trackers seed $s"
    python tools/realtime_h2h.py --side ref --clip example \
        --config 3_trackers --frames 2000 --seed "$s" --json-out "$out"
    stamp "DONE rt ref 3_trackers seed $s (rc=$?)"
done
stamp "QUEUE3 COMPLETE"
