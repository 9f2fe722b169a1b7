#!/bin/bash
# Round-4 TPU measurement queue (sequential — one chip via the axon tunnel).
# Launch detached:
#   setsid nohup bash tools/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &
# 1. wait for the running our-side 3-tracker realtime sweep to finish
# 2. hypothesis-beam validation at committed defaults on the two clips the
#    defaults were NOT tuned on (VERDICT #1 tune/validate split)
# 3. wait for the reference 100-epoch train (CPU queue), then run our
#    trainer + eval both checkpoints (train_h2h --skip-ref-train)
set -u
cd "$(dirname "$0")/.."

stamp() { echo "== [$(date '+%F %T')] $*"; }

stamp "WAIT for rt_ours_sweep (3_trackers)"
while ! grep -q OURS_RT_SWEEP_DONE /tmp/rt_ours_3t.log 2>/dev/null; do
    sleep 30
done
stamp "rt_ours_sweep done"

for clip in example_2 example_3; do
    stamp "START beam validate-defaults $clip"
    python tools/hypotheses_sweep.py models/model_dancedb_example \
        --validate-defaults --clip "$clip" --seeds-n 8
    stamp "DONE beam validate-defaults $clip (rc=$?)"
done

stamp "WAIT for reference train (CPU queue)"
while [ ! -s /tmp/train_h2h/ref/ref_train.json ]; do
    sleep 60
done
stamp "reference train done"

stamp "START train_h2h ours + eval (100 epochs, --skip-ref-train)"
python tools/train_h2h.py --epochs 100 --skip-ref-train \
    --workdir /tmp/train_h2h
stamp "DONE train_h2h (rc=$?)"
stamp "TPU_QUEUE4 COMPLETE"
