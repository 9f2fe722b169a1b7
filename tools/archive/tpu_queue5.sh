#!/bin/bash
# Round-4 (continued) TPU measurement queue — one chip via the axon tunnel,
# so TPU jobs must serialize.  Launch detached:
#   setsid nohup bash tools/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &
# 1. wait for the free-lanes beam diagnostic (diag_ex2_free) to finish
# 2. eval-seed sweep of the SECOND reference training draw's checkpoint
#    (ref_draw2, init seed 100) once its CPU train completes
# 3. merge it into PARITY.json (symmetric draw-variance evidence)
set -u
cd "$(dirname "$0")/.."

stamp() { echo "== [$(date '+%F %T')] $*"; }

stamp "WAIT for diag_ex2_free"
while [ ! -s /tmp/diag_ex2_free.json ]; do
    sleep 30
done
stamp "diag_ex2_free done"

stamp "WAIT for ref draw2 train"
while [ ! -s /tmp/train_h2h/ref_draw2/ref_train.json ]; do
    sleep 30
done
stamp "ref draw2 train done"

stamp "START eval sweep of ref draw2 checkpoint"
python tools/eval_checkpoint_sweep.py \
    /tmp/train_h2h/ref_draw2/models/model_h2h_example \
    --out /tmp/eval_ref_draw2.json
stamp "DONE eval sweep (rc=$?)"

stamp "START merge"
python tools/ref_draw2_merge.py \
    --draw2-train /tmp/train_h2h/ref_draw2/ref_train.json \
    --draw2-eval /tmp/eval_ref_draw2.json
stamp "DONE merge (rc=$?)"
stamp "TPU_QUEUE5 COMPLETE"
