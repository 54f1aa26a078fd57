#!/bin/bash
# Round-5 follow-up: wait for the main queue (r05_experiments.sh) to
# finish, then run the healthy-seed check for the winning collapse fix —
# does stage-1 LR 3e-4 shift the seeds that were NOT collapsing?
set -x
cd "$(dirname "$0")/.."
while pgrep -f "r05_experiments.sh" > /dev/null; do sleep 60; done

timeout 7200 python scripts/seed_sweep.py --recipe iedb --model HybridModelv2 \
  --seeds 1,3 --epochs 40 --lr-pretrain 3e-4 --tag lowlr_healthy \
  > /tmp/r05/collapse_lowlr_healthy.log 2>&1 || true

echo FOLLOWUP-DONE
