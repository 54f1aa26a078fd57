#!/bin/bash
# Round-5 follow-up #2: after the main queue and follow-up #1 finish,
# extend the WINNING flagship arm (cc0 — contrastive off) to 5 seeds so
# the new headline row carries the n=5 protocol, and give the collapse
# fix its healthy seeds at the same arm count.
set -x
cd "$(dirname "$0")/.."
while pgrep -f "r05_experiments.sh\|r05_followup.sh" > /dev/null; do sleep 60; done

timeout 9600 python scripts/seed_sweep.py --recipe cancer --epochs 60 \
  --seeds 4,5 --coeff-contrastive 0.0 --tag cc0 \
  > /tmp/r05/flagship_cc0_seeds45.log 2>&1 || true

echo FOLLOWUP2-DONE
