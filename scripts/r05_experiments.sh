#!/bin/bash
# Round-5 on-chip experiment queue (VERDICT r4 items 5-8), run sequentially
# so jobs never contend for the remote-compile tunnel. Each leg is
# timeout-bounded and failures don't stop the queue. Logs under /tmp/r05.
#
# Prereqs: /tmp/realdata corpus (scripts/realdata_e2e.py) and
# /tmp/structure_control/unique corpus (scripts/structure_control.py arm
# build) already on disk.
set -x
mkdir -p /tmp/r05
cd "$(dirname "$0")/.."

# ---- item 5: geometric learnability through the production kernels ------
timeout 2400 python scripts/geometric_signal.py \
  > /tmp/r05/geometric.log 2>&1 || true

# ---- item 6: collapse-mitigation arms (40+40 multimodal recipe, seed 2 —
# the seed whose pretrain flatlined in round 3) -----------------------------
# arm 0: control — does the flatline reproduce on the rebuilt corpus?
timeout 3600 python scripts/seed_sweep.py --recipe iedb --model HybridModelv2 \
  --seeds 2 --epochs 40 --tag collapse_control \
  > /tmp/r05/collapse_control.log 2>&1 || true
# arm a: stage-1 LR warmup over 10 epochs
timeout 3600 python scripts/seed_sweep.py --recipe iedb --model HybridModelv2 \
  --seeds 2 --epochs 40 --pretrain-warmup-epochs 10 --tag collapse_warmup \
  > /tmp/r05/collapse_warmup.log 2>&1 || true
# arm b: lower stage-1 LR (3e-4)
timeout 3600 python scripts/seed_sweep.py --recipe iedb --model HybridModelv2 \
  --seeds 2 --epochs 40 --lr-pretrain 3e-4 --tag collapse_lowlr \
  > /tmp/r05/collapse_lowlr.log 2>&1 || true
# arm c: the guard's symptomatic re-init
timeout 3600 python scripts/seed_sweep.py --recipe iedb --model HybridModelv2 \
  --seeds 2 --epochs 40 --reinit-on-collapse --tag collapse_reinit \
  > /tmp/r05/collapse_reinit.log 2>&1 || true

# ---- item 7: contrastive/comparative accuracy arms (flagship, 60 ep/stage,
# 3 seeds each; the base arm cc=0.1 + wt-on is round 4's completed sweep) ---
timeout 14400 python scripts/seed_sweep.py --recipe cancer --epochs 60 \
  --seeds 1,2,3 --coeff-contrastive 0.0 --tag cc0 \
  > /tmp/r05/flagship_cc0.log 2>&1 || true
timeout 14400 python scripts/seed_sweep.py --recipe cancer --epochs 60 \
  --seeds 1,2,3 --no-use-wt-for-downstream --tag nowt \
  > /tmp/r05/flagship_nowt.log 2>&1 || true

# ---- item 8: graduate the two headline recipes to 5 seeds -----------------
timeout 9600 python scripts/seed_sweep.py --recipe cancer --epochs 60 \
  --seeds 4,5 --tag base \
  > /tmp/r05/flagship_seeds45.log 2>&1 || true
timeout 7200 python scripts/seed_sweep.py --recipe iedb --model SequenceFpModel \
  --seeds 1,2,3,4,5 --epochs 40 --tag base \
  > /tmp/r05/seqonly_seeds15.log 2>&1 || true

# ---- refresh the headline bench --------------------------------------------
timeout 1800 python bench.py > /tmp/r05/bench.log 2>&1 || true

echo QUEUE-DONE
