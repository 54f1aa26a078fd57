#!/bin/bash
# Round-4 TPU-recovery orchestrator (v2). Probes the pool; on recovery runs
# the on-chip queue strictly sequentially with per-step timeouts, then
# post-processes (records bench JSONs, auto-adopts a winning v8 variant with
# a CPU parity gate, commits). Logs: /tmp/onchip/*.log + /tmp/tpu_status.log.
cd /root/repo
mkdir -p /tmp/onchip
while true; do
  if timeout 120 python -c "import jax; d=jax.devices(); assert d[0].platform!='cpu'; import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) TPU_UP" >> /tmp/tpu_status.log
    break
  fi
  echo "$(date -u +%FT%TZ) down" >> /tmp/tpu_status.log
  sleep 180
done
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "$(date -u +%FT%TZ) START $name" >> /tmp/tpu_status.log
  timeout "$to" "$@" > "/tmp/onchip/$name.log" 2>&1
  echo "$(date -u +%FT%TZ) DONE $name rc=$?" >> /tmp/tpu_status.log
}
run bench       2700 python bench.py
run race_v8     3600 python scripts/race_kernel_variants.py --variants diff16,inner2,inner4,tinner2,tinner4,combo44
run postprocess 2400 python scripts/onchip_postprocess.py
if [ -f /tmp/onchip/adopted ]; then
  run bench_post  2700 python bench.py
  run postprocess2 2400 python scripts/onchip_postprocess.py
fi
run race_1408   3600 python scripts/race_kernel_variants.py --edges 1408 --variants diff16,inner11,tinner11,combo11x11
run postprocess3 2400 python scripts/onchip_postprocess.py
run occupancy   1800 python -m immunostruct_tpu.cli.profile_step --occupancy --steps 20
run geometric   2400 python scripts/geometric_signal.py --samples 512 --epochs 14
run postprocess4 2400 python scripts/onchip_postprocess.py
run seeds23    14400 python scripts/seed_sweep.py --recipe cancer --epochs 60 --seeds 2,3 --workdir /tmp/realdata
run postprocess_final 2400 python scripts/onchip_postprocess.py
echo "$(date -u +%FT%TZ) QUEUE_COMPLETE" >> /tmp/tpu_status.log
