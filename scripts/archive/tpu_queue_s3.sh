#!/bin/bash
# Session-3 TPU queue: fresh machine (no .jax_cache, no bench markers), so
# re-warm every graph the end-of-round bench needs, in priority order:
#   1. bench.py            — SRB headline + env rollout + vmap iLQR caches
#   2. bench_ppo 1024 lanes — production PPO graph (+ .ppo_lanes_ok marker)
#   3. bench_ilqr_lanes frozen — lanes iLQR graph (+ .ilqr_lanes_ok marker)
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue.log
echo "queue s3 start at $(date)" >> $LOG

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" > /dev/null 2>&1
}

wait_healthy() {
    until probe; do
        echo "tpu unhealthy at $(date); sleeping 300s" >> $LOG
        sleep 300
    done
    echo "tpu healthy at $(date)" >> $LOG
}

run_job() {  # run_job <timeout_s> <logfile> <cmd...>
    local t=$1 log=$2; shift 2
    wait_healthy
    echo "start: $* at $(date)" >> $LOG
    timeout "$t" "$@" > "$log" 2>&1
    echo "$* done rc=$? at $(date)" >> $LOG
    sleep 10
}

run_job 2400 runs/bench_warm.log python bench.py
run_job 5400 runs/bench_ppo.log python scripts/bench_ppo.py 1024 lanes
SKIP_VMAP=1 run_job 7200 runs/ilqr_lanes.log \
    env SKIP_VMAP=1 python scripts/bench_ilqr_lanes.py 64 50 frozen
echo "queue s3 complete at $(date)" >> $LOG
