#!/bin/bash
# Round-2 TPU work queue v3 (health-gated). Replaces v2 with a priority
# reorder after the long tunnel outage: the frozen-linearizer iLQR benches
# (VERDICT #3: wholebody solves/s) and a bench.py cache-warm run go FIRST so
# the driver's end-of-round bench lands with the marker + warm compile cache
# even if the tunnel dies again; the closed-loop MPC sweeps follow.
cd /root/repo
LOG=runs/tpu_queue.log

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

run_job 3600 runs/ilqr_frozen_64.log \
    env SKIP_VMAP=1 python scripts/bench_ilqr_lanes.py 64 50 frozen
run_job 3600 runs/ilqr_frozen_256.log \
    env SKIP_VMAP=1 python scripts/bench_ilqr_lanes.py 256 50 frozen
run_job 3600 runs/bench_check2.log python bench.py
run_job 7200 runs/mpc45.log python scripts/mpc45.py
run_job 7200 runs/wb_mpc_eval.log python scripts/wb_mpc_eval.py
run_job 3600 runs/hard_contact_eval.log python scripts/hard_contact_eval.py
run_job 5400 runs/bench_ppo_2048.log python scripts/bench_ppo.py 2048 lanes
run_job 5400 runs/bench_ppo_terrain.log \
    python scripts/bench_ppo.py 1024 lanes 5 terrain
run_job 3600 runs/bench_check3.log python bench.py
echo "queue runner v3 complete at $(date)" >> $LOG
