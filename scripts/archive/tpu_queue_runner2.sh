#!/bin/bash
# Round-2 TPU work queue v2 (health-gated). Replaces tpu_queue_runner.sh:
# the frozen-operator iLQR bench (mpc/linearize.py) supersedes the
# compile-bound FD-lanes attempt and runs right after the MPC sweep.
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
    timeout "$t" "$@" > "$log" 2>&1
    echo "$* done rc=$? at $(date)" >> $LOG
    sleep 10
}

run_job 7200 runs/mpc45.log python scripts/mpc45.py
run_job 3600 runs/ilqr_frozen_64.log \
    env SKIP_VMAP=1 python scripts/bench_ilqr_lanes.py 64 50 frozen
run_job 3600 runs/ilqr_frozen_256.log \
    env SKIP_VMAP=1 python scripts/bench_ilqr_lanes.py 256 50 frozen
run_job 3600 runs/hard_contact_eval.log python scripts/hard_contact_eval.py
run_job 7200 runs/wb_mpc_eval.log python scripts/wb_mpc_eval.py
run_job 5400 runs/bench_ppo_2048.log python scripts/bench_ppo.py 2048 lanes
run_job 3600 runs/bench_check2.log python bench.py
echo "queue runner v2 complete at $(date)" >> $LOG
