#!/bin/bash
# Session-4 TPU queue #14: revalidate the whole-body MPC after the
# terminal-knot reference fix (review finding) — fleet bench re-warm
# (rewrites .wb_rh_ok for the new graph), speed-scheduled cmd 1-5 table,
# PPO lanes scaling row at 2048 envs, then the final full bench line.
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue.log
echo "queue s14 start at $(date)" >> $LOG
probe() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" > /dev/null 2>&1
}
wait_healthy() {
    until probe; do
        echo "tpu unhealthy at $(date); sleeping 300s" >> $LOG; sleep 300
    done
    echo "tpu healthy at $(date)" >> $LOG
}
run_job() {
    local t=$1 log=$2; shift 2
    wait_healthy
    echo "start: $* at $(date)" >> $LOG
    timeout "$t" "$@" >> "$log" 2>&1
    echo "$* done rc=$? at $(date)" >> $LOG
    sleep 10
}
run_job 3600 runs/wb_rh2.log python scripts/bench_wb_rh.py 128 100 4 2 16 2
run_job 5400 runs/wb_sched.log python scripts/wb_sched_eval.py 1500
run_job 5400 runs/ppo2048.log python scripts/bench_ppo.py 2048 lanes
run_job 7200 runs/bench_final4.log python bench.py
echo "queue s14 complete at $(date)" >> $LOG
