#!/bin/bash
# Round-2 TPU queue v5: waits for runner v4 (pid $1), then runs the SRB
# batch-scaling sweep (headline solver solves/s at 256..8192).
cd /root/repo
LOG=runs/tpu_queue.log
PREV_PID=${1:?usage: tpu_queue_runner5.sh <runner4_pid>}

while kill -0 "$PREV_PID" 2>/dev/null; do
    sleep 60
done
echo "runner5: v4 (pid $PREV_PID) done at $(date)" >> $LOG

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

run_job 5400 runs/bench_srb_sweep.log python scripts/bench_srb_sweep.py
echo "queue runner v5 complete at $(date)" >> $LOG
