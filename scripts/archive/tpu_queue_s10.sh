#!/bin/bash
# Session-3 TPU queue #8: whole-body receding-horizon fleet rate (the
# production solve-throughput configuration), a few batch/alpha points.
cd /root/repo
LOG=runs/tpu_queue.log
echo "queue s10 start at $(date)" >> $LOG
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
run_job 5400 runs/wb_rh.log python scripts/bench_wb_rh.py 64 100 4 2
run_job 3600 runs/wb_rh.log python scripts/bench_wb_rh.py 256 100 4 2
run_job 3600 runs/wb_rh.log python scripts/bench_wb_rh.py 64 100 8 2
echo "queue s10 complete at $(date)" >> $LOG
