#!/bin/bash
# Session-3 TPU queue #6: after s7 — re-warm + re-measure everything the
# end-of-round bench touches with the unrolled-Riccati SRB backward:
# profile phases, batch sweep, then the full bench.py line.
cd /root/repo
LOG=runs/tpu_queue.log

until grep -q "queue s7 complete" $LOG 2>/dev/null; do sleep 60; done
echo "queue s8 start at $(date)" >> $LOG

probe() {
    timeout 240 python -c "
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

run_job() {
    local t=$1 log=$2; shift 2
    wait_healthy
    echo "start: $* at $(date)" >> $LOG
    timeout "$t" "$@" >> "$log" 2>&1
    echo "$* done rc=$? at $(date)" >> $LOG
    sleep 10
}

run_job 1800 runs/profile_srb2.log python scripts/profile_srb.py
run_job 5400 runs/bench_srb_sweep2.log python scripts/bench_srb_sweep.py
run_job 3600 runs/bench_final.log python bench.py
echo "queue s8 complete at $(date)" >> $LOG
