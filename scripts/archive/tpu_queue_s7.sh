#!/bin/bash
# Session-3 TPU queue #5: chains after s6 — wb-MPC cmd-3 fix + final table.
cd /root/repo
LOG=runs/tpu_queue.log

until grep -q "queue s6 complete" $LOG 2>/dev/null; do sleep 60; done
echo "queue s7 start at $(date)" >> $LOG

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

run_job 9000 runs/wb_mpc_followup.log python scripts/wb_mpc_followup.py
echo "queue s7 complete at $(date)" >> $LOG
