#!/bin/bash
# Session-3 TPU queue #3: the lanes-batched iLQR graph is compile-infeasible
# on this toolchain at every config tried (frozen chunk-1 b64 >2 h, frozen
# chunk-0 b64 >1 h — both killed mid-compile; runs/tpu_queue.log), so the
# whole-body engine measurement moves to the vmap path with the frozen
# linearizer (compiles in minutes). Then the closed-loop/fidelity evals.
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue.log
echo "queue s5 start at $(date)" >> $LOG

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

run_job() {  # run_job <timeout_s> <logfile> <cmd...>
    local t=$1 log=$2; shift 2
    wait_healthy
    echo "start: $* at $(date)" >> $LOG
    timeout "$t" "$@" >> "$log" 2>&1
    echo "$* done rc=$? at $(date)" >> $LOG
    sleep 10
}

run_job 3600 runs/ilqr_vmap.log python scripts/bench_ilqr_vmap.py 64 50 8
run_job 3600 runs/ilqr_vmap.log python scripts/bench_ilqr_vmap.py 256 50 8
run_job 7200 runs/mpc45.log python scripts/mpc45.py
run_job 5400 runs/hard_contact.log python scripts/hard_contact_eval.py
run_job 7200 runs/wb_mpc.log python scripts/wb_mpc_eval.py
run_job 5400 runs/bench_srb_sweep.log python scripts/bench_srb_sweep.py
run_job 1800 runs/profile_srb.log python scripts/profile_srb.py
echo "queue s5 complete at $(date)" >> $LOG
