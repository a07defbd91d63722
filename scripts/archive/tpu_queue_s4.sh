#!/bin/bash
# Session-3 TPU queue #2: after the warm-up queue (tpu_queue_s3.sh), run the
# round-2 open-item measurements in value order:
#   1-3. frozen-lanes iLQR throughput trials (chunk=whole-horizon, batch 64/256)
#        -> pick the bench.py extra config (VERDICT: >=500 solves/s at batch 64+)
#   4. mpc45: SRB closed-loop stride-frequency sweep at cmd 4/5 (PARITY gap)
#   5. hard-contact bp5_155 fidelity eval (VERDICT weak #4)
#   6. wb_mpc_eval: whole-body iLQR receding horizon cmd 1-5
#   7. SRB batch-scaling sweep refresh
cd /root/repo
LOG=runs/tpu_queue.log

until grep -q "queue s3 complete" $LOG 2>/dev/null; do sleep 60; done
echo "queue s4 start at $(date)" >> $LOG

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

run_job 3600 runs/ilqr_lanes.log env SKIP_VMAP=1 \
    python scripts/bench_ilqr_lanes.py 64 50 frozen 0
run_job 3600 runs/ilqr_lanes.log env SKIP_VMAP=1 \
    python scripts/bench_ilqr_lanes.py 256 50 frozen 0
run_job 3600 runs/ilqr_lanes.log env SKIP_VMAP=1 \
    python scripts/bench_ilqr_lanes.py 256 50 frozen 1
run_job 7200 runs/mpc45.log python scripts/mpc45.py
run_job 5400 runs/hard_contact.log python scripts/hard_contact_eval.py
run_job 7200 runs/wb_mpc.log python scripts/wb_mpc_eval.py
run_job 5400 runs/bench_srb_sweep.log python scripts/bench_srb_sweep.py
echo "queue s4 complete at $(date)" >> $LOG
