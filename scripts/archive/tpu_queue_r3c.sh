#!/bin/bash
# Round-3 queue, leg C (supersedes r3b's tail: the lr15 sweep showed the
# constant-lr production leg is unstable, so an lr-ANNEALED leg runs before
# the expensive kappa/bench stages). Chain:
#   wait for the in-flight csv_441 confirm-eval (exact PID) ->
#   export csv_441 as the provisional lanes-flagship artifact ->
#   annealed 4e8 relaxation leg (lr 1.5e-3 -> 1e-4, --lr-final) ->
#   ckpt sweep -> confirm-eval its BEST ->
#   entropy-kappa at reference scale -> PPO/iLQR bench markers -> bench x2.
# Bounded waits, rc/timeout logging, per-invocation run dirs (ADVICE r2).
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r3c.log
echo "queue r3c start $(date)" >> $LOG

EVAL_PID=${1:-}
CFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_train.yaml
ADIR=runs/relax_lanes_anneal_$(date +%s)

probe() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" > /dev/null 2>&1
}
wait_healthy() {
    local waited=0
    until probe; do
        echo "tpu unhealthy at $(date); sleeping 300s" >> $LOG; sleep 300
        waited=$((waited + 300))
        if [ $waited -ge 7200 ]; then
            echo "tpu never recovered after 2h; proceeding anyway at $(date)" >> $LOG
            break
        fi
    done
    echo "tpu healthy at $(date)" >> $LOG
}
run_job() {
    local t=$1 log=$2; shift 2
    wait_healthy
    echo "start: $* at $(date)" >> $LOG
    timeout "$t" "$@" >> "$log" 2>&1
    local rc=$?
    echo "$* done rc=$rc at $(date)" >> $LOG
    [ $rc -eq 124 ] && echo "JOB TIMED OUT: $*" >> $LOG
    sleep 10
}

# 1. bounded wait for the csv_441 confirm-eval already on the chip
if [ -n "$EVAL_PID" ]; then
    WAITED=0
    while [ -d "/proc/$EVAL_PID" ]; do
        sleep 30; WAITED=$((WAITED + 30))
        if [ $WAITED -ge 3600 ]; then
            echo "eval pid $EVAL_PID still alive after 1h; proceeding at $(date)" >> $LOG
            break
        fi
    done
    echo "confirm-eval (pid $EVAL_PID) finished at $(date)" >> $LOG
fi

# 2. provisional artifact: the lr15 leg's zero-fall pick (csv_441) — kept
#    unless the annealed leg's pick beats it (decided by the operator from
#    the two sweep tables; this stage just makes the current best durable)
LR15_DIR=runs/relax_lanes_lr15/2026-08-19-05-02-24
if [ -d "$LR15_DIR/csv_441" ]; then
    rm -rf artifacts/irrl_tpu_relaxed_4e8_lanes
    cp -r "$LR15_DIR/csv_441" artifacts/irrl_tpu_relaxed_4e8_lanes
    cp "$LR15_DIR/bp5_train.yaml" artifacts/irrl_tpu_relaxed_4e8_lanes/
    echo "csv_441 (lr 1.5e-3 constant leg)" > artifacts/irrl_tpu_relaxed_4e8_lanes/PICK
    echo "provisional artifact exported (csv_441) at $(date)" >> $LOG
fi

# 3. annealed production-path leg: large-batch lr with linear decay, the
#    traced-lr schedule (ppo.scheduled_lr) — zero recompiles vs the cached
#    lanes executable
run_job 9000 runs/relax_anneal.log python -m \
    high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $CFG --num-envs 1024 --load artifacts/irrl_tpu_imitation \
    --lr 1.5e-3 --lr-final 1e-4 --max-iter 400000000 --eval-every 20 \
    --log-dir "$ADIR"
RUN=$(ls -d "$ADIR"/*/ 2>/dev/null | head -1)
if [ -n "$RUN" ] && [ -d "$RUN/csv_final" ]; then
    # 4. checkpoint-selection sweep (the reference's own protocol)
    run_job 7200 runs/ckpt_sweep_anneal.log python scripts/ckpt_sweep.py "$RUN"
    BEST=$(grep "^BEST " runs/ckpt_sweep_anneal.log 2>/dev/null | tail -1 \
           | awk '{print $2}' | tr -d ':')
    if [ -n "$BEST" ] && [ -d "$RUN/$BEST" ]; then
        echo "anneal sweep BEST=$BEST at $(date)" >> $LOG
        run_job 5400 runs/anneal_flagship_eval.log python -m \
            high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
            --model "$RUN/$BEST" --cfg $CFG \
            --eval --steps 2500 --commands 1,2,3,4,5
    else
        echo "anneal sweep produced no BEST at $(date)" >> $LOG
    fi
else
    echo "annealed leg produced no csv_final; sweep skipped at $(date)" >> $LOG
fi

# 5. entropy-kappa at reference scale (resumable via runs/entropy_kappa.json)
run_job 14400 runs/entropy_kappa.log python scripts/entropy_kappa.py \
    4096 500 1,2,3,4,5

# 6. bench markers (prove+cache production configs), then bench x2 for the
#    warm-consistency proof
run_job 5400 runs/bench_ppo_marker.log python scripts/bench_ppo.py 1024 lanes
run_job 5400 runs/bench_ilqr_marker.log python scripts/bench_ilqr_lanes.py \
    64 50 frozen 0
run_job 7200 runs/bench_r3_run1.log python bench.py
run_job 5400 runs/bench_r3_run2.log python bench.py
echo "queue r3c complete $(date)" >> $LOG
