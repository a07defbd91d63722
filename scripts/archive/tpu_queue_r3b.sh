#!/bin/bash
# Round-3 queue, leg B. Chains after the lr-scaled lanes relaxation ckpt
# sweep already in flight (runs/ckpt_sweep_lr15.log): confirm-eval the BEST
# pick at longer horizon -> export the production-path flagship artifact ->
# entropy-kappa at reference scale (VERDICT r2 item 6) -> PPO lanes bench
# marker -> iLQR lanes marker -> bench x2 (warm-consistency proof, item 3).
# All waits bounded, every stage logs rc (ADVICE round 2); run dirs are
# captured per-invocation, never globbed (ADVICE: no stale-glob pickup).
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r3b.log
echo "queue r3b start $(date)" >> $LOG

SWEEP_LOG=runs/ckpt_sweep_lr15.log
LR15_DIR=runs/relax_lanes_lr15/2026-08-19-05-02-24

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

# 1. bounded wait for the in-flight sweep to print its BEST line
WAITED=0
until grep -q "^BEST " $SWEEP_LOG 2>/dev/null; do
    sleep 60; WAITED=$((WAITED + 60))
    if [ $WAITED -ge 7200 ]; then
        echo "sweep never finished (2h); continuing without a pick at $(date)" >> $LOG
        break
    fi
done

# 2. confirm-eval the pick at a longer horizon + export the artifact
BEST=$(grep "^BEST " $SWEEP_LOG 2>/dev/null | awk '{print $2}' | tr -d ':')
if [ -n "$BEST" ] && [ -d "$LR15_DIR/$BEST" ]; then
    echo "sweep BEST=$BEST at $(date)" >> $LOG
    run_job 5400 runs/lanes_flagship_eval.log python -m \
        high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
        --model "$LR15_DIR/$BEST" \
        --cfg "$LR15_DIR/bp5_train.yaml" \
        --eval --steps 2500 --commands 1,2,3,4,5
    rm -rf artifacts/irrl_tpu_relaxed_4e8_lanes
    cp -r "$LR15_DIR/$BEST" artifacts/irrl_tpu_relaxed_4e8_lanes
    cp "$LR15_DIR/bp5_train.yaml" artifacts/irrl_tpu_relaxed_4e8_lanes/ 2>/dev/null
    echo "$BEST" > artifacts/irrl_tpu_relaxed_4e8_lanes/PICK
    echo "artifact exported from $BEST at $(date)" >> $LOG
else
    echo "no BEST pick found; artifact export skipped at $(date)" >> $LOG
fi

# 3. entropy-kappa at reference scale: 4096-episode ensembles, cmd 1-5 x
#    6 latencies x {flagship, flagship_dr, bp5_155} (resumable via
#    runs/entropy_kappa.json)
run_job 14400 runs/entropy_kappa.log python scripts/entropy_kappa.py \
    4096 500 1,2,3,4,5

# 4. bench markers: prove+cache the production PPO lanes config and the
#    lanes iLQR (frozen linearizer, whole-horizon chunk)
run_job 5400 runs/bench_ppo_marker.log python scripts/bench_ppo.py 1024 lanes
run_job 5400 runs/bench_ilqr_marker.log python scripts/bench_ilqr_lanes.py \
    64 50 frozen 0

# 5. full bench twice: the VERDICT item-3 "two consecutive runs agree
#    within 10% on every extra" proof
run_job 7200 runs/bench_r3_run1.log python bench.py
run_job 5400 runs/bench_r3_run2.log python bench.py
echo "queue r3b complete $(date)" >> $LOG
