#!/bin/bash
# Round-3 TPU queue. Chains after the 2e8-step terrain imitation leg that is
# already in flight (runs/terrain_imit/<stamp>, launched directly): terrain
# tracking eval -> production-path (1024-env lanes) 4e8 relaxation leg ->
# checkpoint-selection sweep -> PPO bench marker -> full bench -> entropy-
# kappa at reference scale -> second bench (consistency proof).
# All waits are bounded; every stage logs its rc (ADVICE round 2).
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue_r3.log
echo "queue r3 start $(date)" >> $LOG

TDIR=${1:?usage: tpu_queue_r3.sh <terrain_run_dir>}

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

# 1. bounded wait for the terrain leg (its own timeout is 10800 s)
WAITED=0
until [ -d "$TDIR/csv_final" ]; do
    sleep 60; WAITED=$((WAITED + 60))
    if [ $WAITED -ge 11400 ]; then
        echo "terrain leg never produced csv_final; continuing at $(date)" >> $LOG
        break
    fi
done

# 2. terrain tracking eval (on the terrain the policy was trained on)
CFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_imitation_terrain.yaml
if [ -d "$TDIR/csv_final" ]; then
    run_job 5400 runs/terrain_eval.log python -m \
        high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
        --model "$TDIR/csv_final" --cfg $CFG --eval --steps 1500 --commands 1,2,3
else
    echo "terrain eval skipped: no csv_final at $(date)" >> $LOG
fi

# 3. production-path relaxation: the reference 4e8-step budget at 1024
#    envs on lanes (~114k steps/s) with the full DR protocol, warm-started
#    from the imitation artifact — VERDICT round-2 item 5
RDIR=runs/relax_lanes_$(date +%s)
run_job 12000 runs/relax_lanes.log python -m \
    high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_train.yaml \
    --num-envs 1024 --load artifacts/irrl_tpu_imitation --lr 5e-4 \
    --max-iter 400000000 --eval-every 20 --log-dir "$RDIR"

# 4. checkpoint-selection sweep on that run (the bp5_155 selection protocol)
RUN=$(ls -dt "$RDIR"/*/ 2>/dev/null | head -1)
if [ -n "$RUN" ] && [ -d "$RUN/csv_final" ]; then
    run_job 9000 runs/ckpt_sweep_lanes.log python scripts/ckpt_sweep.py "$RUN" 1200
else
    echo "ckpt sweep skipped: no completed relax run at $(date)" >> $LOG
fi

# 5. PPO bench marker + cache (so the driver's official bench includes the
#    PPO extra without a 28-min cold compile)
run_job 5400 runs/bench_ppo.log python scripts/bench_ppo.py 1024 lanes 3

# 6. full bench, twice: the timing guards' consistency requirement is that
#    two consecutive runs agree (VERDICT round-2 item 3)
run_job 5400 runs/bench1.log python bench.py
# 7. entropy-kappa at reference scale: 4096-episode ensembles, cmd 1-5 x
#    latency 0-10 ms, all three controllers (resumable)
run_job 14400 runs/entropy_kappa.log python scripts/entropy_kappa.py 4096 500 1,2,3,4,5
run_job 5400 runs/bench2.log python bench.py
echo "queue r3 complete at $(date)" >> $LOG
