#!/bin/bash
# Session-4 TPU queue #15: rough-terrain training demonstration — chains
# after s14 (waits for its completion line in the shared log). Trains the
# full 2e8-step imitation budget on the sampled 500x20 m fractal heightmap
# (configs/bp5_imitation_terrain.yaml) at lanes throughput, then runs the
# terrain tracking eval on the resulting controller. The reference could
# never do this run fast: its terrain heightmap exists at 1x CPU speed
# (Environment.hpp:252-269) and its training fan-out is 200 envs x OpenMP.
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue.log
echo "queue s15 waiting for s14 at $(date)" >> $LOG
until grep -q "queue s14 complete" $LOG; do sleep 120; done
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
CFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_imitation_terrain.yaml
run_job 10800 runs/terrain_train.log python -m \
    high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $CFG --num-envs 1024 --max-iter 200000000 \
    --log-dir runs/terrain_imit --eval-every 100
MODEL=$(ls -dt runs/terrain_imit/*/csv_final 2>/dev/null | head -1)
if [ -n "$MODEL" ]; then
    run_job 3600 runs/terrain_eval.log python -m \
        high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
        --model "$MODEL" --cfg $CFG --eval --steps 1500 --commands 1,2,3
fi
echo "queue s15 complete at $(date)" >> $LOG
