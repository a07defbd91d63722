#!/bin/bash
# Session-5 TPU queue #17 — chains after s16 (cache re-warm + bench). The
# remains of the never-run s14/s15 queues, in value order and cut to fit
# opportunistic machine time: (1) wb_sched_eval revalidates the PARITY
# whole-body speed-schedule table on the post-terminal-knot-fix graph;
# (2) rough-terrain PPO throughput on the sampled 500x20 m heightmap
# (the workload the reference's flat-ground OpenMP fan-out never had a
# fast path for); (3) a reduced-budget terrain imitation demo (30M steps,
# ~25 min at lanes throughput) + tracking eval on the result.
cd /root/repo
mkdir -p runs
LOG=runs/tpu_queue.log
echo "queue s17 waiting for s16 at $(date)" >> $LOG
# bounded wait (ADVICE round 2): if s16 died without its completion line
# (e.g. machine reset), give up after 4 h and say so instead of spinning
WAITED=0
until grep -q "queue s16 complete" $LOG; do
    sleep 60; WAITED=$((WAITED + 60))
    if [ $WAITED -ge 14400 ]; then
        echo "s16 never completed after 4h; s17 proceeding anyway at $(date)" >> $LOG
        break
    fi
done
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
run_job 5400 runs/wb_sched.log python scripts/wb_sched_eval.py 1500
run_job 5400 runs/ppo_terrain.log python scripts/bench_ppo.py 1024 lanes 5 terrain
CFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_imitation_terrain.yaml
# unique per-invocation log dir (ADVICE round 2): a rerun must never eval a
# stale csv_final from an earlier run; 5400 s timeout leaves cold-compile
# headroom (the ~25 min estimate assumed a warm lanes+terrain graph)
TDIR=runs/terrain_imit_$(date +%s)
run_job 5400 runs/terrain_train.log python -m \
    high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $CFG --num-envs 1024 --max-iter 30000000 \
    --log-dir $TDIR --eval-every 100
MODEL=$(ls -dt $TDIR/*/csv_final 2>/dev/null | head -1)
if [ -n "$MODEL" ]; then
    run_job 3600 runs/terrain_eval.log python -m \
        high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
        --model "$MODEL" --cfg $CFG --eval --steps 1500 --commands 1,2,3
else
    echo "terrain train produced no csv_final (timed out/failed); eval skipped at $(date)" >> $LOG
fi
echo "queue s17 complete at $(date)" >> $LOG
