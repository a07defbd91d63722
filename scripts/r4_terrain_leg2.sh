#!/bin/bash
# Round-4 terrain continuation leg: +1.5e8 relaxation steps warm-started
# from the leg-1 pick (artifacts/irrl_tpu_terrain_relaxed = csv_161), lr
# continued where leg 1's anneal ended (1e-4 -> 2e-5). Leg 1's training
# reward was still rising at cut-off (reward_per_step 0.37 -> 0.44,
# docs/evidence/terrain_relax_r4.md) — this leg buys the un-saturated tail.
# The PPO graph is identical to leg 1 => persistent-cache hit, ~2 min
# compile. Ends with the on-terrain checkpoint sweep + K=8 seed ensemble.
set -u
cd "$(dirname "$0")/.."
RCFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_relax_terrain.yaml
DIR=runs/terrain_relax2_$(date +%s)

python -m high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $RCFG --num-envs 1024 --lanes \
    --load artifacts/irrl_tpu_terrain_relaxed \
    --lr 1e-4 --lr-final 2e-5 --max-iter 150000000 --eval-every 20 \
    --log-dir "$DIR"
echo "terrain relax leg-2 train rc=$?"
RUN=$(ls -dt "$DIR"/*/ 2>/dev/null | head -1)
if [ -z "$RUN" ] || [ ! -d "$RUN/csv_final" ]; then
    echo "terrain leg-2: no completed run under $DIR"; exit 1
fi
echo "terrain leg-2 run: $RUN"
SWEEPLOG=runs/ckpt_sweep_terrain2_r4.log
python scripts/ckpt_sweep.py "$RUN" 1200 2>&1 | tee "$SWEEPLOG"
BEST=$(grep "^BEST " "$SWEEPLOG" | tail -1 | awk '{print $2}' | tr -d ':')
MODEL="$RUN/csv_final"
if [ -n "${BEST:-}" ] && [ -d "$RUN/$BEST" ]; then MODEL="$RUN/$BEST"; fi
echo "terrain leg-2 ensemble model: $MODEL"
python scripts/terrain_eval_seeds.py "$MODEL" 1500 8 1,2,3,4
