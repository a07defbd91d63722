#!/bin/bash
# Round-4 terrain quality leg (VERDICT item 3): relaxation training ON the
# sampled fractal heightmap, warm-started from the 2e8-step terrain
# imitation artifact, then checkpoint sweep + on-terrain tracking eval.
# Run as ONE tpu_queue.sh job (it needs shell substitution for the run dir).
set -u
cd "$(dirname "$0")/.."
RCFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_relax_terrain.yaml
ECFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_imitation_terrain.yaml
DIR=runs/terrain_relax_$(date +%s)

python -m high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $RCFG --num-envs 1024 --lanes \
    --load artifacts/irrl_tpu_terrain_imitation \
    --lr 5e-4 --lr-final 1e-4 --max-iter 150000000 --eval-every 20 \
    --log-dir "$DIR"
rc=$?
echo "terrain relax train rc=$rc"
RUN=$(ls -dt "$DIR"/*/ 2>/dev/null | head -1)
if [ -z "$RUN" ] || [ ! -d "$RUN/csv_final" ]; then
    echo "terrain relax: no completed run under $DIR"; exit 1
fi
echo "terrain relax run: $RUN"
SWEEPLOG=runs/ckpt_sweep_terrain_r4.log
python scripts/ckpt_sweep.py "$RUN" 1200 2>&1 | tee "$SWEEPLOG"
BEST=$(grep "^BEST " "$SWEEPLOG" | tail -1 | awk '{print $2}' | tr -d ':')
MODEL="$RUN/csv_final"
if [ -n "${BEST:-}" ] && [ -d "$RUN/$BEST" ]; then MODEL="$RUN/$BEST"; fi
echo "terrain eval model: $MODEL"
python -m high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.test \
    --model "$MODEL" --cfg $ECFG --eval --steps 1500 --commands 1,2,3,4
