#!/bin/bash
# Round-5 terrain leg: the ENTROPY-FLOORED relaxation continuation.
#
# Diagnosis (docs/evidence/terrain_leg2_r4.md): both round-4 legs collapse
# exactly where policy entropy crosses ~5.2 nats — leg 1 peaks at csv_161
# (entropy 5.22) and degrades below; leg 2 warm-starts AT the cliff (5.21)
# and decays monotonically (falls 0 -> 11) while training-side metrics stay
# healthy. This leg repeats leg 2 with one change: --entropy-floor 5.2
# (algo/ppo.PPOConfig.entropy_floor — logstd projected up after every
# update), so exploration can never shrink past the measured cliff.
# Everything else identical to leg 2 => the floor is the only variable.
set -u
cd "$(dirname "$0")/.."
RCFG=high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_relax_terrain.yaml
DIR=runs/terrain_relax3_$(date +%s)

python -m high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg $RCFG --num-envs 1024 --lanes \
    --load artifacts/irrl_tpu_terrain_relaxed \
    --lr 1e-4 --lr-final 2e-5 --max-iter 150000000 --eval-every 20 \
    --entropy-floor 5.2 \
    --log-dir "$DIR"
echo "terrain relax leg-3 train rc=$?"
RUN=$(ls -dt "$DIR"/*/ 2>/dev/null | head -1)
if [ -z "$RUN" ] || [ ! -d "$RUN/csv_final" ]; then
    echo "terrain leg-3: no completed run under $DIR"; exit 1
fi
echo "terrain leg-3 run: $RUN"
SWEEPLOG=runs/ckpt_sweep_terrain3_r5.log
python scripts/ckpt_sweep.py "$RUN" 1200 2>&1 | tee "$SWEEPLOG"
BEST=$(grep "^BEST " "$SWEEPLOG" | tail -1 | awk '{print $2}' | tr -d ':')
MODEL="$RUN/csv_final"
if [ -n "${BEST:-}" ] && [ -d "$RUN/$BEST" ]; then MODEL="$RUN/$BEST"; fi
echo "terrain leg-3 ensemble model: $MODEL"
python scripts/terrain_eval_seeds.py "$MODEL" 1500 8 1,2,3,4
