#!/bin/bash
# Prewarm the persistent XLA compile cache for the production lanes
# training path (round-4 VERDICT item 5: the compile-cache lifecycle made
# explicit). Compiles + runs ONE full PPO update at the production shape
# (1024 lanes envs, BPTT-750) so that every later `cli.train` at that
# shape starts in ~2 min instead of paying the ~25-min lanes cold compile.
# Idempotent: on a warm cache this whole script takes ~3 min.
#
# Usage: scripts/prewarm_lanes.sh [config-yaml]
set -u
cd "$(dirname "$0")/.."
CFG=${1:-high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/bp5_train.yaml}
python -m high_speed_quadrupedal_locomotion_by_irrl_tpu.cli.train \
    --cfg "$CFG" --num-envs 1024 --lanes --max-updates 1 \
    --log-dir runs/prewarm
echo "prewarm rc=$? — .jax_cache is warm for the production lanes shape"
