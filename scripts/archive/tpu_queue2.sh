#!/bin/bash
# Round-2 TPU work queue #2: waits for the protocol-exact WILDCAT+DR rerun
# to finish, then runs checkpoint selection, the lanes iLQR bench (which
# queue #1 never got to — the trainer took the TPU), and a bench.py check.
cd /root/repo
TRAINER_PID=${1:?trainer pid}
RUN_DIR=${2:-runs/2026-08-17-06-22-14}
echo "waiting for trainer pid $TRAINER_PID..."
while kill -0 $TRAINER_PID 2>/dev/null; do sleep 60; done
echo "trainer done at $(date)"
sleep 10
timeout 3600 python scripts/ckpt_sweep.py $RUN_DIR > runs/ckpt_sweep_wildcat.log 2>&1
echo "ckpt_sweep done rc=$? at $(date)"
LIN_CHUNK=10 timeout 3600 python scripts/bench_ilqr_lanes.py 64 50 > runs/ilqr_lanes.log 2>&1
echo "ilqr bench done rc=$? at $(date)"
# large-batch PPO throughput (VERDICT item 2): lanes vs vmap past the
# 8x128-tile knee. 3 updates each keeps total chip time bounded.
for spec in "1024 lanes" "1024 vmap" "4096 lanes" "4096 vmap"; do
  set -- $spec
  timeout 5400 python scripts/bench_ppo.py $1 $2 3 >> runs/bench_ppo_big.log 2>&1
  echo "bench_ppo $spec done rc=$? at $(date)"
done
timeout 3600 python bench.py > runs/bench_check.json 2> runs/bench_check.log
echo "bench check done rc=$? at $(date)"
