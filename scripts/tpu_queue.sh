#!/bin/bash
# Round-2 TPU work queue: waits for the training run to finish, then runs
# the evaluation/calibration/bench sequence. Logs under runs/.
cd /root/repo
TRAINER_PID=${1:-4209}
RUN_DIR=${2:-runs/2026-08-17-02-03-42}
echo "waiting for trainer pid $TRAINER_PID..."
while kill -0 $TRAINER_PID 2>/dev/null; do sleep 60; done
echo "trainer done at $(date)"
sleep 10
timeout 1800 python scripts/eval_round2.py $RUN_DIR csv_final > runs/eval_final.log 2>&1
echo "eval_final done rc=$? at $(date)"
timeout 2400 python scripts/calibrate_contact.py > runs/calibrate.log 2>&1
echo "calibrate done rc=$? at $(date)"
LIN_CHUNK=10 timeout 3600 python scripts/bench_ilqr_lanes.py 64 50 > runs/ilqr_lanes.log 2>&1
echo "ilqr bench done rc=$? at $(date)"
