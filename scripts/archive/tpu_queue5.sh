#!/bin/bash
# Round-2 TPU queue #5: whole-body receding-horizon MPC eval after queue #4.
cd /root/repo
PREV_PID=${1:?queue4 pid}
while kill -0 $PREV_PID 2>/dev/null; do sleep 60; done
echo "queue4 done at $(date)"
sleep 10
timeout 7200 python scripts/wb_mpc_eval.py > runs/wb_mpc_eval.log 2>&1
echo "wb_mpc_eval done rc=$? at $(date)"
