#!/bin/bash
# Round-2 TPU queue #3: after queue #2 drains, run the cmd-4/5 MPC sweep.
cd /root/repo
PREV_PID=${1:?queue2 pid}
while kill -0 $PREV_PID 2>/dev/null; do sleep 60; done
echo "queue2 done at $(date)"
sleep 10
timeout 7200 python scripts/mpc45.py > runs/mpc45.log 2>&1
echo "mpc45 done rc=$? at $(date)"
