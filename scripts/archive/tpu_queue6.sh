#!/bin/bash
# Round-2 TPU queue #6: retry the lanes iLQR at the smallest block graph
# (chunk=1) after queue #5; success writes the bench marker + warms cache.
cd /root/repo
PREV_PID=${1:?queue5 pid}
while kill -0 $PREV_PID 2>/dev/null; do sleep 60; done
echo "queue5 done at $(date)"
sleep 10
LIN_CHUNK=1 SKIP_VMAP=1 timeout 2400 python scripts/bench_ilqr_lanes.py 64 50 > runs/ilqr_lanes_c1.log 2>&1
echo "ilqr chunk1 bench done rc=$? at $(date)"
# re-validate the exact driver bench path with whatever marker state resulted
timeout 3600 python bench.py > runs/bench_check2.json 2> runs/bench_check2.log
echo "bench check2 done rc=$? at $(date)"
