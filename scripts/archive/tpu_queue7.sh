#!/bin/bash
# Round-2 TPU queue #7: PPO throughput scaling point at 2048 envs (lanes),
# then refresh the 1024-env number (writes the .ppo_lanes_ok bench marker).
cd /root/repo
PREV_PID=${1:?queue6 pid}
while kill -0 $PREV_PID 2>/dev/null; do sleep 60; done
echo "queue6 done at $(date)" >> runs/tpu_queue.log
sleep 10
timeout 5400 python scripts/bench_ppo.py 2048 lanes >> runs/bench_ppo_big.log 2>&1
echo "bench_ppo 2048 lanes done rc=$? at $(date)" >> runs/tpu_queue.log
sleep 5
timeout 3600 python scripts/bench_ppo.py 1024 lanes >> runs/bench_ppo_big.log 2>&1
echo "bench_ppo 1024 lanes (marker) done rc=$? at $(date)" >> runs/tpu_queue.log
