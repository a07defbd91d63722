#!/bin/bash
# Round-2 TPU queue #4: hard-contact fidelity eval after the MPC sweep.
cd /root/repo
PREV_PID=${1:?queue3 pid}
while kill -0 $PREV_PID 2>/dev/null; do sleep 60; done
echo "queue3 done at $(date)"
sleep 10
timeout 3600 python scripts/hard_contact_eval.py > runs/hard_contact_eval.log 2>&1
echo "hard_contact_eval done rc=$? at $(date)"
