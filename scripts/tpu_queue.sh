#!/bin/bash
# Parameterized TPU job queue — THE queue runner (replaces the 33 round 1-3
# tpu_queue_*.sh one-offs, preserved under scripts/archive/ because their
# logs are cited by docs).
#
# Usage:
#   scripts/tpu_queue.sh <jobfile> [wait_pid]
#
# jobfile: one job per line, '#' comments and blank lines skipped:
#   <timeout_s> <logfile> <cmd ...>
#
# Semantics (same as the old runners, now in one place):
#   - optionally waits for [wait_pid] to exit first (chain queues),
#   - serializes on an exclusive flock of .tpu_queue.lock so two queues
#     never share the single chip,
#   - health-probes the TPU before every job (a tiny matmul under timeout;
#     retries every 300 s while the tunnel is down),
#   - runs each job under `timeout` (never pkill-by-pattern), tees stdout+
#     stderr to <logfile>, appends start/rc lines to runs/tpu_queue.log.
set -u
cd "$(dirname "$0")/.."
JOBFILE=${1:?usage: tpu_queue.sh <jobfile> [wait_pid]}
WAIT_PID=${2:-}
LOG=runs/tpu_queue.log
mkdir -p runs

if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "queue[$JOBFILE]: pid $WAIT_PID done at $(date)" >> $LOG
fi

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" > /dev/null 2>&1
}

wait_healthy() {
    until probe; do
        echo "queue[$JOBFILE]: tpu unhealthy at $(date); sleeping 300s" >> $LOG
        sleep 300
    done
}

exec 9>.tpu_queue.lock
while IFS= read -r line || [ -n "$line" ]; do
    case "$line" in ''|\#*) continue ;; esac
    set -- $line
    t=$1 joblog=$2; shift 2
    mkdir -p "$(dirname "$joblog")"
    flock 9
    wait_healthy
    echo "queue[$JOBFILE]: start $* at $(date)" >> $LOG
    timeout "$t" "$@" > "$joblog" 2>&1
    echo "queue[$JOBFILE]: $* rc=$? at $(date)" >> $LOG
    flock -u 9
    sleep 10
done < "$JOBFILE"
echo "queue[$JOBFILE]: complete at $(date)" >> $LOG
