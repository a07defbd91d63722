#!/bin/bash
# Session-3 TPU queue #7: one clean bench.py at the new 8192 headline batch.
cd /root/repo
LOG=runs/tpu_queue.log
echo "queue s9 start at $(date)" >> $LOG
probe() {
    timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" > /dev/null 2>&1
}
until probe; do echo "tpu unhealthy at $(date); sleeping 300s" >> $LOG; sleep 300; done
echo "start: bench.py (8192 headline) at $(date)" >> $LOG
timeout 3600 python bench.py >> runs/bench_final2.log 2>&1
echo "bench.py done rc=$? at $(date)" >> $LOG
echo "queue s9 complete at $(date)" >> $LOG
