#!/bin/bash
# Re-prove the lanes-iLQR marker (.ilqr_lanes_ok) and warm the persistent
# compile cache for bench.py's ilqr_lanes extra.
#
# Round-4 context: the chunk-0 prove job (runs/r4_bench_ilqr_marker.log) died
# 38 min into the AOT compile with `tpu_compile_helper subprocess exit signal
# SIGKILL` — a remote compile-helper kill (likely its host OOM/limits), not a
# graph error; the identical config compiled and ran in round 3. This script
# walks a chunk ladder (0 = whole horizon in one wide call, then smaller
# linearize blocks → smaller compile units) until one compiles+runs;
# scripts/bench_ilqr_lanes.py records the proven chunk inside the marker so
# bench.py replays exactly the cached graph.
set -u
cd "$(dirname "$0")/.."
for c in 0 10 1; do
    echo "=== prove ilqr lanes chunk=$c $(date) ==="
    if timeout 3300 env SKIP_VMAP=1 \
        python scripts/bench_ilqr_lanes.py 64 50 frozen "$c"; then
        echo "=== proven chunk=$c $(date) ==="
        exit 0
    fi
    echo "=== chunk=$c failed rc=$? $(date) ==="
done
echo "=== all chunks failed $(date) ==="
exit 1
