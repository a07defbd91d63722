#!/bin/bash
# Chunked slow-suite runner: one pytest process per test FILE.
#
# Why: the XLA CPU compiler in this image segfaults intermittently when one
# long-lived process compiles many of the huge receding-horizon MPC graphs
# back to back (observed twice at different tests — once in the
# persistent-cache serializer, once inside backend_compile_and_load after
# ~53 green tests). Per-file processes bound the blast radius: a crash
# fails ONE file visibly instead of killing the whole run, and each file
# can be re-run alone.
#
# Usage: bash scripts/run_slow_suite.sh [logfile]
#
# The default log lands in docs/evidence/ (committed), not runs/
# (gitignored): round 3 lost a full green slow-suite log to a machine
# reset because it lived only in runs/. Evidence logs must survive.
cd "$(dirname "$0")/.."
LOG=${1:-docs/evidence/pytest_slow_latest.log}
: > "$LOG"
overall=0
run_chunk() {   # run_chunk <label> <pytest args...>
    local label=$1; shift
    echo "=== $label start $(date) ===" >> "$LOG"
    python -m pytest "$@" -m slow -q -p no:cacheprovider >> "$LOG" 2>&1
    local rc=$?
    [ $rc -eq 5 ] && rc=0    # rc 5 = no slow tests selected
    echo "=== $label rc=$rc $(date) ===" >> "$LOG"
    [ $rc -ne 0 ] && overall=1
}
for f in tests/test_*.py; do
    if [ "$f" = "tests/test_mpc.py" ]; then
        # test_mpc accumulated enough huge RH-MPC graphs that ONE process
        # compiling all of them now hits the intermittent XLA CPU
        # compiler segfault inside the file itself (round 5: rc=139 after
        # 12 green tests). Split the receding-horizon/wb group into its
        # own process to bound the per-process compile load.
        run_chunk "$f[non-wb]" "$f" -k "not wb_mpc"
        run_chunk "$f[wb]" "$f" -k "wb_mpc"
    else
        run_chunk "$f" "$f"
    fi
done
echo "SLOW SUITE OVERALL rc=$overall" >> "$LOG"
exit $overall
