"""Finish the round-4 wb-RH push (VERDICT item 6) after the TPU crash.

scripts/wb_push45.py got through stages A+B and cmd 1-3 of stage C before
the TPU worker crashed (runs/r4_wb_push45.log, 14:33 UTC Aug 20):
  stage B winner: T=0.12 lam=0.42 rg=0 h=24 -> v=4.90 falls=0 (1200 steps)
  stage C (2500 steps): cmd 1/2/3 = 0.93/1.86/2.88 zero falls (unchanged
  low/mid-speed schedule).
This script measures the missing stage-C rows. CRASH FINDING: the
h24 x 2500-step rollout program CRASHES THE TPU WORKER reproducibly
("TPU worker process crashed or restarted ... kernel fault" — twice:
stage C cmd 4 at 14:33 and the first finish attempt at 14:54), while
h24 x 1200 and h16 x 2500 run clean. So the KNOWN-GOOD shapes run first
(winner rows + swing-masked Raibert probes at h24 x n_probe), and the
h20 x 2500 attempt goes LAST where a crash cannot eat the safe rows.

Usage: python scripts/wb_finish45.py [n_final] [n_probe]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime, trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def mk_mpc(horizon=24, n_iter=2):
    return trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, cmd, n_steps, raibert=0.0):
    t0 = time.time()
    log = runtime.wb_mpc_rollout(cfg, mc, jnp.array([cmd, 0.0, 0.0]),
                                 jax.random.PRNGKey(0), n_steps,
                                 raibert_gain=raibert)
    vb = ev.body_velocity(log)
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f} lam={cfg.lam:.2f} "
          f"h={mc.horizon} rg={raibert:.2f}: v={v:+.2f} falls={falls} "
          f"cost~{cost:.2f} ({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_final = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    base = config.test_default().replace(terrain=False, crucial=False)
    win = base.replace(period=0.12, lam=0.42)

    print(f"=== winner rows at the crash-safe shape (h24 x {n_probe}) ===",
          flush=True)
    for cmd in (4.0, 5.0):
        run(win, mk_mpc(24), cmd, n_probe)

    print(f"=== swing-masked Raibert probe at cmd 5 (h24 x {n_probe}) ===",
          flush=True)
    for rg in (0.03, 0.06):
        run(win, mk_mpc(24), 5.0, n_probe, raibert=rg)

    print(f"=== LAST (may crash the worker): cmd 4/5 at h20 x {n_final} ===",
          flush=True)
    for cmd in (4.0, 5.0):
        run(win, mk_mpc(20), cmd, n_final)


if __name__ == "__main__":
    main()
