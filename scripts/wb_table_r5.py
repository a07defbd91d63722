"""Round-5 VERDICT item 1: the verified whole-body RH MPC table.

Measures the FULL cmd 1-5 closed-loop table at the 2500-step protocol —
including the round-4 winner rows (T=0.12 lam=0.42 h=24 at cmd 4/5) that
the monolithic scan could never deliver: the h>=20 x 2500 program
reproducibly crashed the TPU worker (3/3, docs/evidence/wb_push_r4.md).
Runs entirely on runtime.wb_mpc_rollout_chunked (5 x 500-step host-synced
segments, physics bit-identical to the monolithic scan —
tests/test_mpc.py::test_wb_mpc_chunked_matches_monolithic).

Also re-probes the Raibert foothold correction in its round-5
CONTINUOUS Bezier-endpoint form (gait.raibert_weight) at cmd 5 — both the
unmasked and binary-masked forms measured harmful (wb_push_r4.md).

Usage: python scripts/wb_table_r5.py [n_final] [n_probe]
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

CHUNK = 500


def mk_mpc(horizon=16, n_iter=2):
    return trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, cmd, n_steps, raibert=0.0):
    t0 = time.time()
    log = runtime.wb_mpc_rollout_chunked(
        cfg, mc, jnp.array([cmd, 0.0, 0.0]), jax.random.PRNGKey(0),
        n_steps, chunk=CHUNK, raibert_gain=raibert)
    vb = np.asarray(ev.body_velocity(log))
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f} lam={cfg.lam:.2f} "
          f"h={mc.horizon} rg={raibert:.2f} n={n_steps}: v={v:+.2f} "
          f"falls={falls} cost~{cost:.2f} ({time.time()-t0:.0f}s)",
          flush=True)
    return v, falls


def main():
    n_final = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    base = config.test_default().replace(terrain=False, crucial=False)
    win = base.replace(period=0.12, lam=0.42, )
    h_win = 24

    print(f"=== full cmd 1-5 table at {n_final} steps (chunked x{CHUNK}) ===",
          flush=True)
    for cmd in (1.0, 2.0, 3.0, 4.0, 5.0):
        if cmd < 2.5:
            cfg, mc = base.replace(period=0.20, lam=0.5), mk_mpc()
        elif cmd < 3.5:
            cfg, mc = base.replace(period=0.14, lam=0.5), mk_mpc()
        else:
            cfg, mc = win, mk_mpc(h_win)
        run(cfg, mc, cmd, n_final)

    print(f"=== endpoint-Raibert probe at cmd 5 (h{h_win} x {n_probe}) ===",
          flush=True)
    for rg in (0.03, 0.06):
        run(win, mk_mpc(h_win), 5.0, n_probe, rg)


if __name__ == "__main__":
    main()
