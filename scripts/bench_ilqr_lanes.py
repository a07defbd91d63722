"""Whole-body iLQR throughput: per-problem vmap path vs lanes-batched path.

Usage: python scripts/bench_ilqr_lanes.py [batch] [horizon] [fd|frozen] [chunk]

chunk = horizon knots linearized per scan block (LIN_CHUNK env overrides;
0 = the whole horizon in ONE wide call — feasible for the frozen
linearizer's few-hundred-op graph, compile-infeasible for FD through the
full lanes physics).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def bench(fn, probs, label):
    t0 = time.time()
    res = fn(probs)
    jax.block_until_ready(res.cost)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 3
    for _ in range(n):
        res = fn(probs)
        jax.block_until_ready(res.cost)
    dt = (time.time() - t0) / n
    B = res.cost.shape[0]
    print(f"{label}: compile {compile_s:.0f}s, run {dt*1e3:.0f} ms, "
          f"{B/dt:.1f} solves/s, mean cost {float(res.cost.mean()):.3f}",
          flush=True)
    return B / dt, float(res.cost.mean())


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    linearizer = sys.argv[3] if len(sys.argv) > 3 else "fd"
    chunk = int(os.environ.get("LIN_CHUNK",
                               sys.argv[4] if len(sys.argv) > 4 else "1"))
    cfg = config.test_default().replace(obs_noise=0.0)
    params = mdl.nominal_params(cfg)
    mpc_cfg = trot.MPCConfig(horizon=horizon, n_iter=8, model_substeps=2,
                             linearize_chunk=chunk,
                             n_alphas=int(os.environ.get("N_ALPHAS", "8")),
                             linearizer=linearizer)

    cmds = jnp.stack([jnp.array([0.5 + 2.5 * i / B, 0.0, 0.0])
                      for i in range(B)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        horizon))(cmds)

    lanes_fn = jax.jit(lambda pr: trot.solve_batch_lanes(cfg, mpc_cfg, params, pr))
    s_lanes, c_lanes = bench(lanes_fn, probs,
                             f"lanes[{linearizer}] B={B} chunk={chunk}")
    if (B, horizon, mpc_cfg.n_iter, mpc_cfg.n_alphas,
            linearizer) == (64, 50, 8, 8, "frozen"):
        # a config bench.py's lanes extra can use: record WHICH chunk proved
        # compilable so bench.py replays exactly this cached graph
        open(os.path.join(os.path.dirname(__file__), "..", ".ilqr_lanes_ok"),
             "w").write(f"{chunk}\n")

    if os.environ.get("SKIP_VMAP") != "1":
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
        vmap_fn = jax.jit(lambda pr: trot.batched_solve(cfg, mpc_cfg, pb, pr))
        s_vmap, c_vmap = bench(vmap_fn, probs, f"vmap B={B}")
        print(f"speedup: {s_lanes/s_vmap:.2f}x; cost ratio "
              f"{c_lanes/max(c_vmap,1e-9):.4f}")


if __name__ == "__main__":
    main()
