"""Whole-body iLQR on the per-problem vmap path, FD vs frozen linearizer.

The lanes-batched solver's XLA graph is compile-bound on this toolchain
(chunk-1 frozen at batch 64: >2 h, killed — round-2 queue log, wiped by a
machine reset; finding preserved in commit db56a6f); the vmap
path compiles in minutes. Its round-1 cost profile was dominated by the
49-tangent jacfwd through the full physics per knot — exactly what the
frozen-operator surrogate (mpc/linearize.py) removes. This measures the
vmap x {fd, frozen} x {batch, n_alphas, relin_every} grid to pick the
bench.py extra config.

Usage: python scripts/bench_ilqr_vmap.py [batch] [horizon] [n_iter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def bench(cfg, mpc_cfg, params, probs, label, repeats=3):
    B = probs.x0.shape[0]
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    fn = jax.jit(lambda pr: trot.batched_solve(cfg, mpc_cfg, pb, pr))
    t0 = time.time()
    res = fn(probs)
    jax.block_until_ready(res.cost)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(repeats):
        res = fn(probs)
        jax.block_until_ready(res.cost)
    dt = (time.time() - t0) / repeats
    print(f"{label}: compile {compile_s:.0f}s, run {dt*1e3:.0f} ms, "
          f"{B/dt:.1f} solves/s, mean cost {float(res.cost.mean()):.3f}",
          flush=True)
    return B / dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cfg = config.test_default().replace(obs_noise=0.0)
    params = mdl.nominal_params(cfg)

    cmds = jnp.stack([jnp.array([0.5 + 2.5 * i / B, 0.0, 0.0])
                      for i in range(B)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        horizon))(cmds)

    grid = [
        dict(linearizer="frozen", n_alphas=8, relin_every=1),
        dict(linearizer="frozen", n_alphas=4, relin_every=2),
        dict(linearizer="fd", n_alphas=8, relin_every=1),
    ]
    for g in grid:
        mpc_cfg = trot.MPCConfig(horizon=horizon, n_iter=n_iter,
                                 model_substeps=2, linearize_chunk=1,
                                 **g)
        bench(cfg, mpc_cfg, params, probs,
              f"vmap[{g['linearizer']}] B={B} a={g['n_alphas']} "
              f"re={g['relin_every']}")


if __name__ == "__main__":
    main()
