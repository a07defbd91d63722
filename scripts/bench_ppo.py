"""PPO training throughput: vmap vs batch-in-lanes physics, per batch size.

The round-1 finding (42.5k steps/s at 200 envs on the vmap path) and the
round-2 one (the lanes path is *slower* at 200 envs — (200,)-wide lane
vectors pad the 8x128 vector tile to ~20% utilization — but pulls ahead
once the batch fills the lanes) are both measured here.

Usage: python scripts/bench_ppo.py [num_envs] [lanes|vmap] [n_updates] [terrain]

The optional 4th arg turns on the sampled 500x20 m fractal heightmap
(phys/terrain.SampledTerrain) — measures rough-terrain training throughput,
the workload the reference's flat-ground-only OpenMP fan-out never had a
fast path for (Environment.hpp:252-269 terrain exists but at 1x CPU speed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    mode = sys.argv[2] if len(sys.argv) > 2 else "lanes"
    n_updates = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    terrain = len(sys.argv) > 4 and sys.argv[4] == "terrain"

    env_cfg = config.train_default().replace(
        num_envs=num_envs, use_lanes_physics=(mode == "lanes"),
        terrain=terrain)
    if terrain:
        mode = mode + "+terrain"
    ppo_cfg = ppo.PPOConfig(n_steps=env_cfg.episode_len)
    batch = num_envs * ppo_cfg.n_steps

    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    t0 = time.time()
    ts, m = update(ts)
    jax.block_until_ready(m["loss"])
    print(f"{mode} envs={num_envs}: compile+first {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    for _ in range(n_updates):
        ts, m = update(ts)
        # block EVERY update: blocking only on the last loss has produced
        # physically impossible rates on a warm cache (509M steps/s observed
        # round 4, 289M round 2) — the same async-dispatch anomaly bench.py's
        # plausibility ceilings exist for. The official number is bench.py's
        # guarded measurement; this print is operator feedback only.
        jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / n_updates
    print(f"{mode} envs={num_envs}: {batch/dt:.0f} env-steps/s "
          f"({dt*1e3:.0f} ms/update, batch {batch})", flush=True)
    if (num_envs, mode) == (1024, "lanes"):
        # exact config bench.py's ppo extra uses: mark the compile cache warm
        open(os.path.join(os.path.dirname(__file__), "..", ".ppo_lanes_ok"),
             "w").write(f"{batch/dt:.0f}\n")


if __name__ == "__main__":
    main()
