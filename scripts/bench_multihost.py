"""Multi-host scaling-efficiency harness (BASELINE.json north star: >=80%
scaling efficiency to >=2 hosts).

Runs the sharded PPO update (parallel/train.make_distributed_update) and the
sharded SRB trot-MPC batch (make_distributed_srb) over the global device
mesh, plus the identical per-device workload on ONE local device, and prints
weak-scaling efficiency = global_rate / (n_devices * single_device_rate).

No multi-host TPU hardware exists on this box (VERDICT round 2: the number
is hardware-gated); the harness is verified end to end in a 2-process
localhost CPU rig (the same mechanism as tests/test_distributed.py) so the
efficiency measurement is one command away the day hardware appears:

  CPU rig (2 processes x 2 virtual devices):
      python scripts/bench_multihost.py --rig 2
  real multi-host (run on every host, e.g. via gcloud ... --worker=all):
      python scripts/bench_multihost.py --coordinator host0:8476 \
          --num-processes 2 --process-id $WORKER_ID \
          --num-envs 2048 --srb-batch 8192

Process 0 prints one JSON line with rates + efficiency.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rig", type=int, default=0,
                   help="spawn N localhost CPU worker processes (self-test "
                        "rig; 2 virtual devices each) and report process 0")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--num-envs", type=int, default=None,
                   help="global PPO env batch (default 16/device on CPU rig, "
                        "1024/device otherwise)")
    p.add_argument("--srb-batch", type=int, default=None,
                   help="global SRB scenario batch (default 64/device on CPU "
                        "rig, 8192/device otherwise)")
    p.add_argument("--n-steps", type=int, default=None,
                   help="PPO rollout length (default 25 rig / 750 hw)")
    p.add_argument("--repeats", type=int, default=2)
    return p.parse_args(argv)


def run_rig(n_procs: int, extra_args=()):
    """Localhost CPU rig: N worker processes x 2 virtual devices.
    ``extra_args``: shape flags (--num-envs/--srb-batch/--n-steps)
    forwarded verbatim to every worker."""
    import socket

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    # PYTHONPATH = repo only: strips the axon TPU plugin's sitecustomize so
    # JAX_PLATFORMS=cpu sticks in the workers (tests/test_distributed.py)
    env = {**os.environ, "PYTHONPATH": REPO,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--coordinator", f"localhost:{port}",
         "--num-processes", str(n_procs), "--process-id", str(i),
         *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO) for i in range(n_procs)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=5400)
        if p.returncode != 0:
            print(err[-4000:], file=sys.stderr)
            raise SystemExit(f"rig worker {i} failed rc={p.returncode}")
        outs.append(out)
    print(outs[0].strip().splitlines()[-1])


def worker(args):
    sys.path.insert(0, REPO)
    # distributed bring-up MUST precede any backend/jnp use (incl. package
    # import, which builds jnp model tables) — load mesh.py standalone
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pmesh_boot", os.path.join(
            REPO, "high_speed_quadrupedal_locomotion_by_irrl_tpu",
            "parallel", "mesh.py"))
    pmesh_boot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pmesh_boot)
    pmesh_boot.init_distributed(args.coordinator, args.num_processes,
                                args.process_id)

    import jax
    import jax.numpy as jnp

    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.parallel import (
        mesh as pmesh,
        train as ptrain,
    )

    n_dev = jax.device_count()
    on_cpu = jax.devices()[0].platform == "cpu"
    num_envs = args.num_envs or (16 * n_dev if on_cpu else 1024 * n_dev)
    srb_batch = args.srb_batch or (64 * n_dev if on_cpu else 8192 * n_dev)
    n_steps = args.n_steps or (25 if on_cpu else 750)

    def timed(fn, units):
        out = fn()
        jax.block_until_ready(out)          # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn()
        jax.block_until_ready(out)
        return units * args.repeats / (time.perf_counter() - t0)

    results = {"devices": n_dev, "processes": jax.process_count(),
               "platform": jax.devices()[0].platform,
               "num_envs": num_envs, "srb_batch": srb_batch}

    # ---- global-mesh PPO update ------------------------------------------
    env_cfg = config.train_default().replace(num_envs=num_envs)
    ppo_cfg = ppo.PPOConfig(n_steps=n_steps)
    mesh = pmesh.make_mesh()
    update = ptrain.make_distributed_update(env_cfg, ppo_cfg, mesh)
    ts = ptrain.shard_train_state(
        mesh, ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0)))
    holder = {"ts": ts}

    def ppo_once():
        holder["ts"], m = update(holder["ts"])
        return m["loss"]

    results["ppo_steps_per_s_global"] = timed(ppo_once, num_envs * n_steps)

    # ---- global-mesh SRB batch -------------------------------------------
    scfg = srb.SRBConfig(horizon=16)
    cmds = jnp.stack([jnp.array([1.0 + 4.0 * (i % 17) / 16.0, 0.0, 0.0])
                      for i in range(srb_batch)])
    t0s = jnp.arange(srb_batch) * 0.003
    probs = jax.device_put(
        jax.vmap(lambda c, t: srb.standing_problem(env_cfg, c, t))(cmds, t0s),
        pmesh.data_sharding(mesh))
    solve = ptrain.make_distributed_srb(env_cfg, scfg, mesh)
    results["srb_solves_per_s_global"] = timed(
        lambda: solve(probs).cost, srb_batch)

    # ---- single-device baselines (same per-device workload) ---------------
    dev0 = jax.local_devices()[0]
    mesh1 = pmesh.make_mesh([dev0])
    env_cfg1 = env_cfg.replace(num_envs=num_envs // n_dev)
    update1 = ptrain.make_distributed_update(env_cfg1, ppo_cfg, mesh1)
    ts1 = ptrain.shard_train_state(
        mesh1, ppo.init_train_state(env_cfg1, ppo_cfg, jax.random.PRNGKey(0)))
    holder1 = {"ts": ts1}

    def ppo1_once():
        holder1["ts"], m = update1(holder1["ts"])
        return m["loss"]

    r1_ppo = timed(ppo1_once, (num_envs // n_dev) * n_steps)

    b1 = srb_batch // n_dev
    # rebuild from host values: slicing the globally-sharded probs is not
    # fully addressable from one process in the multi-host case
    probs1 = jax.device_put(
        jax.vmap(lambda c, t: srb.standing_problem(env_cfg, c, t))(
            cmds[:b1], t0s[:b1]),
        pmesh.data_sharding(mesh1))
    solve1 = ptrain.make_distributed_srb(env_cfg, scfg, mesh1)
    r1_srb = timed(lambda: solve1(probs1).cost, b1)

    results["ppo_steps_per_s_single_device"] = r1_ppo
    results["srb_solves_per_s_single_device"] = r1_srb
    results["ppo_scaling_efficiency"] = (
        results["ppo_steps_per_s_global"] / (n_dev * r1_ppo))
    results["srb_scaling_efficiency"] = (
        results["srb_solves_per_s_global"] / (n_dev * r1_srb))

    if jax.process_index() == 0:
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in results.items()}), flush=True)


def main():
    args = parse_args()
    if args.rig:
        extra = []
        for flag, v in (("--num-envs", args.num_envs),
                        ("--srb-batch", args.srb_batch),
                        ("--n-steps", args.n_steps)):
            if v is not None:
                extra += [flag, str(v)]
        run_rig(args.rig, extra)
    else:
        worker(args)


if __name__ == "__main__":
    main()
