"""Headline benchmark: batched trot-MPC solves/s/chip (+ extras).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline = 1024 batched trot-MPC solves/s/chip (BASELINE.json north star).
The headline solver is the convex SRB trot-MPC (mpc/srb.py) — the
production-grade formulation for this robot class; extras report the
whole-body iLQR (mpc/trot.py) and raw env throughput.

Run on the real TPU (leave JAX_PLATFORMS alone); set BENCH_SMALL=1 for a
quick CPU smoke run.
"""

import json
import os
import subprocess
import sys
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# Per-extra wall budget [s] for the two compile-heavy, marker-gated extras
# (PPO-lanes ~28 min cold compile; lanes iLQR can exceed 1 h cold at some
# chunk choices). They run in SUBPROCESSES with this timeout, launched
# BEFORE the parent touches the TPU (libtpu is single-process), so a wiped
# persistent compile cache can delay but never hang or kill the whole
# capture: on budget overrun the extra is reported null WITH the reason and
# the headline still prints. Round-3 VERDICT weak #1: the markers are now
# COMMITTED files (no longer .gitignored), so a machine reset cannot
# silently null the official record either.
EXTRA_BUDGET_S = float(os.environ.get("BENCH_EXTRA_BUDGET_S", "2700"))


def _run_extra_subprocess(name: str):
    """Run `python bench.py --extra <name>` under the budget.

    Returns (timing: BenchTiming | None, status: str). The child prints one
    JSON line on success."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extra", name],
            timeout=EXTRA_BUDGET_S, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        _log(f"bench: {name} extra exceeded the {EXTRA_BUDGET_S:.0f}s budget")
        return None, f"budget_exceeded({EXTRA_BUDGET_S:.0f}s)"
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        tail = (out.stderr or "").strip().splitlines()[-1:] or ["?"]
        return None, f"failed(rc={out.returncode}: {tail[0][:120]})"
    try:
        d = json.loads(out.stdout.strip().splitlines()[-1])
        return BenchTiming(**d), "ok"
    except Exception as e:  # noqa: BLE001
        return None, f"unparseable({e})"


# Plausibility ceilings (units/s) wired to the physics of each workload: a
# warm-cache/async-dispatch anomaly once recorded 50M wb-RH solves/s and 289M
# PPO steps/s in runs/bench_warm.log (round 2) — numbers physically impossible
# for workloads that run >=100 physics substeps per unit. Rates above the
# ceiling are treated as measurement failures and re-measured, never published.
CEILINGS = {
    "srb": 5e6,      # h50 Riccati + cone projection >= ~0.2 us/solve batched
    "env": 5e6,      # 8 x 4 kHz substeps + reward >= ~0.2 us/step batched
    "ilqr": 5e4,     # cold-start whole-body iLQR: 8 iters x h50 physics
    "wb_rh": 5e4,    # warm-started h16 solve >= ~20 us even at fleet width
    "ppo": 5e6,      # PPO step >= env step + LSTM fwd/bwd share
}


class BenchTiming(NamedTuple):
    rate: float          # units/s (None-able at the call site)
    wall_s: float        # total measured wall time of the accepted pass
    repeats: int         # repeats in the accepted pass
    consistency: float   # max/min rate ratio across the two accepted passes
    attempts: int        # measurement attempts before acceptance


def _measure_rate(run_once, units_per_call, repeats, ceiling_key,
                  min_wall=0.05, max_attempts=5):
    """Guarded throughput measurement (round-2 VERDICT item 3).

    run_once() must dispatch one workload execution and return its output
    (blocking not required; we block on the last output). Guards:
    - minimum wall time: if a pass finishes under ``min_wall`` s the repeat
      count is scaled up and the pass re-run (a too-short pass measures
      dispatch, not compute);
    - repeat consistency: two consecutive passes must agree within 25%
      (max/min < 1.25), else both are discarded and re-tried;
    - plausibility ceiling: a rate above CEILINGS[ceiling_key] is a
      measurement failure (see CEILINGS note), never a result.
    Returns BenchTiming or None if no valid measurement was obtained.
    """
    ceiling = CEILINGS[ceiling_key]

    def one_pass(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = run_once()
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    attempts = 0
    while attempts < max_attempts:
        attempts += 1
        dt1 = one_pass(repeats)
        if dt1 < min_wall:
            scale = max(2.0, (2.0 * min_wall) / max(dt1, 1e-9))
            repeats = int(repeats * min(scale, 64.0)) + 1
            continue
        dt2 = one_pass(repeats)
        r1 = units_per_call * repeats / dt1
        r2 = units_per_call * repeats / dt2
        consistency = max(r1, r2) / max(min(r1, r2), 1e-12)
        rate = (r1 + r2) / 2.0
        if consistency > 1.25:
            _log(f"bench: inconsistent passes ({r1:.0f} vs {r2:.0f} /s), "
                 "retrying")
            continue
        if rate > ceiling:
            _log(f"bench: rate {rate:.0f}/s breaches the {ceiling_key} "
                 f"plausibility ceiling {ceiling:.0f}/s — discarding pass")
            continue
        return BenchTiming(rate=rate, wall_s=dt1 + dt2, repeats=repeats,
                           consistency=round(consistency, 4),
                           attempts=attempts)
    _log(f"bench: no valid measurement for {ceiling_key} after "
         f"{max_attempts} attempts")
    return None


def _timeit(solve, arg, units_per_call, repeats, ceiling_key):
    """Compile+warm solve(arg), then guarded-measure its throughput.

    Returns (timing: BenchTiming | None, compile_s, first_out)."""
    t_c = time.perf_counter()
    out = solve(arg)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c
    timing = _measure_rate(lambda: solve(arg), units_per_call, repeats,
                           ceiling_key)
    return timing, compile_s, out


def _bench_srb(batch: int, horizon: int, repeats: int = 10):
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb

    cfg = config.test_default()
    scfg = srb.SRBConfig(horizon=horizon)
    cmds = jnp.stack([jnp.array([1.0 + 4.0 * (i % 17) / 16.0, 0.0, 0.0])
                      for i in range(batch)])
    t0s = jnp.arange(batch) * 0.003  # spread gait clocks across the batch
    probs = jax.vmap(lambda c, t: srb.standing_problem(cfg, c, t))(cmds, t0s)
    solve = jax.jit(lambda p: srb.batched_solve(cfg, scfg, p).cost)
    _log(f"bench: compiling SRB MPC (batch={batch}, horizon={horizon})...")
    timing, compile_s, cost = _timeit(solve, probs, batch, repeats, "srb")
    if timing is None:
        raise RuntimeError("SRB headline measurement failed the guards")
    _log(f"bench: SRB compile {compile_s:.0f}s, "
         f"run {batch / timing.rate * 1e3:.1f} ms")
    return timing, float(jnp.mean(cost))


def _bench_ilqr(batch: int, horizon: int, n_iter: int, repeats: int = 2,
                lanes: bool = True):
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl

    cfg = config.test_default().replace(obs_noise=0.0)
    chunk = int(os.environ.get("BENCH_ILQR_CHUNK", "1")) if lanes else 1
    # the lanes extra runs the frozen-operator linearizer (mpc/linearize.py):
    # ~one physics eval per knot instead of 98 FD evals, and a compile-light
    # jacfwd graph where the FD lanes sweep was compile-bound
    # frozen-operator linearizer on BOTH paths: measured cost-neutral vs the
    # jacfwd/FD sweep (805.7 vs 802.4 mean cost at batch 64/h50, +0.4%) and
    # 1.4x faster on the vmap path (round-2 measurement; the runs/ log was
    # wiped by a machine reset — record preserved in commit db56a6f)
    mpc_cfg = trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                             linearize_chunk=chunk,
                             linearizer="frozen")
    params = mdl.nominal_params(cfg)
    cmds = jnp.stack([jnp.array([1.0 + 3.0 * (i % 5) / 4.0, 0.0, 0.0])
                      for i in range(batch)])
    probs = jax.vmap(lambda c: trot.make_problem(
        cfg, trot.standing_x0(cfg)[:19], jnp.zeros(18), c, jnp.asarray(0.0),
        mpc_cfg.horizon))(cmds)
    if lanes:
        # lanes-batched solver: physics lane width = batch x FD tangents
        solve = jax.jit(lambda pr: trot.solve_batch_lanes(
            cfg, mpc_cfg, params, pr).cost)
    else:
        pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                          params)
        solve = jax.jit(lambda pr: trot.batched_solve(cfg, mpc_cfg, pb, pr).cost)
    _log(f"bench: compiling whole-body iLQR ({'lanes' if lanes else 'vmap'}, "
         f"batch={batch})...")
    timing, compile_s, _ = _timeit(solve, probs, batch, repeats, "ilqr")
    _log(f"bench: iLQR compile {compile_s:.0f}s, "
         + (f"run {batch / timing.rate * 1e3:.0f} ms" if timing else
            "measurement failed"))
    return timing, ("lanes" if lanes else "vmap")


def _bench_wb_rh(B: int = 128, n_steps: int = 100):
    """Whole-body MPC in the PRODUCTION configuration: a fleet of B
    warm-started receding-horizon controllers (runtime.wb_mpc_rollout_batch,
    h16 / 2 iterations / frozen linearizer / whole-horizon chunk / jacobian
    reuse) — sustained solves/s serving B robots from one chip. Cold-start
    batch solves measure the wrong workload for this engine (bench extra
    `wholebody_ilqr_solves_per_s` keeps that number for continuity).
    Compile ~6 min cold, so only attempted behind the .wb_rh_ok marker
    (scripts/bench_wb_rh.py proves+caches the exact config)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime, trot

    cfg = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=16, n_iter=2, model_substeps=2,
                        linearize_chunk=16, n_alphas=4, relin_every=2,
                        linearizer="frozen")
    cmds = jnp.stack([jnp.array([0.5 + 2.5 * (i % 8) / 7.0, 0.0, 0.0])
                      for i in range(B)])
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _log(f"bench: compiling wb receding-horizon fleet (B={B})...")
    t_c = time.perf_counter()
    logs = runtime.wb_mpc_rollout_batch(cfg, mc, cmds, keys, n_steps)
    jax.block_until_ready(logs.reward)
    _log(f"bench: wb-RH compile+first {time.perf_counter() - t_c:.0f}s")
    return _measure_rate(
        lambda: runtime.wb_mpc_rollout_batch(cfg, mc, cmds, keys,
                                             n_steps).reward,
        B * n_steps, 1, "wb_rh")


def _bench_ppo(num_envs: int = 1024, repeats: int = 2, n_steps: int = None):
    """Full PPO update throughput (rollout+GAE+10 epochs in one jit) at the
    production configuration: 1024 envs on the batch-in-lanes physics.
    Compile-bound first time (~28 min on the TPU toolchain), so only
    attempted when scripts/bench_ppo.py has proven+cached this exact config
    (the .ppo_lanes_ok marker)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo

    env_cfg = config.train_default().replace(
        num_envs=num_envs, use_lanes_physics=True)
    ppo_cfg = ppo.PPOConfig(n_steps=n_steps or env_cfg.episode_len)
    batch = num_envs * ppo_cfg.n_steps
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    _log(f"bench: compiling PPO update (lanes, envs={num_envs})...")
    t_c = time.perf_counter()
    ts, m = update(ts)
    jax.block_until_ready(m["loss"])
    _log(f"bench: PPO compile+first {time.perf_counter() - t_c:.0f}s")

    holder = {"ts": ts}

    def once():
        holder["ts"], m = update(holder["ts"])
        return m["loss"]

    return _measure_rate(once, batch, repeats, "ppo")


def _bench_env(batch: int, n_steps: int, repeats: int = 3):
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp

    cfg = config.train_default().replace(num_envs=batch)
    state = jax.jit(jax.vmap(lambda k: bp.env_init(cfg, k)))(
        jax.random.split(jax.random.PRNGKey(0), batch))

    def run(state):
        def body(s, _):
            out = jax.vmap(lambda ss, a: bp.step(cfg, ss, a))(s, jnp.zeros((batch, 12)))
            return out.state, out.reward
        s2, rews = jax.lax.scan(body, state, None, length=n_steps)
        return s2, jnp.sum(rews)

    run_j = jax.jit(run)
    _log(f"bench: compiling env rollout (batch={batch}, steps={n_steps})...")
    t_c = time.perf_counter()
    s2, tot = run_j(state)
    jax.block_until_ready(tot)
    _log(f"bench: env compile+warmup {time.perf_counter() - t_c:.1f}s")

    holder = {"s": s2}

    def once():
        holder["s"], tot = run_j(holder["s"])
        return tot

    return _measure_rate(once, batch * n_steps, repeats, "env")


def _bench_env_lanes(batch: int = 8192, n_steps: int = 100, repeats: int = 3):
    """Raw env throughput on the batch-in-lanes physics path — the production
    training path (envs/blackpanther.step_batch). The `env_steps_per_s_per_
    chip` extra keeps the vmap path for cross-round continuity; this one
    publishes the lanes number (step_batch docstring: ~4x the vmap substep
    throughput at batch 8k). Runs as a budget-bounded subprocess (child mode
    `--extra env_lanes`) like the PPO extra: compile-heavy first time, cheap
    once the persistent cache is warm."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp

    batch = int(os.environ.get("BENCH_ENV_LANES_BATCH", str(batch)))
    n_steps = int(os.environ.get("BENCH_ENV_LANES_STEPS", str(n_steps)))
    cfg = config.train_default().replace(num_envs=batch,
                                         use_lanes_physics=True)
    state = jax.jit(jax.vmap(lambda k: bp.env_init(cfg, k)))(
        jax.random.split(jax.random.PRNGKey(0), batch))

    def run(state):
        def body(s, _):
            out = bp.step_batch(cfg, s, jnp.zeros((batch, 12)))
            return out.state, out.reward
        s2, rews = jax.lax.scan(body, state, None, length=n_steps)
        return s2, jnp.sum(rews)

    run_j = jax.jit(run)
    _log(f"bench: compiling lanes env rollout (batch={batch}, "
         f"steps={n_steps})...")
    t_c = time.perf_counter()
    s2, tot = run_j(state)
    jax.block_until_ready(tot)
    _log(f"bench: lanes env compile+warmup {time.perf_counter() - t_c:.1f}s")

    holder = {"s": s2}

    def once():
        holder["s"], tot = run_j(holder["s"])
        return tot

    return _measure_rate(once, batch * n_steps, repeats, "env")


def _bench_control_mae(T: int = 200):
    """Control MAE of our LSTM vs an independent NumPy oracle of the
    reference's deployment runtime (CustomerLstmNN.predict semantics) on the
    shipped bp5_155 weights — the BASELINE '<1e-2 MAE' criterion."""
    import numpy as np

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

    bp5_dir = "/root/reference/IRRL/script/model/bp5_155"
    if not os.path.isdir(bp5_dir):
        return None
    params = mio.load_bp5_csv(bp5_dir)
    rng = np.random.default_rng(0)
    t = np.arange(T) * 0.002
    obs = np.zeros((T, 35), np.float32)
    obs[:, 0] = 1.0
    obs[:, 3] = np.sin(2 * np.pi * t / 0.2)
    obs[:, 4] = np.cos(2 * np.pi * t / 0.2)
    obs[:, 5:] = rng.normal(scale=0.3, size=(T, 30)).astype(np.float32)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    wx = [np.asarray(w.wx) for w in params.pi_lstm]
    wh = [np.asarray(w.wh) for w in params.pi_lstm]
    b = [np.asarray(w.b) for w in params.pi_lstm]
    pi_w, pi_b = np.asarray(params.pi_w), np.asarray(params.pi_b)
    n0, n1 = wh[0].shape[0], wh[1].shape[0]
    c = [np.zeros(n0), np.zeros(n1)]
    h = [np.zeros(n0), np.zeros(n1)]
    want = []
    for o in obs:
        x = o
        for i, n in enumerate((n0, n1)):
            g = x @ wx[i] + h[i] @ wh[i] + b[i]
            ig, fg, og, cg = g[:n], g[n:2 * n], g[2 * n:3 * n], np.tanh(g[3 * n:])
            c[i] = sig(fg) * c[i] + sig(ig) * cg
            h[i] = sig(og) * np.tanh(c[i])
            x = h[i]
        want.append(np.clip(x @ pi_w + pi_b, -1.0, 1.0))
    want = np.stack(want)

    state = jnp.zeros((1, lstm.state_size([n0, n1])))
    done = jnp.zeros((1,))
    got = []
    for i in range(T):
        act, state = lstm.deterministic_action(params, jnp.asarray(obs[i:i + 1]),
                                               state, done)
        got.append(jax.device_get(act[0]))
    return float(abs(want - jnp.stack(got)).mean())


def main():
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling
    profiling.enable_compile_cache()   # persistent .jax_cache across runs
    small = os.environ.get("BENCH_SMALL") == "1"
    # 8192 is the measured per-chip throughput peak of the scaling curve
    # (scripts/bench_srb_sweep.py: 71.1k solves/s at 1024, 88.3k at 8192
    # after the unrolled-Riccati backward)
    srb_batch = 64 if small else 8192
    horizon = 10 if small else 50
    env_batch = 64 if small else 4096
    env_steps = 8 if small else 100
    ilqr_batch = 8 if small else 64

    repo = os.path.dirname(os.path.abspath(__file__))
    # The lanes-batched iLQR extra is RETIRED (round-4 VERDICT item 7): its
    # graph is compile-infeasible on this TPU toolchain — five dated
    # failures across three rounds (remote compile-helper SIGKILL at 38
    # min; >1-2 h kills), closure recorded in docs/evidence/bench_markers.md
    # and docs/DESIGN.md §4. The official whole-body number is the vmap
    # cold-start path plus the warm-started RH fleet. The PPO-lanes update
    # compiles ~28 min cold, so it runs first in a budget-bounded
    # subprocess, before this process touches the TPU
    # (see _run_extra_subprocess).
    extras_status = {}
    ilqr_timing, ilqr_path, ppo_timing = None, None, None
    if not small and os.path.exists(os.path.join(repo, ".ppo_lanes_ok")):
        ppo_timing, extras_status["ppo"] = _run_extra_subprocess("ppo")
    env_lanes_timing = None
    if not small:
        env_lanes_timing, extras_status["env_lanes"] = \
            _run_extra_subprocess("env_lanes")

    srb_timing, mean_cost = _bench_srb(srb_batch, horizon)
    solves_per_s = srb_timing.rate
    env_timing = _bench_env(env_batch, env_steps)
    control_mae = _bench_control_mae()
    if ilqr_timing is None:
        try:
            ilqr_timing, ilqr_path = _bench_ilqr(
                ilqr_batch, horizon, n_iter=2 if small else 8, lanes=False)
        except Exception as e:  # keep the headline even if the extra fails
            _log(f"bench: iLQR vmap extra failed ({e})")

    wb_rh_timing = None
    if not small and os.path.exists(os.path.join(repo, ".wb_rh_ok")):
        try:
            wb_rh_timing = _bench_wb_rh()
        except Exception as e:
            _log(f"bench: wb-RH extra failed ({e})")

    def prov(t):  # measurement provenance per guarded extra
        return None if t is None else {
            "wall_s": round(t.wall_s, 3), "repeats": t.repeats,
            "consistency": t.consistency, "attempts": t.attempts}

    print(json.dumps({
        "metric": "trot_mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1024.0, 4),
        "extra": {
            "solver": "convex SRB trot-MPC (TV-LQR Riccati + cone projection)",
            "mpc_batch": srb_batch, "horizon": horizon,
            "mean_solution_cost": round(mean_cost, 3),
            "wholebody_ilqr_solves_per_s": (round(ilqr_timing.rate, 2)
                                            if ilqr_timing else None),
            "wholebody_ilqr_path": ilqr_path,
            "wholebody_rh_fleet_solves_per_s": (round(wb_rh_timing.rate, 1)
                                                if wb_rh_timing else None),
            "control_mae_vs_bp5_155": control_mae,
            "ppo_env_steps_per_s_per_chip": (round(ppo_timing.rate, 1)
                                             if ppo_timing else None),
            "env_steps_per_s_per_chip": (round(env_timing.rate, 1)
                                         if env_timing else None),
            "env_steps_per_s_lanes": (round(env_lanes_timing.rate, 1)
                                      if env_lanes_timing else None),
            "env_batch": env_batch,
            "device": str(jax.devices()[0]),
            "markers": {
                "ppo_lanes_ok": os.path.exists(
                    os.path.join(repo, ".ppo_lanes_ok")),
                "wb_rh_ok": os.path.exists(os.path.join(repo, ".wb_rh_ok")),
            },
            "extras_status": extras_status,
            "timing_guards": {
                "srb": prov(srb_timing), "env": prov(env_timing),
                "env_lanes": prov(env_lanes_timing),
                "ilqr": prov(ilqr_timing), "ppo": prov(ppo_timing),
                "wb_rh": prov(wb_rh_timing),
            },
        },
    }))


def _extra_main(name: str):
    """Child mode: run ONE marker-gated extra, print its BenchTiming as one
    JSON line (consumed by _run_extra_subprocess in the parent)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling
    profiling.enable_compile_cache()
    if name == "ppo":
        timing = _bench_ppo()
    elif name == "env_lanes":
        timing = _bench_env_lanes()
    else:
        raise SystemExit(f"unknown extra {name!r}")
    if timing is None:
        raise SystemExit(1)
    print(json.dumps(timing._asdict()))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--extra":
        _extra_main(sys.argv[2])
    else:
        main()
