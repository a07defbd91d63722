"""Checkpoint-selection sweep: tracking table + falls for every saved csv_*.

The reference's own flagship (bp5_155) is an update-155 pick from a long run,
selected by closed-loop quality — this reproduces that selection protocol for
our runs (late relaxation collapses entropy and degrades top speed, so the
best controller is rarely the final checkpoint).

Usage: python scripts/ckpt_sweep.py <run_dir> [n_steps] [noisy]
Prints one line per checkpoint: update id, v_mean at cmd 1-5, total falls.

Third arg "noisy" keeps the TRAINING protocol's obs noise + stochastic
dynamics while pinning the command (round-5 terrain-collapse diagnosis:
if later checkpoints rank BETTER under the training protocol while the
clean-physics table collapses, the policy is trading clean-gait tracking
for perturbation robustness — objective misalignment — rather than
genuinely degrading).
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()

COMMANDS = (1.0, 2.0, 3.0, 4.0, 5.0)


def eval_ckpt(cfg, params, key, n_steps, noisy=False):
    sign = -1.0 if cfg.wildcat else 1.0
    if noisy:  # training protocol, command pinned
        ecfg = cfg.replace(manual=True)
    else:
        ecfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                           stochastic_dynamics=False)
    vs, falls = [], 0
    for vx in COMMANDS:
        log = ev.policy_rollout(ecfg, params, jnp.array([vx, 0.0, 0.0]),
                                key, n_steps)
        vb = ev.body_velocity(log)[int(n_steps * 0.6):]
        vs.append(float((sign * vb[:, 0]).mean()))
        falls += int(np.asarray(log.done).sum())
    return vs, falls


def main():
    run_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    noisy = len(sys.argv) > 3 and sys.argv[3] == "noisy"
    # the run dir carries a copy of the training YAML under its ORIGINAL
    # basename (utils/run_dir.make_run_dir) — e.g. bp5_relax_terrain.yaml
    # for the terrain leg. Falling back to train_default() here would rank
    # terrain checkpoints on flat ground, so resolve any unique *.yaml.
    cfg_path = os.path.join(run_dir, "bp5_train.yaml")
    if not os.path.exists(cfg_path):
        yamls = sorted(f for f in os.listdir(run_dir)
                       if f.endswith((".yaml", ".yml")))
        cfg_path = os.path.join(run_dir, yamls[0]) if len(yamls) == 1 else None
    cfg = (config.from_yaml(cfg_path)
           if cfg_path and os.path.exists(cfg_path)
           else config.train_default())
    key = jax.random.PRNGKey(0)

    ckpts = []
    for name in os.listdir(run_dir):
        m = re.fullmatch(r"csv_(\d+|final)", name)
        if m and os.path.isdir(os.path.join(run_dir, name)):
            upd = 10 ** 9 if m.group(1) == "final" else int(m.group(1))
            ckpts.append((upd, name))
    ckpts.sort()
    print(f"sweeping {len(ckpts)} checkpoints in {run_dir} "
          f"(wildcat={cfg.wildcat}, n_steps={n_steps}, "
          f"protocol={'noisy/training' if noisy else 'clean'})", flush=True)

    best = None
    for upd, name in ckpts:
        params = mio.load_bp5_csv(os.path.join(run_dir, name))
        vs, falls = eval_ckpt(cfg, params, key, n_steps, noisy)
        vtxt = "/".join(f"{v:.2f}" for v in vs)
        print(f"{name}: v={vtxt} falls={falls}", flush=True)
        # selection: zero falls first, then top speed, then worst-command error
        score = (falls == 0, vs[-1], -max(abs(v - c) for v, c
                                          in zip(vs, COMMANDS)))
        if best is None or score > best[0]:
            best = (score, name, vs, falls)
    _, name, vs, falls = best
    print(f"BEST {name}: v={'/'.join(f'{v:.2f}' for v in vs)} falls={falls}")


if __name__ == "__main__":
    main()
