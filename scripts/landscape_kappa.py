"""The two round-2 analysis studies on real rollouts (TPU):

1. Reward-landscape hyperplane sweep over the policy-parameter simplex
   spanned by (imitation, relaxed, bp5_155) — the total_reward.txt study.
2. Recovery-rate kappa suite: lateral-kick fits across commands + the
   velocity/kappa-vs-latency curve (Figure-4 robustness analysis).

Usage: python scripts/landscape_kappa.py <relaxed_csv_dir> [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
    figures, landscape as ls, robustness as rb,
)
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    relaxed_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "runs/analysis_r2"
    os.makedirs(out, exist_ok=True)
    cfg = config.train_default().replace(obs_noise=0.0)
    key = jax.random.PRNGKey(0)

    p_relax = mio.load_bp5_csv(relaxed_dir)
    p_imit = mio.load_bp5_csv("artifacts/irrl_tpu_imitation")
    p_bp5 = mio.load_bp5_csv("/root/reference/IRRL/script/model/bp5_155")

    # --- landscape: reference grid density (step 0.01 -> 5151 blends, the
    # 5152-row total_reward.txt scale), 750-step episodes at cmd 2
    res = ls.reward_landscape(cfg, p_imit, p_relax, p_bp5,
                              jnp.array([2.0, 0.0, 0.0]), step=0.02,
                              n_steps=750, key=key, chunk=512)
    ls.save_total_reward(os.path.join(out, "total_reward.txt"), cfg, res)
    comps = ls.composites(cfg, res["terms"])
    figures.ternary_landscape_figure(res, comps,
                                     os.path.join(out, "reward_landscape.png"))
    print(f"landscape: {len(res['w'])} blends written", flush=True)

    # --- kappa: kick recovery across commands
    rows = rb.recovery_sweep(cfg, p_relax, [1.0, 2.0, 3.0], [0.5, 1.0], key)
    for r in rows:
        print(f"cmd {r['command']:.0f} kick {r['kick']:.1f}: "
              f"kappa {r['kappa']:+.2f} (r2 {r['r2']:.2f}) "
              f"{'ok' if r['survived'] else 'FELL'}", flush=True)

    # --- velocity + kappa vs latency (Figure4 curve)
    lat = rb.latency_recovery(cfg, p_relax, 3.0, [0, 2, 5, 10, 15], 1.0, key)
    figures.recovery_figure(lat, os.path.join(out, "latency_recovery.png"))
    for r in lat:
        print(f"latency {r['latency_ms']:.0f} ms: v {r['v_mean']:+.2f} "
              f"kappa {r['kappa']:+.2f} "
              f"{'ok' if r['survived'] else 'FELL'}", flush=True)


if __name__ == "__main__":
    main()
