"""Round-2 post-training evaluation (runs on the TPU once training ends).

1. Tracking table for the fully-relaxed controller at cmd 1-5 (PARITY table).
2. Export the controller into artifacts/irrl_tpu_relaxed_full.
Usage: python scripts/eval_round2.py <run_dir> [ckpt]
"""

import os
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


def main():
    run_dir = sys.argv[1]
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "csv_final"
    path = os.path.join(run_dir, ckpt)
    params = mio.load_bp5_csv(path)
    cfg = config.train_default().replace(obs_noise=0.0)
    key = jax.random.PRNGKey(0)

    rows = ev.tracking_eval(cfg, params, [1.0, 2.0, 3.0, 4.0, 5.0], key,
                            n_steps=2000)
    print(f"=== {path} ===")
    falls = 0
    for r in rows:
        log = ev.policy_rollout(
            cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                        stochastic_dynamics=False), params,
            jnp.array([r["command"], 0.0, 0.0]), key, 2000)
        nf = int(np.asarray(log.done).sum())
        falls += nf
        print(f"cmd {r['command']:.0f}: v={r['v_mean']:+.2f} "
              f"err={r['err_mean']:+.3f}+-{r['err_std']:.3f} falls={nf}",
              flush=True)
    print(f"total falls: {falls}")


if __name__ == "__main__":
    main()
