"""The full Figure-4 robustness panel from FRESH simulation: ensemble-entropy
recovery rate kappa + achieved speed vs control latency, for the flagship
controller and the reference's bp5_155 — the reference's own estimator
(Figure4.py:160-173,294-340) over this framework's vmapped ensembles (its
recorded ensembles are absent from the repo: .MISSING_LARGE_BLOBS).

One ensemble = n_episodes episodes from a SHARED base state with the Param
protocol's body-state noise (z 0.02 m, roll/pitch 0.25 rad, dots 1.0);
kappa = piecewise-fit slope of the per-frame quantized-cell entropy.

Usage: python scripts/entropy_kappa.py [n_episodes] [n_steps] [cmds]
  cmds: comma-separated command list (default "5"; reference scale = "1,2,3,4,5")
Writes docs/figures/kappa_latency_sim_<name>_cmd<c>.png + runs/entropy_kappa.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import (
    figures,
    robustness,
)
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()

CONTROLLERS = {
    # path, wildcat convention the controller was TRAINED with
    "flagship": ("artifacts/irrl_tpu_relaxed_4e8", False),
    "flagship_dr": ("artifacts/irrl_tpu_relaxed_4e8_dr", True),
    "bp5_155": ("/root/reference/IRRL/script/model/bp5_155", True),
}


def main():
    n_episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cmds = [float(c) for c in
            (sys.argv[3] if len(sys.argv) > 3 else "5").split(",")]
    base = config.test_default().replace(terrain=False, crucial=False)
    key = jax.random.PRNGKey(0)

    out_path = "runs/entropy_kappa.json"
    results = {}
    if os.path.exists(out_path):   # resumable across queue restarts
        with open(out_path) as f:
            results = json.load(f).get("results", {})

    for name, (path, wildcat) in CONTROLLERS.items():
        if not os.path.isdir(path):
            print(f"{name}: {path} missing, skipping", flush=True)
            continue
        params = mio.load_bp5_csv(path)
        cfg = base.replace(wildcat=wildcat)
        for cmd in cmds:
            tag = f"{name}_cmd{cmd:.0f}"
            if tag in results:
                print(f"{tag}: already measured, skipping", flush=True)
                continue
            rows, curves = [], {}
            for delay in (0, 1, 2, 3, 4, 5):     # 0..10 ms
                t0 = time.time()
                fit = robustness.entropy_kappa(
                    cfg, params, jnp.array([cmd, 0.0, 0.0]), key,
                    n_episodes=n_episodes, n_steps=n_steps, delay_steps=delay)
                rows.append({k: fit[k] for k in
                             ("latency_ms", "kappa", "kappa_err", "v_mean",
                              "v_err", "survival")})
                fit_y = robustness.piecewise_flat_linear_flat(
                    fit["t"], *fit["popt"])
                curves[f"{delay * 2} ms"] = (fit["t"], fit["entropy"], fit_y)
                print(f"{tag} lat {delay*2:2d} ms: kappa {fit['kappa']:+.2f} "
                      f"+- {fit['kappa_err']:.2f}  v {fit['v_mean']:.2f} "
                      f"surv {fit['survival']:.3f} ({time.time()-t0:.0f}s)",
                      flush=True)
            results[tag] = rows
            figures.kappa_latency_figure(
                rows, f"docs/figures/kappa_latency_sim_{tag}.png",
                entropy_curves=curves)
            os.makedirs("runs", exist_ok=True)
            with open(out_path, "w") as f:
                json.dump({"n_episodes": n_episodes, "n_steps": n_steps,
                           "results": results}, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
