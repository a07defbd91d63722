"""bp5_155 replica-gap attribution (round-4 VERDICT item 5).

The bp5_155 controller closed-loop tracks ~4.65-4.68 m/s at cmd 5 in this
framework vs the 4.97 m/s recorded anchor
(Exp_Raw_Data/body-center-2021-07-23-09-19-15.bin). The solver-class
question was closed in round 3 (compliant vs hard within +-0.03); this
script ablates the remaining *named* model deltas one at a time and prints
the attribution table:

  - contact material: the reference's default world material is
    (mu, e, thresh) = (0.6, 0.2, 0.01) (Environment.hpp:433) and its TEST
    path explicitly sets (0.8, 0.2, 0.01) before eval (run_bp_v5.py:317) —
    both restitution-live since round 4 (phys/model.damping_for_restitution,
    phys/hard_contact.py bounce rows). Prior parity tables used
    (0.6, e-dead) only.
  - deployment-path motor electrical dynamics (RealTorque,
    Environment.hpp:161-208): defined but never CALLED by the reference
    hot path, and MotorDynamics: False in both reference YAMLs — measured
    here anyway because the 4.97 anchor recording may carry real-motor
    effects the sim flag approximates.
  - constructor-time DR draws (StochasticDynamics, Environment.hpp:435-477)
    with the restitution draw live: 16-env ensemble mean/std.
  - separate toe bodies: analytically ZERO — the toe joints are FIXED
    (black_panther.urdf:159) and the merged composite inertia is exact
    (tests/test_dynamics.py::test_toe_merge_is_exact), with the contact
    sphere at the identical world point either way.

Usage: python scripts/bp5_replica_ablation.py [n_steps] [quick]
  quick: cmd 5 only (sweep mode); default prints the full cmd 1-5 table.
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
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()

BP5 = "/root/reference/IRRL/script/model/bp5_155"
ANCHOR = 4.97  # m/s at cmd 5, the recorded reference run


def run_table(cfg, params, cmds, n_steps, key, n_envs=1):
    """(mean_v per cmd, falls) — DR ensembles via vmap over n_envs keys."""
    ecfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0)
    vs, falls = [], 0
    for vx in cmds:
        cmd = jnp.array([vx, 0.0, 0.0])
        if n_envs == 1:
            log = ev.policy_rollout(ecfg, params, cmd, key, n_steps)
            vb = ev.body_velocity(log)[int(n_steps * 0.6):]
            vs.append(float(vb[:, 0].mean()))
            falls += int(np.asarray(log.done).sum())
        else:
            keys = jax.random.split(key, n_envs)
            logs = jax.vmap(lambda k: ev.policy_rollout(
                ecfg, params, cmd, k, n_steps))(keys)
            vb = np.stack([np.asarray(ev.body_velocity(
                jax.tree.map(lambda a: a[i], logs)))[int(n_steps * 0.6):, 0]
                for i in range(n_envs)])
            vs.append((float(vb.mean()), float(vb.mean(axis=1).std())))
            falls += int(np.asarray(logs.done).sum())
    return vs, falls


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    quick = len(sys.argv) > 2 and sys.argv[2] == "quick"
    cmds = (5.0,) if quick else (1.0, 2.0, 3.0, 4.0, 5.0)
    params = mio.load_bp5_csv(BP5)
    key = jax.random.PRNGKey(0)
    base = config.test_default().replace(terrain=False, crucial=False,
                                         stochastic_dynamics=False)

    # (label, cfg, n_envs)
    ref_default = dict(contact_friction=0.6, contact_restitution=0.2,
                       contact_res_threshold=0.01)
    ref_test = dict(contact_friction=0.8, contact_restitution=0.2,
                    contact_res_threshold=0.01)
    rows = [
        ("compliant e=0 mu=0.6 (r3 baseline)", base, 1),
        ("compliant ref-default (0.6,0.2,0.01)", base.replace(**ref_default), 1),
        ("compliant ref-test (0.8,0.2,0.01)", base.replace(**ref_test), 1),
        ("hard e=0 mu=0.6 (r3 baseline)", base.replace(hard_contact=True), 1),
        ("hard ref-default (0.6,0.2,0.01)",
         base.replace(hard_contact=True, **ref_default), 1),
        ("hard ref-test (0.8,0.2,0.01)",
         base.replace(hard_contact=True, **ref_test), 1),
        ("compliant ref-test + MotorDynamics",
         base.replace(motor_dynamics=True, **ref_test), 1),
        ("compliant ref-test + DR (16-env ensemble, live e-draw)",
         base.replace(stochastic_dynamics=True, **ref_test), 16),
    ]
    print(f"bp5_155 closed loop, {n_steps} steps, cmds {cmds}; "
          f"anchor {ANCHOR} m/s at cmd 5", flush=True)
    for label, cfg, n_envs in rows:
        t0 = time.time()
        vs, falls = run_table(cfg, params, cmds, n_steps, key, n_envs)
        fmt = " ".join((f"{v[0]:.2f}+-{v[1]:.2f}" if isinstance(v, tuple)
                        else f"{v:.2f}") for v in vs)
        print(f"{label:55s}: {fmt}  falls={falls} ({time.time()-t0:.0f}s)",
              flush=True)
    print("separate toe bodies: delta == 0 analytically "
          "(tests/test_dynamics.py::test_toe_merge_is_exact)", flush=True)


if __name__ == "__main__":
    main()
