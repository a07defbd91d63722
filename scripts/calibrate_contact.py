"""Contact calibration vs the bp5_155 closed-loop anchor (VERDICT item 5).

The reference's recorded V_Max=5 run tracks 4.97 m/s; round-1 physics ran
bp5_155 at 4.61 (93%). The residual is the friction model: the default
slip-velocity-regularized Coulomb (tanh(vt/slip_vel)) needs ~slip_vel of
sliding before full traction, while Raisim's hard contact gives stiction.
The capped-impulse option (contact_impulse_mass) approximates stiction with
a viscous ramp capped at mu*fn — this sweep calibrates its mass scale.

Usage: python scripts/calibrate_contact.py
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

BP5 = "/root/reference/IRRL/script/model/bp5_155"


def main():
    params = mio.load_bp5_csv(BP5)
    key = jax.random.PRNGKey(0)
    base = config.test_default().replace(obs_noise=0.0)
    print("impulse_mass slip_vel | v@cmd5 (falls) v@cmd3 (falls)", flush=True)
    best = None
    for im in (0.0, 0.5, 1.0, 2.0, 4.0):
        for sv in (0.1, 0.05):
            cfg = base.replace(contact_impulse_mass=im, contact_slip_vel=sv)
            row = []
            for cmd in (5.0, 3.0):
                log = ev.policy_rollout(
                    cfg.replace(manual=True, action_noise=0.0,
                                stochastic_dynamics=False), params,
                    jnp.array([cmd, 0.0, 0.0]), key, 2000)
                vb = ev.body_velocity(log)[1200:]
                sign = -1.0 if cfg.wildcat else 1.0
                v = float(sign * vb[:, 0].mean())
                nf = int(np.asarray(log.done).sum())
                row.append((v, nf))
            print(f"{im:4.1f} {sv:.2f} | {row[0][0]:+.2f} ({row[0][1]}) "
                  f"{row[1][0]:+.2f} ({row[1][1]})", flush=True)
            if row[0][1] == 0 and (best is None or row[0][0] > best[0]):
                best = (row[0][0], im, sv)
    if best:
        print(f"best: v={best[0]:.2f} at impulse_mass={best[1]} slip_vel={best[2]}")


if __name__ == "__main__":
    main()
