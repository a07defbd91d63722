"""bp5_155 closed-loop fidelity under the hard-contact solver.

The round-2 calibration showed the compliant model's residual vs the
4.97 m/s recording is structural; this measures whether the impulse-level
solver (phys/hard_contact.py) closes it. Evaluates bp5_155 and the flagship
at cmd 1-5 under compliant vs hard contact.

Usage: python scripts/hard_contact_eval.py [n_steps]
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

MODELS = {
    "bp5_155": "/root/reference/IRRL/script/model/bp5_155",
    "flagship": "artifacts/irrl_tpu_relaxed_4e8",
}


def table(cfg, params, key, n_steps):
    sign = -1.0 if cfg.wildcat else 1.0
    ecfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                       stochastic_dynamics=False)
    vs, falls = [], 0
    for vx in (1.0, 2.0, 3.0, 4.0, 5.0):
        log = ev.policy_rollout(ecfg, params, jnp.array([vx, 0.0, 0.0]),
                                key, n_steps)
        vb = ev.body_velocity(log)[int(n_steps * 0.6):]
        vs.append(float((sign * vb[:, 0]).mean()))
        falls += int(np.asarray(log.done).sum())
    return vs, falls


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    key = jax.random.PRNGKey(0)
    for name, path in MODELS.items():
        if not os.path.isdir(path):
            continue
        params = mio.load_bp5_csv(path)
        # both deploy un-mirrored (the reference's own bp5_test.yaml sets
        # WILDCAT: False; the flagship trained with forward = +x)
        wildcat = False
        for mode, kw in (("compliant", {}),
                         ("hard", {"hard_contact": True}),
                         ("hard16", {"hard_contact": True,
                                     "hard_contact_iters": 16})):
            cfg = config.test_default().replace(
                terrain=False, crucial=False, wildcat=wildcat, **kw)
            vs, falls = table(cfg, params, key, n_steps)
            print(f"{name:9s} {mode:9s}: "
                  f"v={'/'.join(f'{v:.2f}' for v in vs)} falls={falls}",
                  flush=True)


if __name__ == "__main__":
    main()
