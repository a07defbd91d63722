"""TPU-native IRRL quadruped-locomotion framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``WoodenJin/High_Speed_Quadrupedal_Locomotion_by_IRRL`` (C++ Raisim gym +
TF1 PPO-LSTM), re-designed TPU-first:

- ``phys``     batched articulated rigid-body dynamics (replaces the Raisim world)
- ``robot``    kinematics, analytic IK, Bezier gait generation
- ``envs``     the BlackPanther MDP as a pure function (obs/reward/termination)
- ``models``   stacked-LSTM actor-critic + bp5_155 CSV weight interop
- ``algo``     recurrent PPO (rollout + BPTT via ``lax.scan``)
- ``mpc``      batched iLQR / trajectory-optimization engine
- ``ops``      Pallas TPU kernels for the hot paths
- ``parallel`` device-mesh sharding (pjit/shard_map) for multi-chip scale
- ``utils``    rotation, filters, latency emulation, PRNG discipline
- ``analysis`` evaluation suites (tracking error, torque/power, envelopes)
- ``cli``      train / test / relaxation entry points

Everything on the compute path is a pure function over pytrees: ``vmap``
replaces the reference's OpenMP env loop, ``lax.scan`` replaces its Python
rollout loop, and a ``jax.sharding.Mesh`` adds the multi-chip scale the
reference never had.
"""

__version__ = "0.1.0"

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config  # noqa: F401
