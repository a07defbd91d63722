import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import L_HIP
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait, kinematics as kin


def test_fk_stand_pose_height():
    """Stand pose [0,-0.78,1.57] puts the toe ~0.30 m under the hip."""
    for is_right in (True, False):
        p = kin.leg_fk(jnp.array([0.0, -0.78, 1.57]), jnp.asarray(is_right))
        assert abs(float(p[2]) + 0.3017) < 1e-3
        assert abs(float(p[1]) - (-L_HIP if is_right else L_HIP)) < 1e-6


def test_ik_fk_roundtrip(rng):
    """FK(IK(p)) == p across the gait workspace (reachable targets)."""
    n = 512
    tgt = np.stack([
        rng.uniform(-0.30, 0.30, n),
        rng.uniform(-0.08, 0.08, n),
        rng.uniform(-0.36, -0.16, n),
    ], axis=-1)
    for is_right in (True, False):
        t = tgt.copy()
        t[:, 1] += -L_HIP if is_right else L_HIP
        reachable = np.linalg.norm(t, axis=-1) < kin.MAX_LEN - 0.01
        q = kin.leg_ik(jnp.asarray(t), jnp.asarray(is_right))
        p = kin.leg_fk(q, jnp.asarray(is_right))
        err = np.linalg.norm(np.asarray(p) - t, axis=-1)
        assert err[reachable].max() < 1e-4


def test_ik_clamps_unreachable():
    q = kin.leg_ik(jnp.array([1.0, 0.0, -1.0]), jnp.asarray(True))
    assert np.all(np.isfinite(np.asarray(q)))


def test_gait_stance_swing_structure():
    cfg = config.test_default()
    cmd = jnp.array([2.0, 0.0, 0.0])
    # mid-stance for legs whose phase offset puts them in [0, lam)
    ref = gait.gait_reference(cfg, cmd, jnp.asarray(0.0))
    assert ref.joint_ref.shape == (12,)
    assert np.all(np.isfinite(np.asarray(ref.joint_ref)))
    # toe z must stay in [-stand_height, -stand_height + up_height + eps]
    ts = np.linspace(0, cfg.period, 50)
    zs = np.stack([np.asarray(gait.toe_targets(cfg, cmd, jnp.asarray(t)))[:, 2] for t in ts])
    assert zs.min() >= -cfg.stand_height - 1e-6
    assert zs.max() <= -cfg.stand_height + cfg.up_height + 1e-6
    # swing apex reached
    assert zs.max() > -cfg.stand_height + 0.5 * cfg.up_height


def test_gait_step_length_tracks_command():
    cfg = config.test_default()
    cmd = jnp.array([3.0, 0.0, 0.0])
    # at phase 0 (stance start) toe_x = +gait_step/2; phase lam- -> -gait_step/2
    t0 = gait.toe_targets(cfg, cmd, jnp.asarray(0.0))
    expect = 3.0 * cfg.lam * cfg.period / 2.0
    # leg FL (index 1) has phase offset 0 in trot -> at stance start
    assert abs(float(t0[1, 0]) - expect) < 1e-5


def test_gait_reference_jits_and_vmaps():
    cfg = config.train_default()
    f = jax.jit(jax.vmap(lambda c, t: gait.gait_reference(cfg, c, t).joint_ref))
    cmds = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (16, 1))
    out = f(cmds, jnp.linspace(0.0, 1.0, 16))
    assert out.shape == (16, 12)
    assert np.all(np.isfinite(np.asarray(out)))
