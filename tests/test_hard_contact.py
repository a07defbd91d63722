"""Hard (impulse) toe contact: analytic Jacobians, PGS complementarity,
and closed-loop standing in the env (phys/hard_contact.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import hard_contact as hc
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr


def _setup(z=0.28):
    cfg = config.test_default().replace(terrain=False, crucial=False)
    params = mdl.nominal_params(cfg)
    gc = mdl.stand_gc(cfg.abad)
    gc = gc.at[2].set(z)
    return cfg, params, gc


def test_toe_jacobian_matches_velocity_map():
    """J gv must equal the toe velocity computed through the spatial path
    for arbitrary gv (J is the exact linear map, not an approximation)."""
    _, params, gc = _setup()
    kin = dyn.fk(params, gc)
    J = hc.toe_jacobians(kin)
    rng = np.random.default_rng(0)
    for _ in range(3):
        gv = jnp.asarray(rng.normal(size=18).astype(np.float32))
        v_bodies = dyn.body_velocities(kin, gv)
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import spatial as sp
        want = sp.point_velocity(v_bodies[dyn.SHANK_BODY_IDX], kin.toe_pos)
        got = jnp.einsum("cid,d->ci", J, gv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_impulse_solve_complementarity():
    """Active contacts: lam_n >= 0, cone respected, v+_n >= push-out - tol;
    inactive contacts get exactly zero impulse."""
    cfg, params, gc = _setup(z=0.27)  # slight penetration -> all toes active
    kin = dyn.fk(params, gc)
    tp = tr.flat()
    gv_free = jnp.zeros(18).at[2].set(-0.5)  # falling
    M = dyn.mass_matrix(params, kin)
    J = hc.toe_jacobians(kin)
    gap, basis = hc.contact_frames(tp, kin.toe_pos)
    assert bool((gap < 0).any())
    sol = hc.solve_impulses(M, J, gv_free, gap, basis, params.friction,
                            2.5e-4, n_iter=20)
    lam = np.asarray(sol.lam)
    active = np.asarray(gap) < 0
    assert (lam[active, 0] >= 0).all()
    # friction cone: ||lam_t|| <= mu lam_n (+ tiny tolerance)
    lt = np.linalg.norm(lam[:, 1:], axis=-1)
    assert (lt <= float(params.friction) * lam[:, 0] + 1e-8).all()
    assert np.allclose(lam[~active], 0.0)
    # post-impulse normal velocities non-negative (separating or resting)
    vloc = np.einsum("cki,ci->ck", np.asarray(basis),
                     np.asarray(sol.toe_vel_plus))
    assert (vloc[active, 0] >= -1e-3).all()


def test_stick_under_lateral_load():
    """A lateral free-velocity below the friction limit must be brought to
    (near) zero by the impulse — true stiction, the hard-contact point."""
    cfg, params, gc = _setup(z=0.27)
    kin = dyn.fk(params, gc)
    tp = tr.flat()
    gv_free = jnp.zeros(18).at[0].set(0.2).at[2].set(-0.2)
    M = dyn.mass_matrix(params, kin)
    J = hc.toe_jacobians(kin)
    gap, basis = hc.contact_frames(tp, kin.toe_pos)
    sol = hc.solve_impulses(M, J, gv_free, gap, basis, params.friction,
                            2.5e-4, n_iter=20)
    active = np.asarray(gap) < 0
    vt = np.asarray(sol.toe_vel_plus)[active][:, :2]
    assert np.abs(vt).max() < 0.02, vt


def test_env_stands_with_hard_contact():
    """100 control steps of PD-to-stand under hard contact: no fall, height
    holds, stance toes stick (post-impulse slip ~ 0)."""
    cfg = config.test_default().replace(
        terrain=False, crucial=False, obs_noise=0.0, action_noise=0.0,
        stochastic_dynamics=False, manual=True, hard_contact=True)
    state = bp.env_init(cfg, jax.random.PRNGKey(0))
    state = state._replace(command=jnp.zeros(3), command_filtered=jnp.zeros(3))

    def body(s, _):
        out = bp.step(cfg, s, jnp.zeros(12))
        return out.state, (out.state.gc[2], out.done)

    step = jax.jit(lambda s: jax.lax.scan(body, s, None, length=100))
    s2, (zs, dones) = step(state)
    zs = np.asarray(zs)
    assert not bool(np.asarray(dones).any())
    assert abs(zs[-1] - cfg.stand_height) < 0.06
    assert np.isfinite(np.asarray(s2.gv)).all()


@pytest.mark.slow
def test_hard_vs_compliant_standing_penetration():
    """The hard solver should hold the toes at (near) zero penetration where
    the compliant model sags by the static-load compression."""
    def settle(hard):
        cfg = config.test_default().replace(
            terrain=False, crucial=False, obs_noise=0.0, action_noise=0.0,
            stochastic_dynamics=False, manual=True, hard_contact=hard)
        state = bp.env_init(cfg, jax.random.PRNGKey(0))
        state = state._replace(command=jnp.zeros(3),
                               command_filtered=jnp.zeros(3))

        def body(s, _):
            out = bp.step(cfg, s, jnp.zeros(12))
            return out.state, None
        s2, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=150))(state)
        kin = dyn.fk(s2.params, s2.gc)
        return float(np.asarray(kin.toe_pos)[:, 2].min())

    z_hard = settle(True)
    # toes rest within ~2 mm of the r=0.0275 contact surface
    assert z_hard > mdl.TOE_RADIUS - 2.5e-3, z_hard
