"""Numerical parity: batch-in-lanes physics (ops/phys_lanes.py) vs the
reference vmap path (phys/dynamics.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_lanes as pl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def _random_states(key, B):
    """Plausible perturbed stand states (some toes in contact)."""
    cfg = config.test_default()
    k1, k2, k3 = jax.random.split(key, 3)
    gc = jnp.broadcast_to(mdl.stand_gc(cfg.abad).at[2].set(0.30), (B, 19))
    gc = gc + 0.05 * jax.random.normal(k1, (B, 19))
    gc = gc.at[:, 3:7].set(gc[:, 3:7] / jnp.linalg.norm(gc[:, 3:7], axis=-1,
                                                        keepdims=True))
    gv = 0.5 * jax.random.normal(k2, (B, 18))
    tau = 5.0 * jax.random.normal(k3, (B, 12))
    return cfg, gc, gv, tau


@pytest.mark.parametrize("impulse_scale", [0.0, 400.0])
def test_substep_matches_vmap_path(impulse_scale):
    B = 16
    cfg, gc, gv, tau = _random_states(jax.random.PRNGKey(0), B)
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    bw = jnp.zeros((B, 6))
    dt = cfg.simulation_dt

    def ref_one(gc1, gv1, tau1, bw1):
        qdd, diag = dyn.forward_dynamics(params, gc1, gv1, tau1, bw1, tr.flat(),
                                         cfg.contact_slip_vel,
                                         impulse_scale=impulse_scale)
        gc2, gv2 = dyn.integrate(gc1, gv1, qdd, dt)
        return gc2, gv2, diag.toe_pos, diag.toe_force_norm

    gc2_r, gv2_r, toe_r, fn_r = jax.jit(jax.vmap(ref_one))(gc, gv, tau, bw)

    P = pl.params_to_lanes(pb)
    lane = jax.jit(lambda *a: pl.substep(P, *a, slip_vel=cfg.contact_slip_vel,
                                         impulse_scale=impulse_scale, dt=dt))
    gc2_l, gv2_l, toe_l, _, fn_l, _ = lane(gc.T, gv.T, tau.T, bw.T)

    np.testing.assert_allclose(np.asarray(gc2_l.T), np.asarray(gc2_r),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gv2_l.T), np.asarray(gv2_r),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(toe_l, -1, 0)),
                               np.asarray(toe_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fn_l.T), np.asarray(fn_r),
                               atol=1e-2, rtol=1e-3)


def test_substep_trajectory_consistency():
    """Roll 64 substeps with both paths from the same state: trajectories
    must stay close (accumulated fp divergence only)."""
    B = 4
    cfg, gc, gv, _ = _random_states(jax.random.PRNGKey(1), B)
    gv = 0.1 * gv
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    P = pl.params_to_lanes(pb)
    dt = cfg.simulation_dt
    tau = jnp.zeros((B, 12))
    bw = jnp.zeros((B, 6))

    def ref_roll(gc, gv):
        def body(c, _):
            gc1, gv1 = c
            qdd, _ = jax.vmap(lambda a, b, t, w: dyn.forward_dynamics(
                params, a, b, t, w, tr.flat(), cfg.contact_slip_vel))(
                gc1, gv1, tau, bw)
            out = jax.vmap(lambda a, b, q: dyn.integrate(a, b, q, dt))(gc1, gv1, qdd)
            return out, None
        (gc2, gv2), _ = jax.lax.scan(body, (gc, gv), None, length=64)
        return gc2, gv2

    def lane_roll(gcT, gvT):
        def body(c, _):
            gcT1, gvT1 = c
            out = pl.substep(P, gcT1, gvT1, tau.T, bw.T,
                             cfg.contact_slip_vel, 0.0, dt)
            return (out[0], out[1]), None
        (gcT2, gvT2), _ = jax.lax.scan(body, (gcT, gvT), None, length=64)
        return gcT2, gvT2

    gc_r, gv_r = jax.jit(ref_roll)(gc, gv)
    gc_l, gv_l = jax.jit(lane_roll)(gc.T, gv.T)
    np.testing.assert_allclose(np.asarray(gc_l.T), np.asarray(gc_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv_l.T), np.asarray(gv_r), atol=5e-2)


def test_step_batch_matches_vmap_step():
    """envs.blackpanther.step_batch == vmap(step) (same keys, lanes physics)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp

    B = 8
    cfg = config.test_default().replace(crucial=False, terrain=False)
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.vmap(lambda k: bp.env_init(cfg, k))(keys)
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (B, 12))

    ref = jax.jit(jax.vmap(lambda s, a: bp.step(cfg, s, a)))(states, actions)
    fast = jax.jit(lambda s, a: bp.step_batch(cfg, s, a))(states, actions)

    np.testing.assert_allclose(np.asarray(fast.obs), np.asarray(ref.obs),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast.reward), np.asarray(ref.reward),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(fast.done), np.asarray(ref.done))
    np.testing.assert_allclose(np.asarray(fast.state.gc), np.asarray(ref.state.gc),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast.state.gv), np.asarray(ref.state.gv),
                               atol=2e-2)


def test_substep_terrain_translation_invariance():
    """Lanes terrain support: with a constant ground height h, the dynamics
    must equal the flat-ground dynamics of a robot translated by +h (the
    physics is z-translation-invariant except through contact)."""
    B = 8
    cfg, gc, gv, tau = _random_states(jax.random.PRNGKey(3), B)
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    P = pl.params_to_lanes(pb)
    bw = jnp.zeros((B, 6))
    dt = cfg.simulation_dt
    h = -0.07

    flat_fn = jax.jit(lambda *a: pl.substep(
        P, *a, slip_vel=cfg.contact_slip_vel, impulse_scale=0.0, dt=dt))
    terr_fn = jax.jit(lambda *a: pl.substep(
        P, *a, slip_vel=cfg.contact_slip_vel, impulse_scale=0.0, dt=dt,
        ground_fn=lambda x, y: jnp.full_like(x, h)))

    gc_shift = gc.at[:, 2].add(h)
    gc2_f, gv2_f, *_ = flat_fn(gc.T, gv.T, tau.T, bw.T)
    gc2_t, gv2_t, *_ = terr_fn(gc_shift.T, gv.T, tau.T, bw.T)

    # states equal up to the rigid z shift
    np.testing.assert_allclose(np.asarray(gc2_t.T[:, 2] - h),
                               np.asarray(gc2_f.T[:, 2]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc2_t.T[:, 3:]),
                               np.asarray(gc2_f.T[:, 3:]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv2_t.T), np.asarray(gv2_f.T),
                               atol=1e-4, rtol=1e-4)


def test_substep_sampled_terrain_runs():
    """Batched sampled-heightmap lookup inside the lanes substep."""
    B = 8
    cfg, gc, gv, tau = _random_states(jax.random.PRNGKey(4), B)
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    P = pl.params_to_lanes(pb)
    tps = jax.vmap(tr.sampled_fractal)(jax.random.split(jax.random.PRNGKey(5), B))
    fn = jax.jit(lambda *a: pl.substep(
        P, *a, slip_vel=cfg.contact_slip_vel, impulse_scale=0.0,
        dt=cfg.simulation_dt, ground_fn=lambda x, y: tr.height(tps, x, y)))
    gc2, gv2, *_ = fn(gc.T, gv.T, tau.T, jnp.zeros((B, 6)).T)
    assert np.isfinite(np.asarray(gc2)).all()
    assert np.isfinite(np.asarray(gv2)).all()
