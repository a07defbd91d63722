"""Pallas physics-substep kernel vs the lanes path (interpret mode on CPU).

On real TPU hardware the kernel compiles ~40x faster than XLA does for the
same scalar graph but currently runs slower (Mosaic does not register-allocate
the flat 20k-op graph); see ops/phys_pallas.py notes. Correctness is what
these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_lanes as pl_
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_pallas as pp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
import pytest

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def test_pallas_substep_matches_lanes_interpret():
    B = pp.BLOCK  # one grid block
    cfg = config.test_default()
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    P = pl_.params_to_lanes(pb)
    key = jax.random.PRNGKey(0)
    gc = jnp.broadcast_to(mdl.stand_gc(0.0).at[2].set(0.3), (B, 19)) \
        + 0.02 * jax.random.normal(key, (B, 19))
    gc = gc.at[:, 3:7].set(gc[:, 3:7] / jnp.linalg.norm(gc[:, 3:7], axis=-1,
                                                        keepdims=True))
    gv = 0.3 * jax.random.normal(key, (B, 18))
    tau = 3.0 * jax.random.normal(key, (B, 12))
    bw = jnp.zeros((B, 6))
    dt = cfg.simulation_dt

    a = pl_.substep(P, gc.T, gv.T, tau.T, bw.T, cfg.contact_slip_vel, 0.0, dt)
    b = pp.substep(P, gc.T, gv.T, tau.T, bw.T, cfg.contact_slip_vel, 0.0, dt,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), atol=1e-5)  # gc
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), atol=1e-3)  # gv
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]), atol=1e-5)  # toe
    # force norms: fp-association noise on multi-newton magnitudes
    np.testing.assert_allclose(np.asarray(b[4]), np.asarray(a[4]),
                               atol=5e-3, rtol=1e-4)


def test_pallas_substep_pads_partial_block():
    """A non-multiple-of-BLOCK batch must round-trip through the padding."""
    B = 37
    cfg = config.test_default()
    params = mdl.nominal_params(cfg)
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    P = pl_.params_to_lanes(pb)
    gc = jnp.broadcast_to(mdl.stand_gc(0.0).at[2].set(0.3), (B, 19))
    gv = jnp.zeros((B, 18))
    out = pp.substep(P, gc.T, gv.T, jnp.zeros((B, 12)).T, jnp.zeros((B, 6)).T,
                     cfg.contact_slip_vel, 0.0, cfg.simulation_dt,
                     interpret=True)
    assert out[0].shape == (19, B)
    assert np.all(np.isfinite(np.asarray(out[0])))
