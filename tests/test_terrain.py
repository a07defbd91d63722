"""Sampled-heightmap terrain tests (phys/terrain.py).

The sampled grid mirrors Raisim's TerrainProperties (Environment.hpp:252-265):
500x20 m, 5000x500 samples, 3 octaves, lacunarity 2, gain 0.25, zScale 0.1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr


def test_fractal_grid_reference_properties():
    g = tr._fractal_grid()
    assert g.shape == (500, 5000)          # ySamples x xSamples
    # fractal sum of value noise in [-1,1] with gains 1+0.25+0.0625
    assert np.abs(g).max() <= 1.3125 + 1e-5
    assert g.std() > 0.05                  # actually rough, not near-flat


def test_sampled_height_matches_grid_nodes():
    tp = tr.SampledTerrain(offset=jnp.zeros(2), cell=jnp.asarray(0.1),
                           z_scale=jnp.asarray(0.1))
    g = tr._fractal_grid()
    # query exactly at grid nodes (x = ix*cell, y = iy*cell)
    for ix, iy in [(0, 0), (10, 7), (499, 123), (2000, 400)]:
        h = float(tr.height(tp, jnp.asarray(ix * 0.1), jnp.asarray(iy * 0.1)))
        assert abs(h - 0.1 * g[iy, ix]) < 1e-5


def test_sampled_height_bilinear_between_nodes():
    tp = tr.SampledTerrain(offset=jnp.zeros(2), cell=jnp.asarray(0.1),
                           z_scale=jnp.asarray(1.0))
    g = tr._fractal_grid()
    h = float(tr.height(tp, jnp.asarray(1.05), jnp.asarray(2.05)))
    corners = [g[20, 10], g[20, 11], g[21, 10], g[21, 11]]
    assert min(corners) - 1e-6 <= h <= max(corners) + 1e-6
    # midpoint = average of the 4 corners for bilinear
    assert abs(h - np.mean(corners)) < 1e-5


def test_sampled_offset_shifts_the_map():
    tp0 = tr.SampledTerrain(offset=jnp.zeros(2), cell=jnp.asarray(0.1),
                            z_scale=jnp.asarray(0.1))
    tp1 = tr.SampledTerrain(offset=jnp.asarray([3.0, 1.0]),
                            cell=jnp.asarray(0.1), z_scale=jnp.asarray(0.1))
    h0 = float(tr.height(tp0, jnp.asarray(5.0), jnp.asarray(2.0)))
    h1 = float(tr.height(tp1, jnp.asarray(2.0), jnp.asarray(1.0)))
    assert abs(h0 - h1) < 1e-6             # same map point


def test_sampled_terrain_vmaps_over_envs():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    tps = jax.vmap(tr.sampled_fractal)(keys)
    assert tps.offset.shape == (8, 2)
    # batched lookup: (B,) points against (B, 2) offsets
    x = jnp.linspace(0.0, 1.0, 8)
    h = tr.height(tps, x, x)
    assert h.shape == (8,)
    # per-env decorrelation: different offsets -> different heights
    assert np.asarray(h).std() > 1e-4


def test_sampled_normal_is_unit_and_tilted():
    tp = tr.SampledTerrain(offset=jnp.zeros(2), cell=jnp.asarray(0.1),
                           z_scale=jnp.asarray(0.1))
    n = np.asarray(tr.normal(tp, jnp.asarray(1.23), jnp.asarray(2.34)))
    assert abs(np.linalg.norm(n) - 1.0) < 1e-5
    assert n[2] > 0.9                      # gentle slopes at zScale 0.1


def test_flat_unchanged():
    tp = tr.flat()
    assert float(tr.height(tp, jnp.asarray(3.0), jnp.asarray(4.0))) == 0.0
    n = np.asarray(tr.normal(tp, jnp.asarray(3.0), jnp.asarray(4.0)))
    np.testing.assert_allclose(n, [0.0, 0.0, 1.0], atol=1e-6)
