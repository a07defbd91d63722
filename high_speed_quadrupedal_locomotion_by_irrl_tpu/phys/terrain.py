"""Procedural terrain as a pure height function.

The reference builds a 500x20 m fractal heightmap through Raisim
(frequency 1, zScale 0.1, 5000x500 samples, 3 octaves, lacunarity 2,
gain 0.25 — Environment.hpp:252-265). Two equivalent representations:

- :class:`TerrainParams` — analytic fractal value noise evaluated at query
  points (no gathers; differentiates cleanly for normals);
- :class:`SampledTerrain` — a true sampled heightmap with the reference's
  exact grid (5000x500 over 500x20 m) and bilinear lookup, matching
  Raisim's piecewise-bilinear ground. The grid is built once (host-side
  numpy, cached) and shared by all environments; per-env decorrelation
  comes from a random (x, y) offset into the map instead of per-env grids
  (200 envs x 10 MB grids would be pure HBM waste for identical statistics).

Both implement ``height``/``normal`` and vmap over environments.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TerrainParams(NamedTuple):
    z_scale: jnp.ndarray   # () 0.0 => flat ground
    seed: jnp.ndarray      # () float, decorrelates envs


def flat() -> TerrainParams:
    return TerrainParams(z_scale=jnp.asarray(0.0), seed=jnp.asarray(0.0))


def fractal(key: jax.Array, z_scale: float = 0.1) -> TerrainParams:
    seed = jax.random.uniform(key, (), minval=0.0, maxval=1000.0)
    return TerrainParams(z_scale=jnp.asarray(z_scale), seed=seed)


def _hash2(ix: jnp.ndarray, iy: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    h = jnp.sin(ix * 127.1 + iy * 311.7 + seed * 74.7) * 43758.5453
    return (h - jnp.floor(h)) * 2.0 - 1.0


def _value_noise(x: jnp.ndarray, y: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    ix, iy = jnp.floor(x), jnp.floor(y)
    fx, fy = x - ix, y - iy
    # smootherstep keeps C2 continuity so normals are well-defined
    sx = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    sy = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)
    v00 = _hash2(ix, iy, seed)
    v10 = _hash2(ix + 1, iy, seed)
    v01 = _hash2(ix, iy + 1, seed)
    v11 = _hash2(ix + 1, iy + 1, seed)
    return (v00 * (1 - sx) * (1 - sy) + v10 * sx * (1 - sy)
            + v01 * (1 - sx) * sy + v11 * sx * sy)


class SampledTerrain(NamedTuple):
    """Raisim-style sampled heightmap (Environment.hpp:252-265 properties).

    The robot never leaves a ~10 m neighbourhood in one episode, so one
    shared 500x20 m grid with a per-env offset reproduces the reference's
    independent per-env heightmaps statistically. Only the per-env fields
    live in this pytree — the grid itself is a trace-time constant
    (_fractal_grid), so vmapping environments does NOT replicate the 10 MB
    grid per env."""
    offset: jnp.ndarray    # (2,) per-env world-to-map offset [m]
    cell: jnp.ndarray      # () grid spacing [m]
    z_scale: jnp.ndarray   # () height scale (DR-able)


@functools.lru_cache(maxsize=2)
def _fractal_grid(nx: int = 5000, ny: int = 500, sx: float = 500.0,
                  sy: float = 20.0, z_scale: float = 1.0,
                  seed: float = 12.5) -> np.ndarray:
    """Host-side fractal value-noise grid with the reference's terrain
    statistics (xSamples/ySamples/octaves/lacunarity/gain of
    Environment.hpp:254-262). Built once (unscaled), baked as a constant."""
    xs = np.linspace(0.0, sx, nx, dtype=np.float64)
    ys = np.linspace(0.0, sy, ny, dtype=np.float64)
    X, Y = np.meshgrid(xs, ys)

    def hash2(ix, iy):
        h = np.sin(ix * 127.1 + iy * 311.7 + seed * 74.7) * 43758.5453
        return (h - np.floor(h)) * 2.0 - 1.0

    def vnoise(x, y):
        ix, iy = np.floor(x), np.floor(y)
        fx, fy = x - ix, y - iy
        s = lambda f: f * f * f * (f * (f * 6.0 - 15.0) + 10.0)  # noqa: E731
        sx_, sy_ = s(fx), s(fy)
        return (hash2(ix, iy) * (1 - sx_) * (1 - sy_)
                + hash2(ix + 1, iy) * sx_ * (1 - sy_)
                + hash2(ix, iy + 1) * (1 - sx_) * sy_
                + hash2(ix + 1, iy + 1) * sx_ * sy_)

    h = np.zeros_like(X)
    freq, gain = 1.0, 1.0
    for _ in range(3):           # fractalOctaves=3
        h += gain * vnoise(X * freq, Y * freq)
        freq *= 2.0              # fractalLacunarity
        gain *= 0.25             # fractalGain
    return (z_scale * h).astype(np.float32)


def sampled_fractal(key: jax.Array, z_scale: float = 0.1) -> SampledTerrain:
    """Per-env sampled-heightmap terrain (shared grid, random offset)."""
    ny, nx = _fractal_grid().shape
    cell = 500.0 / (nx - 1)
    lim = jnp.array([(nx - 1) * cell * 0.4, (ny - 1) * cell * 0.4])
    center = jnp.array([(nx - 1) * cell / 2, (ny - 1) * cell / 2])
    offset = center + jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0) * lim
    return SampledTerrain(offset=offset, cell=jnp.asarray(cell),
                          z_scale=jnp.asarray(z_scale))


def _sampled_height(tp: SampledTerrain, x: jnp.ndarray, y: jnp.ndarray):
    g = jnp.asarray(_fractal_grid())          # shared trace-time constant
    ny, nx = g.shape
    # [..., k] keeps this correct for both a single env ((2,) offset) and a
    # batched-in-lanes call ((B, 2) offsets against (B,) query points)
    gx = jnp.clip((x + tp.offset[..., 0]) / tp.cell, 0.0, nx - 1.001)
    gy = jnp.clip((y + tp.offset[..., 1]) / tp.cell, 0.0, ny - 1.001)
    ix, iy = jnp.floor(gx).astype(jnp.int32), jnp.floor(gy).astype(jnp.int32)
    fx, fy = gx - ix, gy - iy
    h00 = g[iy, ix]
    h10 = g[iy, ix + 1]
    h01 = g[iy + 1, ix]
    h11 = g[iy + 1, ix + 1]
    return tp.z_scale * (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                         + h01 * (1 - fx) * fy + h11 * fx * fy)


def height(tp, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Terrain height at (x, y); broadcasts over point batches."""
    if isinstance(tp, SampledTerrain):
        return _sampled_height(tp, x, y)
    h = jnp.zeros_like(x)
    freq, gain = 1.0, 1.0
    for _ in range(3):  # fractalOctaves=3 (Environment.hpp:261)
        h = h + gain * _value_noise(x * freq, y * freq, tp.seed)
        freq *= 2.0   # fractalLacunarity
        gain *= 0.25  # fractalGain
    return tp.z_scale * h


def normal(tp: TerrainParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normal; (0,0,1) on flat ground."""
    eps = 1e-3
    dhdx = (height(tp, x + eps, y) - height(tp, x - eps, y)) / (2 * eps)
    dhdy = (height(tp, x, y + eps) - height(tp, x, y - eps)) / (2 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(x)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
