"""Procedural terrain as a pure height function.

The reference builds a 500x20 m fractal heightmap through Raisim
(zScale 0.1, 3 octaves, lacunarity 2, gain 0.25 — Environment.hpp:252-265).
A sampled heightmap would force gather-heavy lookups on TPU; instead the same
statistics come from analytic fractal value noise evaluated at query points,
which vmaps over environments (per-env seed) and differentiates cleanly for
surface normals.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


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


def height(tp: TerrainParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Terrain height at (x, y); broadcasts over point batches."""
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
