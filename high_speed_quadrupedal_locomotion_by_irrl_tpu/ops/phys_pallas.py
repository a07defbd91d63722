"""Pallas TPU kernel wrapping the batch-in-lanes physics substep.

ops/phys_lanes.py expresses one physics substep as ~20k scalar ops where each
"scalar" is a batch vector. Jitting that graph through XLA gives a 4-5x
runtime win over the vmap path but XLA's fusion search over the huge flat
graph costs tens of minutes of compile time. This kernel hands the same
graph to Mosaic instead: every scalar is one full (8, 128) VPU tile
(batch = 1024 per grid step), the whole substep lives in VMEM/registers, and
there is nothing for a fusion pass to search over.

Layout: all per-env rows are packed as (rows, NB, 8, 128) — row-major state
components, grid over NB batch blocks of 1024 envs. The wrapper
(:func:`substep`) takes the same (rows, B) arrays as phys_lanes.substep and
handles packing/padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_lanes as lanes

BLOCK = 1024  # envs per grid step: one (8, 128) tile per scalar
_SUB = (8, 128)

# packed param layout: mass(13) com(13*3) inertia(13*9) joint_origin(12*3)
# friction kn dn -> 208 rows
_P_ROWS = 13 + 39 + 117 + 36 + 3
_IN_ROWS = 19 + 18 + 12 + 6                      # gc gv tau bw
_OUT_ROWS = 19 + 18 + 12 + 12 + 4 + 4            # gc' gv' toe toe_vel fnorm fn


def pack_params(P: lanes.LaneParams, B: int) -> jnp.ndarray:
    """LaneParams -> (208, B) f32."""
    rows = []
    bcast = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (B,))
    for b in range(13):
        rows.append(bcast(P.mass[b]))
    for b in range(13):
        for i in range(3):
            rows.append(bcast(P.com[b][i]))
    for b in range(13):
        for i in range(3):
            for j in range(3):
                rows.append(bcast(P.inertia[b][i][j]))
    for j in range(12):
        for i in range(3):
            rows.append(bcast(P.joint_origin[j][i]))
    rows += [bcast(P.friction), bcast(P.kn), bcast(P.dn)]
    return jnp.stack(rows)


def _unpack_params(pref) -> lanes.LaneParams:
    """(208, 8, 128) block -> LaneParams with (8,128) leaves."""
    r = [pref[i, 0] for i in range(_P_ROWS)]
    k = 0
    mass = r[k:k + 13]; k += 13
    com = [[r[k + 3 * b + i] for i in range(3)] for b in range(13)]; k += 39
    inertia = [[[r[k + 9 * b + 3 * i + j] for j in range(3)] for i in range(3)]
               for b in range(13)]; k += 117
    jo = [[r[k + 3 * j + i] for i in range(3)] for j in range(12)]; k += 36
    return lanes.LaneParams(mass=mass, com=com, inertia=inertia, joint_origin=jo,
                            friction=r[k], kn=r[k + 1], dn=r[k + 2])


def _kernel(slip_vel, impulse_scale, dt, p_ref, x_ref, o_ref):
    P = _unpack_params(p_ref)
    g = [x_ref[i, 0] for i in range(19)]
    v = [x_ref[19 + i, 0] for i in range(18)]
    tau = [x_ref[37 + i, 0] for i in range(12)]
    bw = [x_ref[49 + i, 0] for i in range(6)]
    g2, v2, diag = lanes.substep_lanes(P, g, v, tau, bw, slip_vel,
                                       impulse_scale, dt)
    for i in range(19):
        o_ref[i, 0] = g2[i]
    for i in range(18):
        o_ref[19 + i, 0] = v2[i]
    for leg in range(4):
        for i in range(3):
            o_ref[37 + 3 * leg + i, 0] = diag.toe[leg][i]
            o_ref[49 + 3 * leg + i, 0] = diag.toe_vel[leg][i]
    for leg in range(4):
        o_ref[61 + leg, 0] = diag.toe_force_norm[leg]
        o_ref[65 + leg, 0] = diag.toe_normal_force[leg]


@functools.partial(jax.jit,
                   static_argnames=("slip_vel", "impulse_scale", "dt", "interpret"))
def substep_packed(packed_params: jnp.ndarray, packed_in: jnp.ndarray,
                   slip_vel: float, impulse_scale: float, dt: float,
                   interpret: bool = False) -> jnp.ndarray:
    """(208, NB, 8, 128), (55, NB, 8, 128) -> (69, NB, 8, 128)."""
    nb = packed_in.shape[1]
    kern = functools.partial(_kernel, slip_vel, impulse_scale, dt)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, nb) + _SUB, jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_P_ROWS, 1) + _SUB, lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_IN_ROWS, 1) + _SUB, lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_OUT_ROWS, 1) + _SUB, lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed_params, packed_in)


def _to_blocks(x: jnp.ndarray, B_pad: int) -> jnp.ndarray:
    """(rows, B) -> (rows, NB, 8, 128), zero-padded."""
    rows, B = x.shape
    x = jnp.pad(x, ((0, 0), (0, B_pad - B)))
    return x.reshape(rows, B_pad // BLOCK, 8, 128)


def substep(P: lanes.LaneParams, gcT, gvT, tauT, bwT,
            slip_vel: float, impulse_scale: float, dt: float,
            interpret: bool = False):
    """Drop-in equivalent of phys_lanes.substep running as a Pallas kernel."""
    B = gcT.shape[1]
    B_pad = -(-B // BLOCK) * BLOCK
    packed_in = _to_blocks(
        jnp.concatenate([gcT, gvT, tauT, bwT], axis=0).astype(jnp.float32), B_pad)
    pp = _to_blocks(pack_params(P, B), B_pad)
    out = substep_packed(pp, packed_in, slip_vel, impulse_scale, dt,
                         interpret=interpret)
    out = out.reshape(_OUT_ROWS, B_pad)[:, :B]
    gc2, gv2 = out[:19], out[19:37]
    toe = out[37:49].reshape(4, 3, B)
    toe_vel = out[49:61].reshape(4, 3, B)
    fnorm, fnormal = out[61:65], out[65:69]
    return gc2, gv2, toe, toe_vel, fnorm, fnormal
