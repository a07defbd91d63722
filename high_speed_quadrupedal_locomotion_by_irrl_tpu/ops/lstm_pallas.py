"""Fused LSTM cell as a Pallas TPU kernel.

One VMEM-resident pass computes both input/recurrent matmuls (MXU), the bias
add, all four gate nonlinearities and the state update (VPU) for a batch tile
— removing the HBM round-trips XLA would otherwise schedule between the gate
matmul and the elementwise tail for large env batches. Used by the rollout
path when batch size and platform allow; falls back to the pure-jnp cell
(models.lstm.lstm_cell) elsewhere, and both paths are tested against each
other (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from high_speed_quadrupedal_locomotion_by_irrl_tpu.models.lstm import LSTMWeights, lstm_cell

_BATCH_TILE = 256


def _kernel(x_ref, h_ref, c_ref, wx_ref, wh_ref, b_ref, h_out_ref, c_out_ref):
    gates = (jnp.dot(x_ref[:], wx_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
             + b_ref[:])
    n = h_ref.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * n:1 * n])
    f = jax.nn.sigmoid(gates[:, 1 * n:2 * n])
    o = jax.nn.sigmoid(gates[:, 2 * n:3 * n])
    g = jnp.tanh(gates[:, 3 * n:4 * n])
    c_new = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c_new)
    c_out_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_lstm_cell(w: LSTMWeights, x: jnp.ndarray, c: jnp.ndarray,
                    h: jnp.ndarray, interpret: bool = False):
    """(c_new, h_new) — drop-in for models.lstm.lstm_cell on 2D batches."""
    B = x.shape[0]
    n = w.wh.shape[0]
    d = x.shape[1]
    tile = min(_BATCH_TILE, B)
    grid = (pl.cdiv(B, tile),)
    h_new, c_new = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 4 * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 4 * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), x.dtype),
            jax.ShapeDtypeStruct((B, n), x.dtype),
        ],
        interpret=interpret,
    )(x, h, c, w.wx, w.wh, w.b)
    return c_new, h_new


def lstm_cell_auto(w: LSTMWeights, x: jnp.ndarray, c: jnp.ndarray, h: jnp.ndarray):
    """Pallas on TPU for reasonable batches, pure-jnp fallback otherwise."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and x.ndim == 2 and x.shape[0] >= 8:
        return fused_lstm_cell(w, x, c, h)
    return lstm_cell(w, x, c, h)
