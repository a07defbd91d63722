"""Latency-injection tool (capability parity with IRRL/script/utils/DelayTool.py).

The reference emulates sensor/actuation latency with a FIFO of
``delay_time/dt`` slots (DelayTool.py:5-23). Here the FIFO is a fixed-size
ring buffer carried as a pytree so it can live inside ``jit``/``scan`` —
enabling the Figure-4 speed-vs-latency sweeps to run fully on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DelayState(NamedTuple):
    buf: jnp.ndarray   # (slots, dim)
    idx: jnp.ndarray   # () int32, next write position


def delay_init(delay_time: float, dt: float, dim: int, fill: jnp.ndarray | None = None) -> DelayState:
    slots = max(1, int(round(delay_time / dt)) + 1)
    buf = jnp.zeros((slots, dim)) if fill is None else jnp.tile(fill, (slots, 1))
    return DelayState(buf=buf, idx=jnp.zeros((), jnp.int32))


def delay_step(state: DelayState, x: jnp.ndarray) -> tuple[DelayState, jnp.ndarray]:
    """Push x, pop the oldest entry (delayed by (slots-1)*dt)."""
    slots = state.buf.shape[0]
    out = state.buf[state.idx]
    buf = state.buf.at[state.idx].set(x)
    return DelayState(buf=buf, idx=(state.idx + 1) % slots), out
