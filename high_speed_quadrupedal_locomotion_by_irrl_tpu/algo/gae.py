"""Generalized advantage estimation as a reverse lax.scan.

Same recursion as the reference's backward Python loop (ppo2.py:554-568):
delta_t = r_t + gamma * V_{t+1} * (1 - d_t) - V_t,
A_t = delta_t + gamma * lam * (1 - d_t) * A_{t+1},
where d_t is the done flag *produced by* step t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def advantages(rewards: jnp.ndarray, values: jnp.ndarray, dones_after: jnp.ndarray,
               last_value: jnp.ndarray, gamma: float, lam: float):
    """rewards/values/dones_after: (T, B); last_value: (B,).

    Returns (advantages (T,B), returns (T,B) = adv + values).
    """
    nonterminal = 1.0 - dones_after.astype(rewards.dtype)
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)

    def scan_fn(carry, inp):
        r, v, v_next, nt = inp
        delta = r + gamma * v_next * nt - v
        adv = delta + gamma * lam * nt * carry
        return adv, adv

    _, advs = jax.lax.scan(scan_fn, jnp.zeros_like(last_value),
                           (rewards, values, next_values, nonterminal), reverse=True)
    return advs, advs + values
