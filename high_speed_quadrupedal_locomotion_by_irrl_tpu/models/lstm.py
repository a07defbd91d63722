"""Stacked-LSTM actor-critic (the bp5 CustomLSTMPolicy) as pure pytrees.

Architecture parity with run_bp_v5.py:111-193: separate policy and value
towers, each a stack of LSTM(48) layers fed the raw 35-d observation (no MLP
trunk), a linear value head, and a DiagGaussian policy head with a learned
state-independent log-std. Gate order is [input, forget, output, candidate]
and the recurrent state layout is [c, h] per layer, pi tower then value tower
— exactly the layout of the reference's deployment runtime
(CustomerLstmNN.py:112-134, get_hidden_state :188-190) so bp5_155 CSV weights
load verbatim (models/io.py).

Rollout stepping and BPTT both go through :func:`sequence` (a ``lax.scan``
over time with done-mask state resets inside the cell, the scan-native
equivalent of batch_to_seq/lstm/seq_to_batch at policies.py:301-305).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


class LSTMWeights(NamedTuple):
    wx: jnp.ndarray  # (in, 4h)
    wh: jnp.ndarray  # (h, 4h)
    b: jnp.ndarray   # (4h,)


class PolicyParams(NamedTuple):
    pi_lstm: Tuple[LSTMWeights, ...]
    v_lstm: Tuple[LSTMWeights, ...]
    pi_w: jnp.ndarray   # (h, act)
    pi_b: jnp.ndarray   # (act,)
    logstd: jnp.ndarray  # (act,)
    vf_w: jnp.ndarray   # (h, 1)
    vf_b: jnp.ndarray   # (1,)


def state_size(n_lstm: Sequence[int]) -> int:
    """Total recurrent state (c and h for both towers): sum(n)*2*2."""
    return sum(n_lstm) * 4


def _ortho(key, shape, scale):
    a = jax.random.normal(key, shape)
    q, r = jnp.linalg.qr(a if shape[0] >= shape[1] else a.T)
    q = q * jnp.sign(jnp.diag(r))
    q = q if shape[0] >= shape[1] else q.T
    return scale * q[: shape[0], : shape[1]]


def init(key: jax.Array, obs_dim: int = 35, act_dim: int = 12,
         n_lstm: Sequence[int] = (48, 48)) -> PolicyParams:
    """Orthogonal init matching stable-baselines defaults (lstm init_scale=1,
    vf init_scale=1, pi head init_scale=0.01, logstd=0)."""
    keys = iter(jax.random.split(key, 4 * len(n_lstm) + 4))

    def make_stack():
        stack = []
        d = obs_dim
        for h in n_lstm:
            wx = _ortho(next(keys), (d, 4 * h), 1.0)
            wh = _ortho(next(keys), (h, 4 * h), 1.0)
            stack.append(LSTMWeights(wx=wx, wh=wh, b=jnp.zeros(4 * h)))
            d = h
        return tuple(stack)

    pi_stack, v_stack = make_stack(), make_stack()
    h_last = n_lstm[-1]
    return PolicyParams(
        pi_lstm=pi_stack, v_lstm=v_stack,
        pi_w=_ortho(next(keys), (h_last, act_dim), 0.01), pi_b=jnp.zeros(act_dim),
        logstd=jnp.zeros(act_dim),
        vf_w=_ortho(next(keys), (h_last, 1), 1.0), vf_b=jnp.zeros(1),
    )


def lstm_cell(w: LSTMWeights, x: jnp.ndarray, c: jnp.ndarray, h: jnp.ndarray):
    """One LSTM step, gate order [i, f, o, g] (CustomerLstmNN.py:119-126)."""
    n = w.wh.shape[0]
    gates = x @ w.wx + h @ w.wh + w.b
    i = jax.nn.sigmoid(gates[..., 0 * n:1 * n])
    f = jax.nn.sigmoid(gates[..., 1 * n:2 * n])
    o = jax.nn.sigmoid(gates[..., 2 * n:3 * n])
    g = jnp.tanh(gates[..., 3 * n:4 * n])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return c_new, h_new


def _split_state(params: PolicyParams, state: jnp.ndarray):
    """(..., S) packed state -> list of (c, h) per layer, pi then v."""
    sizes = [w.wh.shape[0] for w in params.pi_lstm] + [w.wh.shape[0] for w in params.v_lstm]
    out, off = [], 0
    for n in sizes:
        c = state[..., off:off + n]
        h = state[..., off + n:off + 2 * n]
        out.append((c, h))
        off += 2 * n
    return out


def _tower(stack, chs, x, mask):
    """Run one tower; mask resets state *before* the cell (a2c.utils.lstm)."""
    new_chs = []
    h_in = x
    for w, (c, h) in zip(stack, chs):
        keep = (1.0 - mask)[..., None]
        c, h = c * keep, h * keep
        c, h = lstm_cell(w, h_in, c, h)
        new_chs.append((c, h))
        h_in = h
    return h_in, new_chs


class ForwardOut(NamedTuple):
    mean: jnp.ndarray      # (..., act)
    value: jnp.ndarray     # (...,)
    state: jnp.ndarray     # (..., S) new packed recurrent state
    logstd: jnp.ndarray    # (act,)


def forward(params: PolicyParams, obs: jnp.ndarray, state: jnp.ndarray,
            done: jnp.ndarray) -> ForwardOut:
    """Single-step forward (act model). obs (..., 35), state (..., S),
    done (...,) — the done mask of the *previous* step resets the state."""
    chs = _split_state(params, state)
    n_pi = len(params.pi_lstm)
    mask = done.astype(obs.dtype)
    pi_latent, pi_chs = _tower(params.pi_lstm, chs[:n_pi], obs, mask)
    v_latent, v_chs = _tower(params.v_lstm, chs[n_pi:], obs, mask)
    mean = pi_latent @ params.pi_w + params.pi_b
    value = (v_latent @ params.vf_w + params.vf_b)[..., 0]
    packed = jnp.concatenate([jnp.concatenate([c, h], axis=-1)
                              for (c, h) in pi_chs + v_chs], axis=-1)
    return ForwardOut(mean=mean, value=value, state=packed, logstd=params.logstd)


def sequence(params: PolicyParams, obs_seq: jnp.ndarray, done_seq: jnp.ndarray,
             init_state: jnp.ndarray) -> ForwardOut:
    """BPTT forward over (T, B, 35) obs and (T, B) dones via lax.scan."""
    def scan_fn(state, inp):
        obs, done = inp
        out = forward(params, obs, state, done)
        return out.state, (out.mean, out.value)

    final_state, (means, values) = jax.lax.scan(scan_fn, init_state, (obs_seq, done_seq))
    return ForwardOut(mean=means, value=values, state=final_state, logstd=params.logstd)


# --- DiagGaussian distribution ops (stable-baselines distributions parity) ----

def sample(key: jax.Array, mean: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def neglogp(mean: jnp.ndarray, logstd: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    z = (action - mean) / jnp.exp(logstd)
    return (0.5 * jnp.sum(z * z, axis=-1)
            + 0.5 * LOG2PI * action.shape[-1]
            + jnp.sum(logstd, axis=-1))


def entropy(logstd: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(logstd + 0.5 * (LOG2PI + 1.0), axis=-1)


def deterministic_action(params: PolicyParams, obs: jnp.ndarray,
                         state: jnp.ndarray, done: jnp.ndarray):
    """Deployment predict: clipped deterministic action
    (CustomerLstmNN.predict clips to +-1, CustomerLstmNN.py:133-134)."""
    out = forward(params, obs, state, done)
    return jnp.clip(out.mean, -1.0, 1.0), out.state
