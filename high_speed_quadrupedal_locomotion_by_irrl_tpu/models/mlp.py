"""Feed-forward actor-critic (FeedForwardPolicy/MlpPolicy parity,
policies.py:395-581) with the same call surface as models.lstm so PPO can use
either recurrent or feed-forward policies interchangeably (the reference's
policy registry, policies.py:584-633, is models.registry here).

The "state" is a zero-width placeholder so rollout/BPTT code paths are shared.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.models.lstm import (
    ForwardOut, entropy, neglogp, sample, _ortho,
)


class MlpParams(NamedTuple):
    pi_layers: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # (w, b) stack
    v_layers: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]
    pi_w: jnp.ndarray
    pi_b: jnp.ndarray
    logstd: jnp.ndarray
    vf_w: jnp.ndarray
    vf_b: jnp.ndarray


def state_size(n_hidden: Sequence[int]) -> int:
    return 0


def init(key: jax.Array, obs_dim: int = 35, act_dim: int = 12,
         n_hidden: Sequence[int] = (64, 64)) -> MlpParams:
    keys = iter(jax.random.split(key, 2 * (2 * len(n_hidden) + 2)))

    def stack():
        layers, d = [], obs_dim
        for h in n_hidden:
            layers.append((_ortho(next(keys), (d, h), jnp.sqrt(2.0)), jnp.zeros(h)))
            d = h
        return tuple(layers)

    pi, v = stack(), stack()
    h_last = n_hidden[-1]
    return MlpParams(pi_layers=pi, v_layers=v,
                     pi_w=_ortho(next(keys), (h_last, act_dim), 0.01),
                     pi_b=jnp.zeros(act_dim), logstd=jnp.zeros(act_dim),
                     vf_w=_ortho(next(keys), (h_last, 1), 1.0), vf_b=jnp.zeros(1))


def _tower(layers, x):
    for w, b in layers:
        x = jnp.tanh(x @ w + b)
    return x


def forward(params: MlpParams, obs: jnp.ndarray, state: jnp.ndarray,
            done: jnp.ndarray) -> ForwardOut:
    del done
    pi_latent = _tower(params.pi_layers, obs)
    v_latent = _tower(params.v_layers, obs)
    mean = pi_latent @ params.pi_w + params.pi_b
    value = (v_latent @ params.vf_w + params.vf_b)[..., 0]
    return ForwardOut(mean=mean, value=value, state=state, logstd=params.logstd)


def sequence(params: MlpParams, obs_seq: jnp.ndarray, done_seq: jnp.ndarray,
             init_state: jnp.ndarray) -> ForwardOut:
    out = forward(params, obs_seq, init_state, done_seq)
    return ForwardOut(mean=out.mean, value=out.value, state=init_state,
                      logstd=params.logstd)


def deterministic_action(params: MlpParams, obs: jnp.ndarray,
                         state: jnp.ndarray, done: jnp.ndarray):
    out = forward(params, obs, state, done)
    return jnp.clip(out.mean, -1.0, 1.0), out.state


__all__ = ["MlpParams", "init", "forward", "sequence", "deterministic_action",
           "state_size", "sample", "neglogp", "entropy"]
