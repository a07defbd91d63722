"""Multi-chip PPO training and MPC solving.

Shardings: every leaf of the batched EnvState / rollout batch carries the env
axis first and is sharded over the mesh's data axis; PolicyParams, optimizer
state, and scalars are replicated. Under `jit` XLA then lowers the PPO
gradient reduction and metric means to `psum` over ICI — no hand-written
collectives needed for the data-parallel regime this model family requires
(the 37k-param LSTM never warrants TP/PP; see SURVEY.md section 2.4).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.parallel import mesh as pmesh


def _train_state_shardings(mesh: Mesh, ts: ppo.TrainState) -> ppo.TrainState:
    data = pmesh.data_sharding(mesh)
    repl = pmesh.replicated(mesh)
    return ppo.TrainState(
        params=jax.tree.map(lambda _: repl, ts.params),
        opt_state=jax.tree.map(lambda _: repl, ts.opt_state),
        env_state=jax.tree.map(lambda _: data, ts.env_state),
        lstm_state=data, obs=data, dones=data, key=repl, update_idx=repl)


def shard_train_state(mesh: Mesh, ts: ppo.TrainState) -> ppo.TrainState:
    sh = _train_state_shardings(mesh, ts)
    return jax.tree.map(jax.device_put, ts, sh)


def make_distributed_update(env_cfg: EnvConfig, ppo_cfg: ppo.PPOConfig,
                            mesh: Mesh) -> Callable:
    """jit the full PPO update with env-batch sharded / params replicated."""
    assert env_cfg.num_envs % mesh.devices.size == 0, \
        "num_envs must divide evenly across the mesh"
    update = ppo.make_update_fn(env_cfg, ppo_cfg)
    ts0 = jax.eval_shape(
        lambda k: ppo.init_train_state(env_cfg, ppo_cfg, k), jax.random.PRNGKey(0))
    sh = _train_state_shardings(mesh, ts0)
    repl = pmesh.replicated(mesh)
    # every metric is a replicated scalar; derive the keys from the update's
    # own output structure so new metrics never desync this spec
    _, metrics0 = jax.eval_shape(update, ts0)
    metric_sh = jax.tree.map(lambda _: repl, metrics0)
    return jax.jit(update, in_shardings=(sh,), out_shardings=(sh, metric_sh))


def make_distributed_mpc(env_cfg: EnvConfig, mpc_cfg: trot.MPCConfig,
                         mesh: Mesh) -> Callable:
    """jit the batched trot-MPC solve with the scenario axis sharded."""
    data = pmesh.data_sharding(mesh)
    fn = functools.partial(trot.batched_solve, env_cfg, mpc_cfg)
    return jax.jit(fn, in_shardings=(jax.tree.map(lambda _: data, _params_struct()),
                                     jax.tree.map(lambda _: data, _prob_struct(env_cfg, mpc_cfg))),
                   out_shardings=data)


def make_distributed_srb(env_cfg: EnvConfig, scfg, mesh: Mesh) -> Callable:
    """jit the convex SRB trot-MPC (mpc/srb.py) with scenarios sharded over
    the mesh's data axis — the pod-scale path of the headline solver."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb

    data = pmesh.data_sharding(mesh)
    prob_struct = srb.standing_problem(env_cfg, jnp.zeros(3))
    fn = functools.partial(srb.batched_solve, env_cfg, scfg)
    return jax.jit(fn, in_shardings=(jax.tree.map(lambda _: data, prob_struct),),
                   out_shardings=data)


def _params_struct():
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
    return mdl.nominal_params()


def _prob_struct(env_cfg, mpc_cfg):
    return trot.make_problem(env_cfg, jnp.zeros(19), jnp.zeros(18),
                             jnp.zeros(3), jnp.zeros(()), mpc_cfg.horizon)
