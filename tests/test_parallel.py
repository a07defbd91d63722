import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.parallel import mesh as pmesh
from high_speed_quadrupedal_locomotion_by_irrl_tpu.parallel import train as ptrain
import pytest

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_distributed_update_runs_and_matches_semantics():
    mesh = pmesh.make_mesh()
    env_cfg = config.train_default().replace(
        num_envs=16, simulation_dt=0.001, obs_noise=0.0, stochastic_dynamics=False)
    ppo_cfg = ppo.PPOConfig(n_steps=3, noptepochs=1, nminibatches=1, n_lstm=(8, 8))

    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    ts_sharded = ptrain.shard_train_state(mesh, ts)
    update = ptrain.make_distributed_update(env_cfg, ppo_cfg, mesh)
    ts2, metrics = update(ts_sharded)
    assert np.isfinite(float(metrics["loss"]))

    # sharded result == single-device result (same keys, same math)
    update_local = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    _, metrics_local = update_local(ts)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics_local["loss"]),
                               rtol=2e-4)


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft", "/root/repo/__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(4)


def test_distributed_srb_matches_single_device():
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb

    mesh = pmesh.make_mesh()
    env_cfg = config.test_default()
    scfg = srb.SRBConfig(horizon=8)
    cmds = jnp.stack([jnp.array([0.5 + 0.25 * i, 0.0, 0.0]) for i in range(16)])
    probs = jax.vmap(lambda c: srb.standing_problem(env_cfg, c))(cmds)
    sharded = jax.device_put(
        probs, jax.tree.map(lambda _: pmesh.data_sharding(mesh), probs))

    solve = ptrain.make_distributed_srb(env_cfg, scfg, mesh)
    res = solve(sharded)
    local = jax.jit(lambda p: srb.batched_solve(env_cfg, scfg, p))(probs)
    np.testing.assert_allclose(np.asarray(res.cost), np.asarray(local.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(local.us),
                               atol=1e-5)
