"""Two-process localhost jax.distributed smoke test (the multi-host path).

The reference has no multi-host anything (SURVEY.md section 5.8); our
parallel/mesh.init_distributed wraps jax.distributed.initialize for DCN
scale-out. This test brings up a real 2-process coordinator on localhost
(CPU backend, 2 virtual devices per process = 4 global devices), shards a
batch across the *global* mesh, computes a data-parallel gradient of the
actual policy network in each process, and asserts both processes agree
with the single-process value — the sharded update matches local numerics
across a process boundary, not just across devices in one process.
"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# NOTE: do NOT touch jax.config / jax.devices before initialize() below —
# jax.distributed must come first; the worker env strips the axon TPU
# plugin (sitecustomize on PYTHONPATH) so JAX_PLATFORMS=cpu sticks.
import jax
# load parallel/mesh.py standalone: the package root import would build
# jnp constants (model tables) and initialise the backend, which must not
# happen before jax.distributed.initialize
import importlib.util
repo = os.environ["IRRL_REPO"]
spec = importlib.util.spec_from_file_location(
    "pmesh", os.path.join(repo, "high_speed_quadrupedal_locomotion_by_irrl_tpu",
                          "parallel", "mesh.py"))
pmesh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pmesh)

pmesh.init_distributed(f"localhost:{port}", 2, pid)

import jax.numpy as jnp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = pmesh.make_mesh()
B = 8
obs_np = (jnp.arange(B * 35, dtype=jnp.float32).reshape(B, 35) % 7) / 7.0
sharding = pmesh.data_sharding(mesh)
obs = jax.make_array_from_callback((B, 35), sharding,
                                   lambda idx: obs_np[idx])
params = lstm.init(jax.random.PRNGKey(0), 35, 12, (48, 48))
state0 = jnp.zeros((B, lstm.state_size((48, 48))))
dones = jnp.zeros((B,))

def loss(p, o):
    out = lstm.forward(p, o, state0, dones)
    return jnp.mean(out.value ** 2) + jnp.mean(out.mean ** 2)

gfn = jax.jit(jax.grad(loss), in_shardings=(pmesh.replicated(mesh), sharding),
              out_shardings=pmesh.replicated(mesh))
g = gfn(params, obs)
total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
val = float(jax.jit(loss, in_shardings=(pmesh.replicated(mesh), sharding))(params, obs))
print(f"GRADSUM {total:.10f} LOSS {val:.10f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_grad_matches_local(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # PYTHONPATH = repo only: drops the axon TPU plugin's sitecustomize so
    # the workers are pure-CPU processes (no TPU contention, and no backend
    # init before jax.distributed.initialize)
    env = {**os.environ, "PYTHONPATH": REPO, "IRRL_REPO": REPO}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    vals = []
    for out in outs:
        m = re.search(r"GRADSUM ([0-9.eE+-]+) LOSS ([0-9.eE+-]+)", out)
        assert m, out
        vals.append((float(m.group(1)), float(m.group(2))))
    # both processes computed the same replicated gradient
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)

    # single-process reference (under the conftest's 8-device CPU backend)
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
    B = 8
    obs = (jnp.arange(B * 35, dtype=jnp.float32).reshape(B, 35) % 7) / 7.0
    params = lstm.init(jax.random.PRNGKey(0), 35, 12, (48, 48))
    state0 = jnp.zeros((B, lstm.state_size((48, 48))))
    dones = jnp.zeros((B,))

    def loss(p, o):
        out = lstm.forward(p, o, state0, dones)
        return jnp.mean(out.value ** 2) + jnp.mean(out.mean ** 2)

    g = jax.grad(loss)(params, obs)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    val = float(loss(params, obs))
    np.testing.assert_allclose(vals[0], (total, val), rtol=1e-5)
