"""Component-level timing of the MPC hot path on the current JAX device."""
import time, functools, jax, jax.numpy as jnp
from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl, dynamics as dyn, terrain as tr

cfg = config.test_default().replace(obs_noise=0.0)
params = mdl.nominal_params(cfg)
B = 12544  # = 256 problems x 49 tangents, the linearization round width

def timeit(name, fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:8.2f} ms  ({B/dt/1e6:6.2f} M evals/s)", flush=True)
    return dt

x0 = trot.standing_x0(cfg)
gcs = jnp.broadcast_to(x0[:19], (B, 19))
gvs = jnp.broadcast_to(x0[19:], (B, 18))
taus = jnp.zeros((B, 12))
flat = tr.flat()

timeit("fk", jax.vmap(lambda gc: dyn.fk(params, gc).toe_pos), gcs)
timeit("mass_matrix", jax.vmap(lambda gc: dyn.mass_matrix(params, dyn.fk(params, gc))), gcs)
timeit("fwd_dyn primal (native)", jax.vmap(lambda gc, gv, t: dyn.forward_dynamics(
    params, gc, gv, t, jnp.zeros(6), flat, 0.1, solver="native")[0]), gcs, gvs, taus)
timeit("fwd_dyn primal (unrolled)", jax.vmap(lambda gc, gv, t: dyn.forward_dynamics(
    params, gc, gv, t, jnp.zeros(6), flat, 0.1, solver="unrolled")[0]), gcs, gvs, taus)

# one full linearization knot: 256 problems x jacfwd(49 tangents) through 2 substeps
mpc_cfg = trot.MPCConfig(horizon=50, n_iter=8, model_substeps=2)
step = trot.make_dynamics(cfg, mpc_cfg, params)
P = 256
xs = jnp.broadcast_to(x0, (P, 37))
us = jnp.zeros((P, 12))
ts = jnp.zeros((P,), jnp.int32)
jac = jax.vmap(jax.jacfwd(step, argnums=(0, 1)))
d = timeit("jacfwd knot (256 problems)", jac, xs, us, ts, n=5)
print(f"-> full solve estimate: 8 iters x 50 knots x {d*1e3:.1f} ms = {8*50*d:.1f} s per 256 batch")

# forward rollout step (8 alphas x 256 problems)
xr = jnp.broadcast_to(x0, (8 * P, 37))
ur = jnp.zeros((8 * P, 12))
tr_ = jnp.zeros((8 * P,), jnp.int32)
timeit("rollout knot (8a x 256p)", jax.vmap(step), xr, ur, tr_)
