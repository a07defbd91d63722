"""Phase-level timing of the SRB trot-MPC solve (assembly / backward / forward).

Where do the 33.5 ms at batch 1024/h50 go after the unrolled-Cholesky swap?
Each phase is jitted separately on representative inputs; the full solve is
timed alongside so phase sums can be sanity-checked against it (separately
jitted phases lose cross-phase fusion, so the sum overshoots a little).

Usage: python scripts/profile_srb.py [batch] [horizon]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = config.test_default()
    scfg = srb.SRBConfig(horizon=T)

    cmds = jnp.stack([jnp.array([1.0 + 4.0 * (i % 17) / 16.0, 0.0, 0.0])
                      for i in range(B)])
    t0s = jnp.arange(B) * 0.003
    probs = jax.vmap(lambda c, t: srb.standing_problem(cfg, c, t))(cmds, t0s)

    full = jax.jit(lambda p: srb.batched_solve(cfg, scfg, p).cost)
    dt_full = timeit(full, probs)
    print(f"full solve: {dt_full*1e3:.2f} ms ({B/dt_full:.0f} solves/s)",
          flush=True)

    m, I_body = srb._srb_constants(cfg.abad)
    m = jnp.asarray(m)
    I_inv = jnp.asarray(np.linalg.inv(I_body))
    dt = cfg.control_dt * scfg.decimation

    def assemble(p):
        ts = p.t0[:, None] + jnp.arange(T)[None] * dt
        yaw = p.yaw0[:, None] + p.command[:, 2:3] * jnp.arange(T)[None] * dt
        xy = scfg.raibert_gain * (p.v_meas - p.command[:, :2])
        sched = jax.vmap(lambda pb: srb.sweep_command(cfg, scfg, pb))(p)
        knot = lambda s, x, t, y: srb._knot_matrices(  # noqa: E731
            cfg, scfg, s, x, t, y, m, I_inv)
        return jax.vmap(jax.vmap(knot, in_axes=(None, None, 0, 0)),
                        in_axes=(0, 0, 0, 0))(sched, xy, ts, yaw)

    assemble_j = jax.jit(assemble)
    A, Bm, sm, r = jax.block_until_ready(assemble_j(probs))
    dt_asm = timeit(assemble_j, probs)
    print(f"knot assembly: {dt_asm*1e3:.2f} ms", flush=True)

    xref_j = jax.jit(jax.vmap(lambda pb: srb._reference_states(cfg, scfg, pb)))
    x_ref = jax.block_until_ready(xref_j(probs))
    dt_ref = timeit(xref_j, probs)
    print(f"reference states: {dt_ref*1e3:.2f} ms", flush=True)

    Q = jnp.diag(jnp.asarray(list(scfg.w_rpy) + list(scfg.w_pos) +
                             list(scfg.w_omega) + list(scfg.w_vel) + [0.0]))
    Rm = scfg.r_force * jnp.eye(srb.NU)

    def backward_only(A, Bm, x_ref, sm):
        n_st = jnp.maximum(jnp.sum(sm, axis=-1), 1.0)
        f_ff = (sm * (m * srb._G / n_st)[..., None])[..., None] * \
            jnp.array([0.0, 0.0, 1.0])
        u_ff = f_ff.reshape(B, T, srb.NU)

        q_diag = jnp.diag(Q)

        def one(A, Bm, x_ref, u_ff):
            def bk(carry, inp):   # mirrors mpc/srb.py solve()'s backward
                V, v = carry
                A_t, B_t, xr, uf = inp
                VA = linalg.matmul_unrolled(V, A_t)
                VB = linalg.matmul_unrolled(V, B_t)
                Quu = Rm + linalg.matmul_unrolled(B_t, VB, transpose_a=True)
                Qux = linalg.matmul_unrolled(B_t, VA, transpose_a=True)
                qu = (linalg.matvec_unrolled(B_t, v, transpose_a=True)
                      - scfg.r_force * uf)
                sol = linalg.solve_spd(Quu + 1e-9 * jnp.eye(srb.NU),
                                       jnp.concatenate([qu[:, None], Qux], 1))
                k, K = sol[:, 0], sol[:, 1:]
                Vn = (Q + linalg.matmul_unrolled(A_t, VA, transpose_a=True)
                      - linalg.matmul_unrolled(Qux, K, transpose_a=True))
                vn = (-q_diag * xr
                      + linalg.matvec_unrolled(A_t, v, transpose_a=True)
                      - linalg.matvec_unrolled(Qux, k, transpose_a=True))
                return (0.5 * (Vn + Vn.T), vn), (K, k)
            (V_T, v_T) = (Q, -Q @ x_ref[-1])
            _, (Ks, ks) = jax.lax.scan(bk, (V_T, v_T),
                                       (A, Bm, x_ref[:-1], u_ff), reverse=True)
            return Ks, ks
        return jax.vmap(one)(A, Bm, x_ref, u_ff)

    bk_j = jax.jit(backward_only)
    Ks, ks = jax.block_until_ready(bk_j(A, Bm, x_ref, sm))
    dt_bk = timeit(bk_j, A, Bm, x_ref, sm)
    print(f"backward Riccati: {dt_bk*1e3:.2f} ms", flush=True)

    def forward_only(A, Bm, Ks, ks, sm, x0):
        def one(A, Bm, Ks, ks, sm, x0):
            def fw(x, inp):
                A_t, B_t, K_t, k_t, sm_t = inp
                u = -K_t @ x - k_t
                f = srb._project_cone(u.reshape(4, 3), sm_t, scfg.mu,
                                      scfg.fz_max)
                return A_t @ x + B_t @ f.reshape(srb.NU), f
            _, fs = jax.lax.scan(fw, x0, (A, Bm, Ks, ks, sm))
            return fs
        return jax.vmap(one)(A, Bm, Ks, ks, sm, x0)

    fw_j = jax.jit(forward_only)
    fs = jax.block_until_ready(fw_j(A, Bm, Ks, ks, sm, probs.x0))
    dt_fw = timeit(fw_j, A, Bm, Ks, ks, sm, probs.x0)
    print(f"forward rollout: {dt_fw*1e3:.2f} ms", flush=True)

    rest = dt_full - dt_asm - dt_ref - dt_bk - dt_fw
    print(f"sum of phases: {(dt_asm+dt_ref+dt_bk+dt_fw)*1e3:.2f} ms "
          f"(cost eval + fusion delta: {rest*1e3:+.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
