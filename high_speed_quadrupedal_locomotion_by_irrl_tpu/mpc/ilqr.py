"""Batched iLQR trajectory optimizer (pure JAX, fully jit/vmap-able).

The trajectory-optimization engine the BASELINE.json north star demands
alongside the PPO path. Design choices are TPU-first:

- linearization of the dynamics (``jax.jacfwd``) and quadratization of the
  cost (grad/hessian) are *vmapped over the horizon* — one batched derivative
  sweep instead of a sequential pass;
- the backward Riccati recursion is a ``lax.scan`` (sequential by nature but
  tiny: n=state_dim, m=act_dim per knot);
- the forward pass evaluates a *parallel line search*: all step sizes rolled
  out at once via ``vmap`` and the best taken — trading FLOPs (abundant) for
  control-flow (expensive under XLA);
- Levenberg-Marquardt regularization on Q_uu keeps every iteration total
  (no data-dependent aborts inside jit).

Batch over problems (x0, references) with an outer ``vmap``: thousands of
simultaneous solves per chip.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg


def _gains(Quu: jnp.ndarray, Qu: jnp.ndarray, Qux: jnp.ndarray):
    """(k, K) = -Quu^-1 [Qu | Qux] via ONE unrolled-Cholesky factorization.

    jnp.linalg.cholesky/cho_solve on (batch, m, m) tiny matrices lower to
    sequential dynamic-slice loops on TPU; the unrolled solve is pure
    (batch,)-wide VPU ops (ops/linalg.py notes) — and sharing the
    factorization between the feedforward and feedback gains halves it."""
    m = Qu.shape[-1]
    rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)   # (m, 1+n)
    sol = linalg.solve_spd(Quu + 1e-9 * jnp.eye(m), rhs)
    return -sol[:, 0], -sol[:, 1:]


class ILQRResult(NamedTuple):
    us: jnp.ndarray       # (T, m) optimized controls
    xs: jnp.ndarray       # (T+1, n) optimized trajectory
    cost: jnp.ndarray     # () final total cost
    cost_trace: jnp.ndarray  # (n_iter,) cost after each iteration


def _rollout(dynamics: Callable, x0: jnp.ndarray, us: jnp.ndarray) -> jnp.ndarray:
    def f(x, inp):
        u, t = inp
        x2 = dynamics(x, u, t)
        return x2, x2
    T = us.shape[0]
    _, xs = jax.lax.scan(f, x0, (us, jnp.arange(T)))
    return jnp.concatenate([x0[None], xs], axis=0)


def _total_cost(cost_fn: Callable, term_cost_fn: Callable,
                xs: jnp.ndarray, us: jnp.ndarray) -> jnp.ndarray:
    T = us.shape[0]
    stage = jax.vmap(cost_fn)(xs[:-1], us, jnp.arange(T))
    return jnp.sum(stage) + term_cost_fn(xs[-1])


def solve(dynamics: Callable, cost_fn: Callable, term_cost_fn: Callable,
          x0: jnp.ndarray, u_init: jnp.ndarray, n_iter: int = 10,
          reg: float = 1e-6, linearize_chunk: int = 1,
          n_alphas: int = 8, relin_every: int = 1,
          linearize_fn: Callable | None = None) -> ILQRResult:
    """Minimize sum_t cost(x_t, u_t, t) + term(x_T) s.t. x_{t+1}=dynamics(x_t,u_t,t).

    dynamics: (n,), (m,), () -> (n,);  cost_fn: (n,), (m,), () -> ();
    term_cost_fn: (n,) -> ().  All callables must be jax-traceable.

    linearize_chunk: how many horizon knots to differentiate at once. The
    dynamics jacobian drags (n+m) forward-mode tangents through the whole
    physics step; vmapping all T knots at once makes every tangent
    intermediate live simultaneously (with an outer problem batch that is
    tens of GB of HBM). A scan over T/chunk blocks keeps the intermediates
    transient — chunk=1 is the memory floor; raise it to trade HBM for
    fewer sequential steps.

    n_alphas: parallel line-search step sizes 1..2^-(n_alphas-1).
    relin_every: recompute the dynamics jacobians only on iterations
    i % relin_every == 0 (Gauss-Newton-style jacobian reuse) — the
    linearization is the dominant cost per iteration, and near convergence
    stale jacobians barely change the step.
    linearize_fn: optional custom Jacobian provider
    ``(X (C,n), U (C,m)) -> (A (C,n,n), B (C,n,m))`` replacing the jacfwd
    sweep through the full dynamics (e.g. the frozen-operator surrogate of
    mpc/linearize.py — ~one physics eval per knot instead of n+m tangents,
    and a compile-light graph). Only valid for time-invariant dynamics."""
    T, m = u_init.shape
    n = x0.shape[0]
    alphas = 0.5 ** jnp.arange(n_alphas)

    fxu_fn = jax.jacfwd(dynamics, argnums=(0, 1))
    cx_fn = jax.grad(cost_fn, argnums=0)
    cu_fn = jax.grad(cost_fn, argnums=1)
    cxx_fn = jax.hessian(cost_fn, argnums=0)
    cuu_fn = jax.hessian(cost_fn, argnums=1)
    cux_fn = jax.jacfwd(jax.grad(cost_fn, argnums=1), argnums=0)
    vx_fn = jax.grad(term_cost_fn)
    vxx_fn = jax.hessian(term_cost_fn)

    assert T % linearize_chunk == 0, (T, linearize_chunk)

    def _linearize(xs, us, ts):
        """(A, B) over the horizon via a chunked scan (memory-bounded)."""
        def block(_, inp):
            x_c, u_c, t_c = inp
            if linearize_fn is not None:
                A_c, B_c = linearize_fn(x_c, u_c)
            else:
                A_c, B_c = jax.vmap(fxu_fn)(x_c, u_c, t_c)
            return None, (A_c, B_c)
        resh = lambda a: a.reshape((T // linearize_chunk, linearize_chunk) + a.shape[1:])
        _, (A, B) = jax.lax.scan(block, None, (resh(xs[:-1]), resh(us), resh(ts)))
        return A.reshape((T, n, n)), B.reshape((T, n, m))

    def iteration(carry, it):
        us, xs, best_cost, lam, A_prev, B_prev = carry
        ts = jnp.arange(T)

        # --- derivatives over the horizon (dynamics jacs chunked, costs cheap)
        if relin_every > 1:
            A, B = jax.lax.cond(it % relin_every == 0,
                                lambda: _linearize(xs, us, ts),
                                lambda: (A_prev, B_prev))
        else:
            A, B = _linearize(xs, us, ts)         # (T,n,n), (T,n,m)
        cx = jax.vmap(cx_fn)(xs[:-1], us, ts)     # (T,n)
        cu = jax.vmap(cu_fn)(xs[:-1], us, ts)     # (T,m)
        cxx = jax.vmap(cxx_fn)(xs[:-1], us, ts)   # (T,n,n)
        cuu = jax.vmap(cuu_fn)(xs[:-1], us, ts)   # (T,m,m)
        cux = jax.vmap(cux_fn)(xs[:-1], us, ts)   # (T,m,n)

        # --- backward Riccati scan
        def backward(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
            Qx = cx_t + A_t.T @ Vx
            Qu = cu_t + B_t.T @ Vx
            Qxx = cxx_t + A_t.T @ Vxx @ A_t
            Quu = cuu_t + B_t.T @ Vxx @ B_t + lam * jnp.eye(m)
            Qux = cux_t + B_t.T @ Vxx @ A_t
            k, K = _gains(Quu, Qu, Qux)
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k, K)

        (Vx0, Vxx0) = (vx_fn(xs[-1]), vxx_fn(xs[-1]))
        _, (ks, Ks) = jax.lax.scan(backward, (Vx0, Vxx0),
                                   (A, B, cx, cu, cxx, cuu, cux), reverse=True)

        # --- parallel line search
        def forward(alpha):
            def f(x, inp):
                u_ref, x_ref, k_t, K_t, t = inp
                u = u_ref + alpha * k_t + K_t @ (x - x_ref)
                x2 = dynamics(x, u, t)
                return x2, (u, x2)
            _, (us_new, xs_new) = jax.lax.scan(
                f, x0, (us, xs[:-1], ks, Ks, ts))
            xs_new = jnp.concatenate([x0[None], xs_new], axis=0)
            return us_new, xs_new, _total_cost(cost_fn, term_cost_fn, xs_new, us_new)

        us_c, xs_c, costs = jax.vmap(forward)(alphas)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best = jnp.argmin(costs)
        improved = costs[best] < best_cost
        us = jnp.where(improved, us_c[best], us)
        xs = jnp.where(improved, xs_c[best], xs)
        new_cost = jnp.where(improved, costs[best], best_cost)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8), lam * 10.0)
        return (us, xs, new_cost, lam, A, B), new_cost

    xs0 = _rollout(dynamics, x0, u_init)
    c0 = _total_cost(cost_fn, term_cost_fn, xs0, u_init)
    A0 = jnp.zeros((T, n, n))
    B0 = jnp.zeros((T, n, m))
    (us, xs, cost, _, _, _), trace = jax.lax.scan(
        iteration, (u_init, xs0, c0, jnp.asarray(reg), A0, B0),
        jnp.arange(n_iter), length=n_iter)
    return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=trace)


def solve_batch(dynamics_b: Callable, cost_fn: Callable, term_cost_fn: Callable,
                x0s: jnp.ndarray, u_inits: jnp.ndarray,
                stage_args, term_args, n_iter: int = 8, reg: float = 1e-6,
                lin_chunk: int = 0, n_alphas: int = 8,
                relin_every: int = 1, fd_eps: float = 1e-3,
                linearize_b: Callable | None = None) -> ILQRResult:
    """Batched iLQR where the *dynamics batch* is the TPU lane axis.

    The per-problem :func:`solve` above vmaps tiny dense physics over
    problems — each op works on (B, small...) tensors whose trailing dims
    waste the vector lanes (the same pathology ops/phys_lanes.py fixes for
    the env). Here the dynamics is a single *batched* callable
    ``dynamics_b: (K, n), (K, m) -> (K, n)`` (e.g. the lanes physics of
    trot.make_dynamics_batch) and every stage of the solver feeds it the
    widest batch available:

    - linearization: all (n+m) jacobian tangents of all problems of a
      horizon chunk ride one call — K = B x chunk x (n+m+1) lanes of
      physics per step instead of one env per op;
    - forward line search: all step sizes of all problems together,
      K = B x n_alphas;
    - the Riccati recursion stays a scan over T with problems vmapped
      (it is small dense algebra, MXU-friendly as (B, n, n) batmuls).

    cost_fn: (n,), (m,), stage_arg -> () per sample; ``stage_args`` is a
    pytree with leaves (B, T, ...) (e.g. per-knot references).
    term_cost_fn: (n,), term_arg -> (); ``term_args`` leaves (B, ...).
    lin_chunk: horizon knots linearized per scan block (0 = all at once);
    the memory/time trade of solve()'s linearize_chunk, at lane width.
    fd_eps > 0: linearize by *central finite differences* — 2(n+m) forward
    evaluations of dynamics_b per knot, all batched into one lane-wide call
    (the standard iLQG practice, e.g. MuJoCo's derivative workers).
    Forward-mode AD through the ~20k-op unrolled lanes graph makes the XLA
    compiler blow past 100 GB (measured: OOM at every graph size), while the
    FD sweep reuses the already-compilable forward graph with a bigger
    batch; the O(h^2) truncation error is far below the Levenberg
    regularization scale. fd_eps=0 selects AD (jax.linearize) for small
    dense dynamics.
    linearize_b: optional custom Jacobian provider
    ``(X (K,n), U (K,m)) -> (A (K,n,n), B (K,n,m))`` that replaces the FD/AD
    sweep entirely — e.g. mpc/linearize.make_frozen_linearizer, which gets
    the Jacobians for ~one physics evaluation per knot instead of 2(n+m).
    Rollouts and the line search still use the exact ``dynamics_b``.
    """
    B, T, m = u_inits.shape
    n = x0s.shape[-1]
    alphas = 0.5 ** jnp.arange(n_alphas)
    C = T if lin_chunk == 0 else lin_chunk
    assert T % C == 0, (T, C)

    stage_t = lambda t: jax.tree.map(lambda a: a[:, t], stage_args)  # noqa: E731
    cost_b = jax.vmap(cost_fn)            # (B,n),(B,m),arg_b -> (B,)
    term_b = jax.vmap(term_cost_fn)

    cx_fn = jax.vmap(jax.grad(cost_fn, argnums=0))
    cu_fn = jax.vmap(jax.grad(cost_fn, argnums=1))
    cxx_fn = jax.vmap(jax.hessian(cost_fn, argnums=0))
    cuu_fn = jax.vmap(jax.hessian(cost_fn, argnums=1))
    cux_fn = jax.vmap(jax.jacfwd(jax.grad(cost_fn, argnums=1), argnums=0))
    vx_fn = jax.vmap(jax.grad(term_cost_fn))
    vxx_fn = jax.vmap(jax.hessian(term_cost_fn))

    def _rollout_b(us):                   # (B,T,m) -> (B,T+1,n)
        def f(x, u):
            x2 = dynamics_b(x, u)
            return x2, x2
        _, xs = jax.lax.scan(f, x0s, jnp.swapaxes(us, 0, 1))
        return jnp.concatenate([x0s[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)

    def _total_cost_b(xs, us):            # -> (B,)
        # one (B*T)-wide call instead of T sequential steps: the stage cost
        # is tiny dense math, so the whole horizon rides the lanes at once
        flat = lambda a: a.reshape((B * T,) + a.shape[2:])  # noqa: E731
        c = cost_b(flat(xs[:, :-1]), flat(us),
                   jax.tree.map(flat, stage_args))
        return c.reshape(B, T).sum(axis=1) + term_b(xs[:, -1], term_args)

    def _linearize(xs, us):
        """-> A (B,T,n,n), Bm (B,T,n,m) (see fd_eps in the docstring)."""
        eye = jnp.eye(n + m)

        if linearize_b is not None:
            def block(_, inp):
                X, U = inp                # (C*B, n), (C*B, m)
                A_blk, B_blk = linearize_b(X, U)
                return None, jnp.concatenate([A_blk, B_blk], axis=-1)
        elif fd_eps > 0.0:
            def block(_, inp):
                X, U = inp                # (C*B, n), (C*B, m)
                def pert(e, sign):
                    dX = X + sign * fd_eps * e[:n]
                    dU = U + sign * fd_eps * e[n:]
                    return dynamics_b(dX, dU)          # (C*B, n)
                fp = jax.vmap(lambda e: pert(e, 1.0))(eye)    # (n+m, C*B, n)
                fm = jax.vmap(lambda e: pert(e, -1.0))(eye)
                J = (fp - fm) / (2.0 * fd_eps)
                return None, J.transpose(1, 2, 0)      # (C*B, n, n+m)
        else:
            def block(_, inp):
                X, U = inp                # (C*B, n), (C*B, m)
                _, jvp_fn = jax.linearize(dynamics_b, X, U)
                def one(e):
                    dx = jnp.broadcast_to(e[:n], X.shape)
                    du = jnp.broadcast_to(e[n:], U.shape)
                    return jvp_fn(dx, du)  # (C*B, n)
                J = jax.vmap(one)(eye)    # (n+m, C*B, n)
                return None, J.transpose(1, 2, 0)   # (C*B, n, n+m)

        # (B,T,·) -> (T//C, C*B, ·) blocks along the horizon
        resh = lambda a: (jnp.swapaxes(a, 0, 1)          # noqa: E731
                          .reshape((T // C, C * B) + a.shape[2:]))
        _, J = jax.lax.scan(block, None, (resh(xs[:, :-1]), resh(us)))
        J = J.reshape(T // C, C, B, n, n + m).reshape(T, B, n, n + m)
        J = jnp.swapaxes(J, 0, 1)                        # (B,T,n,n+m)
        return J[..., :n], J[..., n:]

    def iteration(carry, it):
        us, xs, best_cost, lam, A_prev, B_prev = carry

        if relin_every > 1:
            A, Bm = jax.lax.cond(it % relin_every == 0,
                                 lambda: _linearize(xs, us),
                                 lambda: (A_prev, B_prev))
        else:
            A, Bm = _linearize(xs, us)

        def quad(t):
            x_t, u_t, a_t = xs[:, t], us[:, t], stage_t(t)
            return (cx_fn(x_t, u_t, a_t), cu_fn(x_t, u_t, a_t),
                    cxx_fn(x_t, u_t, a_t), cuu_fn(x_t, u_t, a_t),
                    cux_fn(x_t, u_t, a_t))
        cx, cu, cxx, cuu, cux = jax.vmap(quad, out_axes=1)(jnp.arange(T))

        def backward_knot(carry, inp):
            Vx, Vxx = carry               # (B,n), (B,n,n)
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp

            def one(Vx, Vxx, A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t, lam_b):
                Qx = cx_t + A_t.T @ Vx
                Qu = cu_t + B_t.T @ Vx
                Qxx = cxx_t + A_t.T @ Vxx @ A_t
                Quu = cuu_t + B_t.T @ Vxx @ B_t + lam_b * jnp.eye(m)
                Qux = cux_t + B_t.T @ Vxx @ A_t
                k, K = _gains(Quu, Qu, Qux)
                Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
                Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
                return Vx_new, 0.5 * (Vxx_new + Vxx_new.T), k, K

            Vx2, Vxx2, k, K = jax.vmap(one)(Vx, Vxx, A_t, B_t, cx_t, cu_t,
                                            cxx_t, cuu_t, cux_t, lam)
            return (Vx2, Vxx2), (k, K)

        V0 = (vx_fn(xs[:, -1], term_args), vxx_fn(xs[:, -1], term_args))
        swap = lambda a: jnp.swapaxes(a, 0, 1)           # noqa: E731
        _, (ks, Ks) = jax.lax.scan(
            backward_knot, V0,
            tuple(swap(a) for a in (A, Bm, cx, cu, cxx, cuu, cux)),
            reverse=True)
        ks, Ks = swap(ks), swap(Ks)                      # (B,T,m), (B,T,m,n)

        # --- parallel line search: batch = alphas x problems through the
        # lanes dynamics in one call
        AB = n_alphas * B
        x0_w = jnp.broadcast_to(x0s, (n_alphas, B, n)).reshape(AB, n)

        def fwd_knot(x, t):
            # x: (AB, n); gains/refs broadcast over the alpha axis
            xr = x.reshape(n_alphas, B, n)
            du = (alphas[:, None, None] * ks[:, t][None] +
                  jnp.einsum("bmn,abn->abm", Ks[:, t], xr - xs[:, t][None]))
            u = us[:, t][None] + du                      # (a,B,m)
            x2 = dynamics_b(x, u.reshape(AB, m))
            return x2, (u.reshape(AB, m), x2)
        _, (us_w, xs_w) = jax.lax.scan(fwd_knot, x0_w, jnp.arange(T))
        us_w = jnp.swapaxes(us_w, 0, 1).reshape(n_alphas, B, T, m)
        xs_w = jnp.swapaxes(xs_w, 0, 1).reshape(n_alphas, B, T, n)
        xs_w = jnp.concatenate(
            [jnp.broadcast_to(x0s, (n_alphas, B, n))[:, :, None], xs_w], axis=2)

        costs = jax.vmap(_total_cost_b)(xs_w, us_w)      # (a, B)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best = jnp.argmin(costs, axis=0)                 # (B,)
        bcost = jnp.take_along_axis(costs, best[None], axis=0)[0]
        improved = bcost < best_cost                     # (B,)
        pick = lambda w, old: jnp.where(                 # noqa: E731
            improved[:, None, None],
            jnp.take_along_axis(w, best[None, :, None, None], axis=0)[0], old)
        us2 = pick(us_w, us)
        xs2 = pick(xs_w, xs)
        new_cost = jnp.where(improved, bcost, best_cost)
        lam2 = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8), lam * 10.0)
        return (us2, xs2, new_cost, lam2, A, Bm), new_cost

    xs0 = _rollout_b(u_inits)
    c0 = _total_cost_b(xs0, u_inits)
    A0 = jnp.zeros((B, T, n, n))
    B0 = jnp.zeros((B, T, n, m))
    (us, xs, cost, _, _, _), trace = jax.lax.scan(
        iteration, (u_inits, xs0, c0, jnp.full(B, reg), A0, B0),
        jnp.arange(n_iter), length=n_iter)
    return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=jnp.swapaxes(trace, 0, 1))
