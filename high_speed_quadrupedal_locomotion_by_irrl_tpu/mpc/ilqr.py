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
          n_alphas: int = 8, relin_every: int = 1) -> ILQRResult:
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
    stale jacobians barely change the step."""
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
            L = jnp.linalg.cholesky(Quu + 1e-9 * jnp.eye(m))
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
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
