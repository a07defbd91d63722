"""Small-matrix linear algebra tuned for the TPU vector unit.

The physics hot loop solves one SPD 18x18 system per env per substep
(M qdd = tau - h). Generic LAPACK-shaped solvers map poorly onto the TPU for
this regime (tiny matrices, huge batch): under ``vmap`` every *scalar* step of
an unrolled Cholesky becomes one (B,)-wide VPU op, so an unrolled solve runs
at vector-unit speed with zero layout gymnastics. This replaces
``jnp.linalg.solve`` on the qdd path.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(M: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix, fully unrolled at trace time.

    M: (n, n) with n static and small (<= ~32). vmap-friendly: all ops are
    scalars that batch into lanes.
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(M[0, 0])
                       for j in range(n)]) for i in range(n)]
    return jnp.stack(rows)


def solve_spd(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = M^-1 b for SPD M via unrolled Cholesky + triangular solves.

    b may be (n,) or (n, k): the substitutions index only b's first axis, so
    a matrix RHS rides through with each row as a k-wide vector — one
    factorization amortized over all columns (used by the iLQR Riccati knots
    for [Qu | Qux] and by inv_spd)."""
    return solve_cholesky(cholesky_unrolled(M), b)


def solve_cholesky(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = (L L^T)^-1 b from a precomputed lower Cholesky factor — lets a
    caller amortize one factorization over several solves (e.g. the hard-
    contact substep solves M for both qdd and the Delassus operator)."""
    n = L.shape[-1]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    # backward substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x)


def matmul_unrolled(A: jnp.ndarray, B: jnp.ndarray,
                    transpose_a: bool = False) -> jnp.ndarray:
    """C = A @ B (or A.T @ B) fully unrolled at trace time.

    For tiny static shapes under a large problem vmap: XLA lowers batched
    (batch, n, n) small GEMMs onto padded MXU tiles at ~1% utilization,
    while this unrolls to n*m*k scalar multiply-adds that each become one
    (batch,)-wide VPU op — the same trade cholesky_unrolled exploits.
    Measured on the SRB Riccati backward scan (13x13 at batch 1024): the
    dominant phase of the whole solve before this, see scripts/profile_srb.
    """
    if transpose_a:
        A = A.T  # indexing below is scalar either way; .T is free at trace
    n, m = A.shape
    m2, k = B.shape
    assert m == m2, (A.shape, B.shape)
    a = [[A[i, j] for j in range(m)] for i in range(n)]
    b = [[B[i, j] for j in range(k)] for i in range(m)]
    rows = []
    for i in range(n):
        row = []
        for j in range(k):
            s = a[i][0] * b[0][j]
            for l in range(1, m):
                s = s + a[i][l] * b[l][j]
            row.append(s)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def matvec_unrolled(A: jnp.ndarray, x: jnp.ndarray,
                    transpose_a: bool = False) -> jnp.ndarray:
    """y = A @ x (or A.T @ x) unrolled to scalar ops (see matmul_unrolled)."""
    if transpose_a:
        A = A.T
    n, m = A.shape
    xs = [x[j] for j in range(m)]
    out = []
    for i in range(n):
        s = A[i, 0] * xs[0]
        for j in range(1, m):
            s = s + A[i, j] * xs[j]
        out.append(s)
    return jnp.stack(out)


def inv_spd(M: jnp.ndarray) -> jnp.ndarray:
    """M^-1 for SPD M (one unrolled factorization, n-wide RHS rows).

    Replaces ``jnp.linalg.inv`` on small SPD matrices (mass matrices,
    Riccati Quu blocks): XLA's generic LU on a (batch, n, n) of tiny
    matrices lowers to sequential dynamic-slice loops, while this unrolls
    to pure (batch,)-wide VPU ops under vmap."""
    n = M.shape[-1]
    return solve_spd(M, jnp.eye(n, dtype=M.dtype))
