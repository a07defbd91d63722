import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.models.lstm import LSTMWeights, lstm_cell
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops.lstm_pallas import fused_lstm_cell


def test_unrolled_cholesky_matches_numpy(rng):
    n = 18
    A = rng.normal(size=(n, n))
    M = A @ A.T + n * np.eye(n)
    L = np.asarray(linalg.cholesky_unrolled(jnp.asarray(M, dtype=jnp.float32)))
    np.testing.assert_allclose(L, np.linalg.cholesky(M), rtol=2e-4, atol=1e-4)


def test_solve_spd_matches_numpy(rng):
    n = 18
    A = rng.normal(size=(n, n))
    M = A @ A.T + n * np.eye(n)
    b = rng.normal(size=n)
    x = np.asarray(linalg.solve_spd(jnp.asarray(M, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(x, np.linalg.solve(M, b), rtol=1e-3, atol=1e-4)


def test_solve_spd_matrix_rhs_and_inv(rng):
    """Matrix RHS rides the scalar-unrolled substitutions row-wise (the iLQR
    Riccati [Qu | Qux] path) and inv_spd inverts via one factorization."""
    n, k = 12, 5
    A = rng.normal(size=(n, n))
    M = A @ A.T + n * np.eye(n)
    Bm = rng.normal(size=(n, k))
    X = np.asarray(linalg.solve_spd(jnp.asarray(M, jnp.float32),
                                    jnp.asarray(Bm, jnp.float32)))
    np.testing.assert_allclose(X, np.linalg.solve(M, Bm), rtol=1e-3, atol=1e-4)
    Minv = np.asarray(linalg.inv_spd(jnp.asarray(M, jnp.float32)))
    np.testing.assert_allclose(Minv @ M, np.eye(n), atol=2e-4)


def test_matmul_matvec_unrolled(rng):
    A = rng.normal(size=(13, 12)).astype(np.float32)
    B = rng.normal(size=(12, 13)).astype(np.float32)
    x = rng.normal(size=13).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(linalg.matmul_unrolled(jnp.asarray(A), jnp.asarray(B))),
        A @ B, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(linalg.matmul_unrolled(jnp.asarray(A), jnp.asarray(A),
                                          transpose_a=True)),
        A.T @ A, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(linalg.matvec_unrolled(jnp.asarray(A), jnp.asarray(x),
                                          transpose_a=True)),
        A.T @ x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(linalg.matvec_unrolled(jnp.asarray(B), jnp.asarray(x))),
        B @ x, rtol=1e-5, atol=1e-5)


def test_solve_spd_vmaps(rng):
    n, B = 18, 32
    A = rng.normal(size=(B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) + n * np.eye(n)
    b = rng.normal(size=(B, n))
    x = np.asarray(jax.vmap(linalg.solve_spd)(jnp.asarray(M, jnp.float32),
                                              jnp.asarray(b, jnp.float32)))
    want = np.linalg.solve(M, b[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=2e-4)


def test_fused_lstm_cell_matches_reference(rng):
    B, d, n = 64, 35, 48
    w = LSTMWeights(
        wx=jnp.asarray(rng.normal(scale=0.2, size=(d, 4 * n)), jnp.float32),
        wh=jnp.asarray(rng.normal(scale=0.2, size=(n, 4 * n)), jnp.float32),
        b=jnp.asarray(rng.normal(scale=0.1, size=(4 * n,)), jnp.float32),
    )
    x = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    c_ref, h_ref = lstm_cell(w, x, c, h)
    # interpret mode so the kernel runs on the CPU test backend
    c_pl, h_pl = fused_lstm_cell(w, x, c, h, interpret=True)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), atol=1e-5)
