import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import rotation as rot


def test_quat_matrix_orthonormal(rng):
    q = rot.quat_normalize(jnp.asarray(rng.normal(size=(32, 4))))
    R = rot.quat_to_matrix(q)
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = rot.quat_normalize(jnp.asarray(rng.normal(size=(8, 4))))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(rot.quat_rotate(q, v),
                               np.einsum("bij,bj->bi", rot.quat_to_matrix(q), v),
                               atol=1e-5)


def test_euler_roundtrip(rng):
    e = jnp.asarray(rng.uniform(-1.2, 1.2, size=(64, 3)))
    np.testing.assert_allclose(rot.qua2euler(rot.euler2qua(e)), e, atol=1e-5)


def test_quat_integrate_small_step():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, np.pi])  # half turn per second about z
    dt = 1e-3
    q2 = q
    for _ in range(1000):
        q2 = rot.quat_integrate(q2, omega, dt)
    # after 1 s: rotation of pi about z -> quat (0,0,0,1) up to sign
    np.testing.assert_allclose(np.abs(np.asarray(q2)), [0, 0, 0, 1], atol=1e-3)
