import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_tpu.utils import geometry as geo


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3))
    return np.asarray(geo.so3_exp(jnp.asarray(w, dtype=jnp.float32)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)
    R = geo.so3_exp(jnp.asarray(w))
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], dtype=jnp.float32)
    R = geo.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = (np.pi - 1e-4) * axis
    R = geo.so3_exp(jnp.asarray(w[None], dtype=jnp.float32))
    w2 = np.asarray(geo.so3_log(R))[0]
    np.testing.assert_allclose(w2, w, atol=5e-3)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.uniform(-1.5, 1.5, size=(32, 6)).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(xi))
    xi2 = geo.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=3e-4)

    # exp produces valid rigid transforms
    T = np.asarray(T)
    for i in range(5):
        R = T[i, :3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(T[i, 3], [0, 0, 0, 1], atol=0)


def test_inv_T():
    xi = jnp.asarray(np.random.default_rng(3).normal(size=(8, 6)), dtype=jnp.float32)
    T = geo.se3_exp(xi)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(T @ geo.inv_T(T)), eye, atol=1e-5)


def test_quat_rot_roundtrip():
    R = random_rotations(50)
    q = geo.rot_to_quat(jnp.asarray(R))
    R2 = geo.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_euler_zyx_matches_reference_convention():
    # matrix_utils.cpp:74-89: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    roll, pitch, yaw = 0.3, -0.4, 1.2
    R = np.asarray(geo.euler_zyx_to_rot(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw)))

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    np.testing.assert_allclose(R, rz(yaw) @ ry(pitch) @ rx(roll), atol=1e-6)

    r2, p2, y2 = geo.rot_to_euler_zyx(jnp.asarray(R, dtype=jnp.float32))
    np.testing.assert_allclose([float(r2), float(p2), float(y2)], [roll, pitch, yaw], atol=1e-5)

    q = geo.euler_zyx_to_quat(jnp.float32(roll), jnp.float32(pitch), jnp.float32(yaw))
    np.testing.assert_allclose(np.asarray(geo.quat_to_rot(q)), R, atol=1e-6)
    r3, p3, y3 = geo.quat_to_euler_zyx(q)
    np.testing.assert_allclose([float(r3), float(p3), float(y3)], [roll, pitch, yaw], atol=1e-5)


def test_normalize_to_pi():
    vals = jnp.asarray([0.0, 1.2, jnp.pi * 0.6, -jnp.pi * 0.6, -1.2], dtype=jnp.float32)
    out = np.asarray(geo.normalize_to_pi(vals))
    expect = np.array([0.0, 1.2, np.pi * 0.6 - np.pi, -np.pi * 0.6 + np.pi, -1.2])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_homo_roundtrip():
    pts = jnp.asarray(np.random.default_rng(4).normal(size=(7, 3)), dtype=jnp.float32)
    h = geo.to_homo(pts)
    assert h.shape == (7, 4)
    np.testing.assert_allclose(np.asarray(geo.from_homo(h)), np.asarray(pts), atol=1e-6)


def test_jit_and_vmap_compatible():
    xi = jnp.asarray(np.random.default_rng(5).normal(size=(4, 6)), dtype=jnp.float32)
    f = jax.jit(lambda x: geo.se3_log(geo.se3_exp(x)))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=3e-4)
    g = jax.vmap(geo.se3_exp)
    assert g(xi).shape == (4, 4, 4)


def test_gradients_finite_at_identity():
    """jacfwd through exp/log at the zero tangent must be finite — the LM
    solver linearizes exactly there (regression: arccos/0-div NaN traps)."""
    J = jax.jacfwd(lambda dx: geo.se3_log(geo.se3_exp(dx) @ jnp.eye(4)))(
        jnp.zeros(6, dtype=jnp.float32)
    )
    assert np.isfinite(np.asarray(J)).all()
    np.testing.assert_allclose(np.asarray(J), np.eye(6), atol=1e-4)

    T0 = geo.se3_exp(jnp.asarray([0.3, -0.2, 0.5, 1.0, 2.0, -0.5], dtype=jnp.float32))
    J2 = jax.jacfwd(lambda dx: geo.se3_log(geo.inv_T(geo.se3_exp(dx) @ T0) @ (geo.se3_exp(dx) @ T0)))(
        jnp.zeros(6, dtype=jnp.float32)
    )
    assert np.isfinite(np.asarray(J2)).all()

    # gradient of so3_log at a rotation near pi stays finite
    w = jnp.asarray([0.0, 0.0, 3.1], dtype=jnp.float32)
    J3 = jax.jacfwd(lambda dw: geo.so3_log(geo.so3_exp(w + dw)))(jnp.zeros(3, dtype=jnp.float32))
    assert np.isfinite(np.asarray(J3)).all()
