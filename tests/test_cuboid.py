import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.utils import geometry as geo


def make_cuboid(xyz=(1.0, 2.0, 0.5), rpy=(0.0, 0.0, 0.7), scale=(0.4, 0.3, 0.5)):
    v = jnp.asarray(list(xyz) + list(rpy) + list(scale), dtype=jnp.float32)
    return cb.from_minimal_vector(v)


def test_minimal_vector_roundtrip():
    v = jnp.asarray([1.0, -2.0, 0.5, 0.1, -0.2, 0.9, 0.4, 0.3, 0.5], dtype=jnp.float32)
    c = cb.from_minimal_vector(v)
    v2 = cb.to_minimal_vector(c)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_transform_roundtrip():
    c = make_cuboid()
    Twc = geo.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 1.0, 2.0, 0.3], dtype=jnp.float32))
    local = cb.transform_to(c, Twc)
    back = cb.transform_from(local, Twc)
    np.testing.assert_allclose(np.asarray(back.pose), np.asarray(c.pose), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.scale), np.asarray(c.scale), atol=1e-6)


def test_exp_update_zero_is_identity():
    c = make_cuboid()
    c2 = cb.exp_update(c, jnp.zeros(9, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(c2.pose), np.asarray(c.pose), atol=1e-6)


def test_min_log_error_rotation_invariance():
    """Rotating the measured cuboid by 90 deg (with l/w swap) represents the
    same box, so min_log_error must stay ~0 (g2o_Object.h:76-115)."""
    c = make_cuboid(scale=(0.4, 0.3, 0.5))
    rotated = cb.rotate_cuboid(c, jnp.float32(jnp.pi / 2), jnp.asarray(True))
    err = cb.min_log_error(c, rotated)
    assert float(jnp.linalg.norm(err)) < 1e-4

    rotated180 = cb.rotate_cuboid(c, jnp.float32(jnp.pi), jnp.asarray(False))
    err = cb.min_log_error(c, rotated180)
    assert float(jnp.linalg.norm(err)) < 1e-4

    # a genuinely different cuboid has nonzero error
    other = make_cuboid(xyz=(1.5, 2.0, 0.5))
    err = cb.min_log_error(c, other)
    assert float(jnp.linalg.norm(err)) > 0.1


def test_corners_3d_axis_aligned():
    c = make_cuboid(xyz=(0, 0, 1.0), rpy=(0, 0, 0), scale=(2.0, 3.0, 1.0))
    corners = np.asarray(cb.corners_3d(c))
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(axis=0), [-2.0, -3.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(corners.max(axis=0), [2.0, 3.0, 2.0], atol=1e-5)


def test_project_onto_image_bbox():
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=jnp.float32)
    # camera at origin looking down +z (identity); cuboid 5m ahead
    c = make_cuboid(xyz=(0, 0, 5.0), rpy=(0, 0, 0), scale=(0.5, 0.5, 0.5))
    Tcw = jnp.eye(4, dtype=jnp.float32)
    bbox = np.asarray(cb.project_onto_image_bbox(c, Tcw, K))
    assert bbox.shape == (4,)
    # centered on principal point, symmetric extents
    np.testing.assert_allclose(bbox[0], 320.0, atol=1e-3)
    np.testing.assert_allclose(bbox[1], 240.0, atol=1e-3)
    assert bbox[2] > 0 and bbox[3] > 0


def test_batched_ops():
    v = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(6, 9)).astype(np.float32)
    )
    v = v.at[:, 6:].set(jnp.abs(v[:, 6:]) + 0.2)
    c = cb.from_minimal_vector(v)
    assert c.pose.shape == (6, 4, 4)
    assert cb.corners_3d(c).shape == (6, 8, 3)
    err = cb.min_log_error(c, c)
    assert err.shape == (6, 9)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-4)


def test_point_boundary_error():
    c = make_cuboid(xyz=(0, 0, 0), rpy=(0, 0, 0), scale=(1.0, 1.0, 1.0))
    pts = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 0.0, 0.0], [0.0, -3.0, 0.0]], dtype=jnp.float32)
    err = np.asarray(cb.point_boundary_error(c, pts))
    np.testing.assert_allclose(err[0], 0.0, atol=1e-6)  # inside
    np.testing.assert_allclose(err[1], [1.0, 0.0, 0.0], atol=1e-5)  # 1m outside x
    np.testing.assert_allclose(err[2], [0.0, 1.0, 0.0], atol=1e-5)  # clipped at margin*scale
