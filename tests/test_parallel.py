"""Sharded LM over the 8-device virtual CPU mesh must match the
single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.parallel.mesh import make_mesh
from cube_slam_tpu.slam.object_slam import optimize_graph, optimize_graph_sharded
from cube_slam_tpu.utils import geometry as geo

from test_graph import _circular_sequence


def _graph_inputs(n=8, F=8):
    poses, meas, cube_world = _circular_sequence(n=n)
    tcw_true = np.stack([np.linalg.inv(p) for p in poses]).astype(np.float32)
    rng = np.random.default_rng(1)
    tcw_init = tcw_true.copy()
    for f in range(1, n):
        tcw_init[f] = (
            np.asarray(geo.se3_exp(jnp.asarray(0.05 * rng.normal(size=6), dtype=jnp.float32)))
            @ tcw_init[f]
        )
    meas_pose = np.stack([m[0] for m in meas])
    meas_scale = np.stack([m[1] for m in meas])
    quality = np.full(n, 0.8, dtype=np.float32)
    has = np.ones(n, dtype=bool)
    odom = np.stack(
        [np.eye(4, dtype=np.float32)]
        + [tcw_true[f] @ np.linalg.inv(tcw_true[f - 1]) for f in range(1, n)]
    )
    cube_init = cb.exp_update(
        cube_world, jnp.asarray(0.05 * rng.normal(size=9), dtype=jnp.float32)
    )
    return (
        jnp.asarray(tcw_init), cube_init.pose, cube_init.scale,
        jnp.asarray(meas_pose), jnp.asarray(meas_scale), jnp.asarray(quality),
        jnp.asarray(has), jnp.asarray(odom), jnp.asarray(n),
    )


def test_sharded_matches_single_device_and_converges():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    args = _graph_inputs(n=8, F=8)
    tcw1, cp1, cs1, chi1 = optimize_graph(*args, num_iters=10, max_frames=8)

    mesh = make_mesh(8)
    tcw2, cp2, cs2, chi2 = optimize_graph_sharded(mesh, *args, num_iters=10)

    np.testing.assert_allclose(float(chi1), float(chi2), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tcw1), np.asarray(tcw2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cp1), np.asarray(cp2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs1), np.asarray(cs2), atol=1e-4)
    assert float(chi2) < 1e-2  # converged on the exact-odometry problem
