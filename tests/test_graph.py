import jax
import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.graph import factors
from cube_slam_tpu.graph.lm import lm_optimize
from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.slam.object_slam import ObjectSlamDemo, evaluate_ate
from cube_slam_tpu.utils import geometry as geo


def test_lm_converges_quadratic():
    """LM on a plain nonlinear least squares (Rosenbrock-ish residuals)."""

    def residual(p):
        x, y = p
        return jnp.stack([10.0 * (y - x * x), 1.0 - x])

    def retract(p, dx):
        return (p[0] + dx[0], p[1] + dx[1])

    params = (jnp.float32(-1.2), jnp.float32(1.0))
    res = lm_optimize(residual, retract, params, dim=2, num_iters=60)
    np.testing.assert_allclose(float(res.params[0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(float(res.params[1]), 1.0, atol=1e-3)
    assert float(res.chi2) < 1e-8


def test_lm_respects_param_mask():
    def residual(p):
        return p - jnp.asarray([1.0, 2.0, 3.0])

    def retract(p, dx):
        return p + dx

    params = jnp.zeros(3)
    mask = jnp.asarray([True, False, True])
    res = lm_optimize(residual, retract, params, dim=3, num_iters=10, param_mask=mask)
    out = np.asarray(res.params)
    np.testing.assert_allclose(out, [1.0, 0.0, 3.0], atol=1e-4)


def test_odometry_error_zero_when_consistent():
    T1 = geo.se3_exp(jnp.asarray([0.1, 0.0, 0.2, 1.0, 0.0, 0.5], dtype=jnp.float32))
    motion = geo.se3_exp(jnp.asarray([0.0, 0.05, 0.0, 0.2, 0.1, 0.0], dtype=jnp.float32))
    T2 = motion @ T1
    # C = measured 1->2 motion; error = log(C T1 T2^-1) = log(I)
    err = factors.se3_odometry_error(T1, T2, motion, 1.0, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)


def _circular_sequence(n=20, radius=2.5):
    """Synthetic camera circling a cuboid at the origin, exact measurements."""
    cube_world = cb.from_minimal_vector(
        jnp.asarray([0.0, 0.0, 0.4, 0.0, 0.0, 0.3, 0.5, 0.3, 0.4], dtype=jnp.float32)
    )
    poses = []
    for i in range(n):
        ang = 0.12 * i
        # camera on a circle, z-up world; orientation = yaw facing center-ish
        t = np.array([radius * np.cos(ang), radius * np.sin(ang), 1.2])
        R = np.asarray(geo.euler_zyx_to_rot(jnp.float32(-1.4), jnp.float32(0.05), jnp.float32(ang)))
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)
    meas = []
    for i in range(n):
        local = cb.transform_to(cube_world, jnp.asarray(poses[i]))
        meas.append((np.array(local.pose), np.array(local.scale), 0.8))
    return poses, meas, cube_world


def test_optimize_graph_exact_recovery():
    """Full graph with CORRECT odometry measurements + exact cuboid
    observations: the global optimum is the truth; the LM solver must find
    it from a perturbed initialization (validates solver + factor chain)."""
    from cube_slam_tpu.slam.object_slam import optimize_graph

    n, F = 8, 8
    poses, meas, cube_world = _circular_sequence(n=n)
    tcw_true = np.stack([np.linalg.inv(p) for p in poses]).astype(np.float32)

    rng = np.random.default_rng(0)
    tcw_init = tcw_true.copy()
    for f in range(1, n):
        noise = 0.05 * rng.normal(size=6).astype(np.float32)
        tcw_init[f] = np.asarray(geo.se3_exp(jnp.asarray(noise))) @ tcw_init[f]

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

    out = optimize_graph(
        jnp.asarray(tcw_init), cube_init.pose, cube_init.scale,
        jnp.asarray(meas_pose), jnp.asarray(meas_scale), jnp.asarray(quality),
        jnp.asarray(has), jnp.asarray(odom), jnp.asarray(n),
        num_iters=20, max_frames=F,
    )
    tcw_opt, cube_pose_opt, cube_scale_opt, chi2 = out
    assert float(chi2) < 1e-3  # f32 convergence floor
    est_Twc = np.stack([np.linalg.inv(np.asarray(t)) for t in tcw_opt[:n]])
    ate = evaluate_ate(est_Twc, poses)
    assert ate < 5e-3, f"exact-graph ATE too high: {ate}"
    err = cb.min_log_error(
        cb.Cuboid(cube_pose_opt, cube_scale_opt), cube_world
    )
    assert float(jnp.linalg.norm(err)) < 1e-2


def test_demo_incremental_synthetic():
    """Incremental demo loop on exact measurements. The reference
    architecture inserts const-velocity odometry edges whose (stale)
    measurements bias the poses (main_obj.cpp:394-408,547-560) — exact
    recovery is NOT expected; bounded drift and a recovered cuboid are."""
    poses, meas, cube_world = _circular_sequence(n=12)
    demo = ObjectSlamDemo(max_frames=16, num_lm_iters=8)
    res = demo.run_with_measurements(meas, poses[0])
    ate = evaluate_ate(res.est_Twc, poses)
    assert np.isfinite(res.chi2_history).all()
    assert ate < 1.0, f"incremental synthetic ATE unexpectedly high: {ate}"
    # cuboid scale recovered (up to the 90-deg l/w swap ambiguity)
    s_est = np.sort(res.cube_scale_history[-1][:2])
    s_true = np.sort(np.asarray(cube_world.scale)[:2])
    np.testing.assert_allclose(s_est, s_true, atol=0.05)
    np.testing.assert_allclose(
        res.cube_scale_history[-1][2], float(cube_world.scale[2]), atol=0.05
    )


def test_point_reproj_error():
    K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=jnp.float32)
    Tcw = jnp.eye(4, dtype=jnp.float32)
    pt = jnp.asarray([0.5, -0.2, 4.0], dtype=jnp.float32)
    uv_true = jnp.asarray([320 + 500 * 0.5 / 4.0, 240 - 500 * 0.2 / 4.0], dtype=jnp.float32)
    err = factors.point_reproj_error(Tcw, K, pt, uv_true, 1.0, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-4)
