import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.graph import dynamic_ba
from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.utils import geometry as geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def _dynamic_scene(seed=0):
    """A car-like cuboid driving straight; static camera rig above/behind."""
    rng = np.random.default_rng(seed)
    n_kf = 5
    scale = np.array([1.9420, 0.8143, 0.7631], dtype=np.float32)  # KITTI prior
    v_true = 2.0  # m/s straight (steer 0)
    stamps = np.arange(n_kf, dtype=np.float32) * 0.5

    # object poses: moving along +x at yaw 0, z = height/2
    obj_pose = []
    for i in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [v_true * stamps[i], 0.0, scale[2]]
        obj_pose.append(T)
    obj_pose = np.stack(obj_pose)

    # local points on the car surface
    Q = 24
    face = rng.integers(0, 3, Q)
    sgn = rng.choice([-1.0, 1.0], Q)
    lp = rng.uniform(-1, 1, (Q, 3)).astype(np.float32)
    for i in range(Q):
        lp[i, face[i]] = sgn[i]
    lp = lp * scale

    # camera: behind and above, looking forward along +x
    def look_at(eye, target):
        f = target - eye
        f = f / np.linalg.norm(f)
        x = np.cross(f, np.array([0.0, 0.0, 1.0]))
        x /= np.linalg.norm(x)
        y = np.cross(f, x)
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = np.stack([x, y, f], axis=1)
        Twc[:3, 3] = eye
        return Twc

    tcw = []
    for i in range(n_kf):
        eye = np.array([v_true * stamps[i] - 8.0, 1.5, 1.6])
        tgt = np.array([v_true * stamps[i], 0.0, scale[2]])
        tcw.append(np.linalg.inv(look_at(eye, tgt)).astype(np.float32))
    tcw = np.stack(tcw)

    # observations
    dp_kf, dp_obj, dp_pt, dp_uv = [], [], [], []
    for i in range(n_kf):
        world = lp @ obj_pose[i][:3, :3].T + obj_pose[i][:3, 3]
        Xc = world @ tcw[i][:3, :3].T + tcw[i][:3, 3]
        uv = Xc @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        for q in range(Q):
            if Xc[q, 2] > 0.5:
                dp_kf.append(i)
                dp_obj.append(0)
                dp_pt.append(q)
                dp_uv.append(uv[q])
    return (tcw, stamps, obj_pose, scale, v_true, lp,
            np.asarray(dp_kf), np.asarray(dp_obj), np.asarray(dp_pt), np.stack(dp_uv))


def test_dynamic_ba_recovers_motion():
    (tcw, stamps, obj_pose_true, scale, v_true, lp_true,
     dp_kf, dp_obj, dp_pt, dp_uv) = _dynamic_scene()
    rng = np.random.default_rng(1)
    n_kf = len(tcw)
    Q = len(lp_true)
    O = 1

    # perturb object poses, velocity, and local points
    obj_pose0 = obj_pose_true.copy()
    for i in range(n_kf):
        xi = 0.05 * rng.normal(size=6).astype(np.float32)
        obj_pose0[i] = obj_pose0[i] @ np.asarray(geo.se3_exp(jnp.asarray(xi)))
    lp0 = lp_true + 0.05 * rng.normal(size=lp_true.shape).astype(np.float32)
    vel0 = np.array([[0.5, 0.1]], dtype=np.float32)  # wrong initial velocity

    E = len(dp_kf)
    mo_obj = np.zeros(n_kf - 1, dtype=np.int32)
    mo_k0 = np.arange(n_kf - 1, dtype=np.int32)
    mo_k1 = np.arange(1, n_kf, dtype=np.int32)

    out = dynamic_ba.dynamic_object_ba(
        jnp.asarray(tcw), jnp.asarray(stamps),
        jnp.asarray(obj_pose0[None]), jnp.asarray(scale[None]),
        jnp.asarray(vel0), jnp.asarray(lp0), jnp.asarray(K),
        jnp.asarray(dp_kf, dtype=jnp.int32), jnp.asarray(dp_obj, dtype=jnp.int32),
        jnp.asarray(dp_pt, dtype=jnp.int32), jnp.asarray(dp_uv, dtype=jnp.float32),
        jnp.ones(E, dtype=jnp.float32), jnp.ones(E, dtype=bool),
        jnp.asarray(mo_obj), jnp.asarray(mo_k0), jnp.asarray(mo_k1),
        jnp.ones(n_kf - 1, dtype=bool),
        jnp.ones(n_kf, dtype=bool),          # cameras fixed
        jnp.ones((O, n_kf), dtype=bool), jnp.ones(O, dtype=bool),
        jnp.ones(Q, dtype=bool),
        num_iters=25,
    )
    kf_out, obj_out, vel_out, pts_out, chi2 = out
    obj_out = np.asarray(obj_out)[0]
    # the object-frame origin vs local-point offsets is a gauge freedom
    # (the reference re-centers objects on the point mean,
    # Optimizer.cc:1217-1223) — check gauge-invariant quantities:
    # inter-keyframe MOTION and velocity.
    rel_est = obj_out[1:, :3, 3] - obj_out[:-1, :3, 3]
    rel_true = obj_pose_true[1:, :3, 3] - obj_pose_true[:-1, :3, 3]
    np.testing.assert_allclose(rel_est, rel_true, atol=0.02)
    # constant gauge offset only
    offs = obj_out[:, :3, 3] - obj_pose_true[:, :3, 3]
    assert offs.std(axis=0).max() < 0.02
    # velocity recovered (bicycle model: v along heading, zero steer)
    v_est, steer_est = np.asarray(vel_out)[0]
    assert abs(v_est - v_true) < 0.1, v_est
    assert abs(steer_est) < 0.05
    assert float(chi2) < 1e-2
