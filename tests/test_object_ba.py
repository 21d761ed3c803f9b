import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.graph import object_ba
from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.utils import geometry as geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def _object_scene(seed=0):
    """Cameras orbiting a cuboid; map points on the cuboid surface; exact
    bbox + point observations."""
    rng = np.random.default_rng(seed)
    cube = cb.from_minimal_vector(
        jnp.asarray([0.0, 0.0, 0.5, 0.0, 0.0, 0.4, 0.8, 0.5, 0.5], dtype=jnp.float32)
    )
    # points on the cuboid surface (in object frame, on faces)
    n_pt = 48
    face = rng.integers(0, 3, n_pt)
    sgn = rng.choice([-1.0, 1.0], n_pt)
    local = rng.uniform(-1, 1, (n_pt, 3))
    scale = np.asarray(cube.scale)
    for i in range(n_pt):
        local[i, face[i]] = sgn[i]
    local = local * scale
    R_obj = np.asarray(cube.pose)[:3, :3]
    t_obj = np.asarray(cube.pose)[:3, 3]
    pts = (local @ R_obj.T + t_obj).astype(np.float32)

    def look_at(eye, target):
        """Camera-to-world rotation with +z (optical axis) toward target."""
        f = target - eye
        f = f / np.linalg.norm(f)
        x = np.cross(f, np.array([0.0, 0.0, 1.0]))
        x = x / np.linalg.norm(x)
        y = np.cross(f, x)
        Rwc = np.stack([x, y, f], axis=1)
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = eye
        return Twc

    n_kf = 4
    tcw = []
    for i in range(n_kf):
        ang = 0.35 * i - 0.5
        eye = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.2])
        Twc = look_at(eye, np.array([0.0, 0.0, 0.5]))
        tcw.append(np.linalg.inv(Twc).astype(np.float32))
    tcw = np.stack(tcw)

    # observations
    obs_kf, obs_pt, obs_uv = [], [], []
    box_meas = []
    for i in range(n_kf):
        Xc = pts @ tcw[i][:3, :3].T + tcw[i][:3, 3]
        uv = Xc @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        for j in range(n_pt):
            if Xc[j, 2] > 0:
                obs_kf.append(i)
                obs_pt.append(j)
                obs_uv.append(uv[j])
        bb = np.asarray(cb.project_onto_image_bbox(cube, jnp.asarray(tcw[i]), jnp.asarray(K)))
        box_meas.append(bb)
    return cube, pts, tcw, (np.asarray(obs_kf), np.asarray(obs_pt), np.stack(obs_uv)), np.stack(box_meas)


def test_object_ba_recovers_cuboid():
    cube, pts, tcw, (okf, opt, ouv), boxes = _object_scene()
    rng = np.random.default_rng(1)
    n_kf, n_pt = len(tcw), len(pts)
    O = 2  # one real object + one padded

    # perturb the object pose/scale; cameras/points at truth (held fixed-ish)
    cube0 = cb.exp_update(cube, jnp.asarray(
        np.concatenate([0.1 * rng.normal(size=6), 0.08 * rng.normal(size=3)]),
        dtype=jnp.float32))
    obj_pose = np.stack([np.asarray(cube0.pose), np.eye(4, dtype=np.float32)])
    obj_scale = np.stack([np.asarray(cube0.scale), np.ones(3, dtype=np.float32)])

    E = len(okf)
    B = len(tcw)
    box_kf = np.arange(B, dtype=np.int32)
    box_obj = np.zeros(B, dtype=np.int32)
    Q = n_pt
    po_obj = np.zeros(Q, dtype=np.int32)
    po_pt = np.arange(Q, dtype=np.int32)

    out = object_ba.local_ba_objects(
        jnp.asarray(tcw), jnp.asarray(pts), jnp.asarray(obj_pose), jnp.asarray(obj_scale),
        jnp.asarray(K),
        jnp.asarray(okf, dtype=jnp.int32), jnp.asarray(opt, dtype=jnp.int32),
        jnp.asarray(ouv, dtype=jnp.float32), jnp.ones(E, dtype=jnp.float32),
        jnp.ones(E, dtype=bool),
        jnp.asarray(box_kf), jnp.asarray(box_obj), jnp.asarray(boxes, dtype=jnp.float32),
        jnp.full(B, 0.1, dtype=jnp.float32), jnp.ones(B, dtype=bool),
        jnp.asarray(po_obj), jnp.asarray(po_pt), jnp.full(Q, 2.0, dtype=jnp.float32),
        jnp.ones(Q, dtype=bool),
        jnp.ones(n_kf, dtype=bool),   # all cameras fixed
        jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True, False]),   # object 0 active
        jnp.asarray([False, False]),
        num_iters=25,
    )
    kf_out, pts_out, op_out, os_out, cost, inl_r, inl_b = out
    got = cb.Cuboid(op_out[0], os_out[0])
    err = cb.min_log_error(got, cube)
    err_n = float(jnp.linalg.norm(err))
    init_err = float(jnp.linalg.norm(cb.min_log_error(cube0, cube)))
    assert err_n < 0.3 * init_err, f"object not recovered: {err_n:.4f} vs init {init_err:.4f}"
    # cameras were fixed: unchanged
    np.testing.assert_allclose(np.asarray(kf_out), tcw, atol=1e-6)
    # padded object untouched
    np.testing.assert_allclose(np.asarray(op_out[1]), np.eye(4), atol=1e-6)


def test_object_ba_joint_camera_point_object():
    """Everything free except two gauge cameras: all states converge."""
    cube, pts, tcw, (okf, opt, ouv), boxes = _object_scene(seed=2)
    rng = np.random.default_rng(3)
    n_kf, n_pt = len(tcw), len(pts)

    tcw0 = tcw.copy()
    for i in range(2, n_kf):
        tcw0[i] = np.asarray(
            geo.se3_exp(jnp.asarray(0.02 * rng.normal(size=6), dtype=jnp.float32))
        ) @ tcw0[i]
    pts0 = pts + 0.03 * rng.normal(size=pts.shape).astype(np.float32)
    cube0 = cb.exp_update(cube, jnp.asarray(
        np.concatenate([0.05 * rng.normal(size=6), 0.05 * rng.normal(size=3)]),
        dtype=jnp.float32))

    E = len(okf)
    B = len(tcw)
    out = object_ba.local_ba_objects(
        jnp.asarray(tcw0), jnp.asarray(pts0), jnp.asarray(np.asarray(cube0.pose)[None]),
        jnp.asarray(np.asarray(cube0.scale)[None]), jnp.asarray(K),
        jnp.asarray(okf, dtype=jnp.int32), jnp.asarray(opt, dtype=jnp.int32),
        jnp.asarray(ouv, dtype=jnp.float32), jnp.ones(E, dtype=jnp.float32),
        jnp.ones(E, dtype=bool),
        jnp.arange(B, dtype=jnp.int32), jnp.zeros(B, dtype=jnp.int32),
        jnp.asarray(boxes, dtype=jnp.float32), jnp.full(B, 0.1, dtype=jnp.float32),
        jnp.ones(B, dtype=bool),
        jnp.zeros(n_pt, dtype=jnp.int32), jnp.arange(n_pt, dtype=jnp.int32),
        jnp.full(n_pt, 2.0, dtype=jnp.float32), jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True, True, False, False]),
        jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True]), jnp.asarray([False]),
        num_iters=25,
    )
    kf_out, pts_out, op_out, os_out, cost, _, _ = out
    pose_errs = [
        float(np.linalg.norm(np.asarray(
            geo.se3_log(jnp.asarray(np.linalg.inv(tcw[i]) @ np.asarray(kf_out)[i])))))
        for i in range(n_kf)
    ]
    assert max(pose_errs) < 0.02, pose_errs
    err = float(jnp.linalg.norm(cb.min_log_error(cb.Cuboid(op_out[0], os_out[0]), cube)))
    assert err < 0.08, err


def test_binary_point_cuboid_edges_joint_convergence():
    """EdgePointCuboid binary family (g2o_Object.h:405-432, cpp:356-381):
    a perturbed cuboid AND its perturbed surface points converge jointly
    (points receive gradient through the hinge, not just reprojection)."""
    cube, pts, tcw, (okf, opt, ouv), boxes = _object_scene(seed=4)
    rng = np.random.default_rng(5)
    n_kf, n_pt = len(tcw), len(pts)

    pts0 = pts + 0.05 * rng.normal(size=pts.shape).astype(np.float32)
    cube0 = cb.exp_update(cube, jnp.asarray(
        np.concatenate([0.08 * rng.normal(size=6), 0.06 * rng.normal(size=3)]),
        dtype=jnp.float32))

    E = len(okf)
    B = len(tcw)
    out = object_ba.local_ba_objects(
        jnp.asarray(tcw), jnp.asarray(pts0), jnp.asarray(np.asarray(cube0.pose)[None]),
        jnp.asarray(np.asarray(cube0.scale)[None]), jnp.asarray(K),
        jnp.asarray(okf, dtype=jnp.int32), jnp.asarray(opt, dtype=jnp.int32),
        jnp.asarray(ouv, dtype=jnp.float32), jnp.ones(E, dtype=jnp.float32),
        jnp.ones(E, dtype=bool),
        jnp.arange(B, dtype=jnp.int32), jnp.zeros(B, dtype=jnp.int32),
        jnp.asarray(boxes, dtype=jnp.float32), jnp.full(B, 0.1, dtype=jnp.float32),
        jnp.ones(B, dtype=bool),
        jnp.zeros(n_pt, dtype=jnp.int32), jnp.arange(n_pt, dtype=jnp.int32),
        jnp.full(n_pt, 0.5, dtype=jnp.float32), jnp.ones(n_pt, dtype=bool),
        jnp.ones(n_kf, dtype=bool),      # cameras fixed (gauge)
        jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True]), jnp.asarray([False]),
        num_iters=25, po_binary=True,
    )
    kf_out, pts_out, op_out, os_out, cost, _, _ = out
    # points must improve toward truth
    err0 = float(np.linalg.norm(pts0 - pts, axis=1).mean())
    err1 = float(np.linalg.norm(np.asarray(pts_out) - pts, axis=1).mean())
    assert err1 < 0.6 * err0, (err0, err1)
    # cuboid must improve toward truth
    c_err0 = float(jnp.linalg.norm(cb.min_log_error(cube0, cube)))
    c_err1 = float(jnp.linalg.norm(cb.min_log_error(cb.Cuboid(op_out[0], os_out[0]), cube)))
    assert c_err1 < 0.6 * c_err0, (c_err0, c_err1)


def test_two_stage_schedule_prunes_outliers():
    """optimize(5) -> prune -> optimize(10) (Optimizer.cc:1389-1444):
    grossly-wrong reprojection edges must be pruned and not corrupt the
    solution."""
    cube, pts, tcw, (okf, opt, ouv), boxes = _object_scene(seed=6)
    rng = np.random.default_rng(7)
    n_kf, n_pt = len(tcw), len(pts)
    E = len(okf)
    ouv_bad = ouv.copy()
    bad = rng.choice(E, E // 10, replace=False)
    ouv_bad[bad] += rng.uniform(60, 120, size=(len(bad), 2))

    tcw0 = tcw.copy()
    for i in range(2, n_kf):
        tcw0[i] = np.asarray(
            geo.se3_exp(jnp.asarray(0.02 * rng.normal(size=6), dtype=jnp.float32))
        ) @ tcw0[i]
    pts0 = pts + 0.02 * rng.normal(size=pts.shape).astype(np.float32)

    B = len(tcw)
    out = object_ba.local_ba_objects_two_stage(
        jnp.asarray(tcw0), jnp.asarray(pts0), jnp.asarray(np.asarray(cube.pose)[None]),
        jnp.asarray(np.asarray(cube.scale)[None]), jnp.asarray(K),
        jnp.asarray(okf, dtype=jnp.int32), jnp.asarray(opt, dtype=jnp.int32),
        jnp.asarray(ouv_bad, dtype=jnp.float32), jnp.ones(E, dtype=jnp.float32),
        jnp.ones(E, dtype=bool),
        jnp.arange(B, dtype=jnp.int32), jnp.zeros(B, dtype=jnp.int32),
        jnp.asarray(boxes, dtype=jnp.float32), jnp.full(B, 0.1, dtype=jnp.float32),
        jnp.ones(B, dtype=bool),
        jnp.zeros(n_pt, dtype=jnp.int32), jnp.arange(n_pt, dtype=jnp.int32),
        jnp.full(n_pt, 2.0, dtype=jnp.float32), jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True, True, False, False]),
        jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True]), jnp.asarray([False]),
    )
    kf_out, pts_out, op_out, os_out, cost, inl_r, inl_b = out
    # corrupted edges flagged as outliers
    assert not np.asarray(inl_r)[bad].any()
    # camera poses still recovered despite 10% gross outliers
    pose_errs = [
        float(np.linalg.norm(np.asarray(
            geo.se3_log(jnp.asarray(np.linalg.inv(tcw[i]) @ np.asarray(kf_out)[i])))))
        for i in range(n_kf)
    ]
    assert max(pose_errs) < 0.02, pose_errs


def test_association_promotes_by_shared_points():
    """Candidate detections become ONE landmark when they own common map
    points (Tracking.cc:1879-1923's association currency), and stay
    unpromoted when they see disjoint point sets."""
    import numpy as np

    from cube_slam_tpu.slam.objects import Detection, ObjectManager
    from cube_slam_tpu.slam.state import MapState

    m = MapState(max_kf=4, max_mp=64, n_kp=32)
    for k in range(2):
        m.kf_valid[k] = True
        m.kf_tcw[k] = np.eye(4, dtype=np.float32)
    # map points 0..9 observed by both KFs at keypoints 0..9
    m.mp_valid[:10] = True
    for k in range(2):
        m.kf_kp_valid[k, :10] = True
        m.kf_kp_mp[k, :10] = np.arange(10)
    # KF1 additionally owns disjoint points 20..24 at kps 20..24
    m.mp_valid[20:25] = True
    m.kf_kp_valid[1, 20:25] = True
    m.kf_kp_mp[1, 20:25] = np.arange(20, 25)

    def det(kf, kps):
        return Detection(
            kf_id=kf, local_pose=np.eye(4, dtype=np.float32),
            scale=np.array([0.5, 0.4, 0.3], np.float32),
            bbox=np.array([50, 50, 40, 40], np.float32),
            quality=0.8, owned_kps=np.asarray(kps))

    mgr = ObjectManager(detector=None, min_owned_points=5,
                        min_shared_promote=5, min_obs_to_promote=2)
    d0 = det(0, np.arange(10))
    mgr.detections.append(d0)
    d0.landmark = -2
    # same object seen again: shares all 10 points -> promote, both linked
    d1 = det(1, np.arange(10))
    mgr.associate(m, 1, [d1])
    assert d1.landmark >= 0 and d0.landmark == d1.landmark
    assert mgr.store.valid[d1.landmark]

    # a detection over DISJOINT points must not merge into that candidate
    mgr2 = ObjectManager(detector=None, min_owned_points=5,
                         min_shared_promote=5, min_obs_to_promote=2)
    e0 = det(0, np.arange(10))
    mgr2.detections.append(e0)
    e0.landmark = -2
    e1 = det(1, np.arange(20, 25))
    mgr2.associate(m, 1, [e1])
    assert e1.landmark == -2  # provisional, not promoted
    assert not mgr2.store.valid.any()
