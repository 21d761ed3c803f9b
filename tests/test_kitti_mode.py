"""KITTI-mode end-to-end: offline cuboid rows with tracklet ids + the
fixed-scale prior + ground-scale cadence drive a monocular tracker to a
METRIC trajectory — the reference's headline configuration
(mono_kitti.cc + Tracking_util.cc + Tracking.cc:1925-1961, :2433-2663).

The test asserts objects fix the monocular scale: without them the mono
map's scale is arbitrary (median-depth normalized), so the unaligned
(metric) ATE is large; with offline objects + prior it must shrink.
"""

import numpy as np

from cube_slam_tpu.slam.ground import GroundConfig
from cube_slam_tpu.slam.kitti import KittiMonoTracker
from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
from cube_slam_tpu.utils import np_geometry as np_geo
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)
WH = (320, 240)


def _metric_ate(trajectory, poses):
    """Rigid-align (scale = 1!) using the first tracked frame, then RMS
    position error — a metric-scale check, unlike similarity-aligned ATE."""
    entries = [(fid, T) for fid, T in trajectory if T is not None]
    assert entries, "nothing tracked"
    fid0, T0 = entries[0]
    G = poses[fid0] @ np.asarray(T0, dtype=np.float64)  # SLAM world -> true world
    errs = []
    for fid, Tcw in entries[1:]:
        c_est = (G @ np_geo.inv_T(np.asarray(Tcw, dtype=np.float64)))[:3, 3]
        errs.append(np.linalg.norm(c_est - poses[fid][:3, 3]))
    return float(np.sqrt(np.mean(np.square(errs)))), len(entries), G


def test_kitti_mode_objects_fix_monocular_scale():
    half = np.array([0.5, 0.35, 0.8], dtype=np.float32)
    scene = synth.RoomScene(seed=2, box_center=[-0.8, 3.8, 0.8], box_half=half)
    N = 14
    poses = synth.camera_path(40)[:N]
    init_to_ground = poses[0]  # constant camera-to-ground (KITTI mount)

    # offline cuboid rows: [center(3) yaw scale(3) x y w h prob tid] in the
    # local ground frame (Tracking_util.cc:25-69's 13-column format)
    T_obj, _ = scene.box_pose_scale()
    offline = []
    for i in range(N):
        bbox = scene.box_bbox_2d(poses[i], K, wh=WH)
        if bbox is None:
            offline.append(np.zeros((0, 13)))
            continue
        local_cam = np.linalg.inv(poses[i]) @ T_obj
        pose_lg = init_to_ground @ local_cam
        yaw = float(np.arctan2(pose_lg[1, 0], pose_lg[0, 0]))
        offline.append(np.array([[
            pose_lg[0, 3], pose_lg[1, 3], pose_lg[2, 3], yaw,
            half[0], half[1], half[2],
            bbox[0], bbox[1], bbox[2], bbox[3], 0.9, 7.0,
        ]]))

    frames = [scene.render(poses[i], K, wh=WH) for i in range(N)]
    cfg = TrackerConfig(
        n_features=600, n_levels=3, max_kf=24, max_mp=4096,
        min_init_kps=80, min_init_matches=80, enable_loop_closing=False,
    )

    kt = KittiMonoTracker(
        K, WH, offline, init_to_ground, config=cfg,
        use_truth_trackid=True, car_prior=half,
        ground_cfg=GroundConfig(nominal_height=1.4, every_kfs=3,
                                min_points=12, inlier_thresh=0.03),
        cam_ground_normal=(0.0, -1.0, 0.0),
    )
    for f in frames:
        kt.track(f)

    plain = MonocularTracker(K, WH, cfg)
    for f in frames:
        plain.track(f)

    # final_trajectory recomposes frames through the (rescaled) keyframes
    ate_obj, n_obj, G = _metric_ate(kt.final_trajectory(), poses)
    ate_plain, n_plain, _ = _metric_ate(plain.final_trajectory(), poses)
    assert n_obj >= 0.7 * N
    # metric-scale recovery through objects: the path spans ~3 m, so an
    # arbitrary-scale mono map is off by O(1 m); objects must fix it
    assert ate_obj < 0.30, f"KITTI-mode metric ATE {ate_obj}"
    assert ate_obj < 0.5 * ate_plain, (ate_obj, ate_plain)

    # scale anchored at init + landmark machinery engaged
    assert kt.mono_scale_initialized
    st = kt.objects.store
    assert 7 in kt.objects.trackletid_to_landmark
    o = kt.objects.trackletid_to_landmark[7]
    assert st.valid[o] and st.fix_scale[o]
    np.testing.assert_allclose(st.scale[o], half, atol=1e-6)
    # object landmark localized near truth (fixed-scale BA); the stored
    # pose is in the SLAM world frame -> align with the trajectory's G
    p_world = (G @ np.concatenate([st.pose[o][:3, 3], [1.0]]))[:3]
    assert np.linalg.norm(p_world - T_obj[:3, 3]) < 0.8, p_world


def test_normal_gated_plane_ransac_ignores_walls():
    """The ground fit must find the floor even when wall points dominate
    the candidate set (the hypothesis gate added over plain plane RANSAC)."""
    import jax.numpy as jnp

    from cube_slam_tpu.ops import ransac

    rng = np.random.default_rng(0)
    n_wall, n_floor = 180, 40
    wall = np.stack([rng.uniform(-3, 3, n_wall),
                     np.full(n_wall, 6.0) + rng.normal(0, 0.01, n_wall),
                     rng.uniform(0.3, 2.5, n_wall)], axis=1)
    floor = np.stack([rng.uniform(-3, 3, n_floor),
                      rng.uniform(2, 5, n_floor),
                      rng.normal(0, 0.01, n_floor)], axis=1)
    pts = np.concatenate([wall, floor]).astype(np.float32)
    valid = np.ones(len(pts), dtype=bool)
    samples = ransac.make_triplet_indices(valid, n_hyp=512, seed=1)

    # ungated: locks onto the wall (more points)
    plane_u, _, _ = ransac.fit_plane_ransac(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(samples),
        jnp.float32(0.05))
    assert abs(float(np.asarray(plane_u)[1])) > 0.9  # wall normal ~ +y

    # gated to the floor normal: finds the floor
    plane_g, inl, n_in = ransac.fit_plane_ransac(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(samples),
        jnp.float32(0.05),
        expected_normal=jnp.asarray([0.0, 0.0, 1.0]),
        min_normal_cos=jnp.float32(np.cos(np.deg2rad(10.0))))
    assert abs(float(np.asarray(plane_g)[2])) > 0.98
    assert int(n_in) >= 0.8 * n_floor
    assert not np.asarray(inl)[:n_wall].any()
