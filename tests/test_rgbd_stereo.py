"""RGBD and stereo input paths on synthetic ground truth."""

import numpy as np

from cube_slam_tpu.slam.system import RgbdTracker, StereoTracker, TrackerConfig
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)
WH = (320, 240)


def _cfg():
    return TrackerConfig(n_features=600, n_levels=3, max_kf=24, max_mp=4096,
                         min_inliers_local=15)


def test_rgbd_tracker_metric():
    scene = synth.RoomScene(seed=3)
    N = 10
    poses = synth.camera_path(40)[:N]
    trk = RgbdTracker(K, WH, _cfg(), depth_max=12.0)
    for i in range(N):
        img, depth = scene.render(poses[i], K, wh=WH, return_depth=True)
        trk.track(img, depth=depth)
    est, tru = [], []
    for fid, T in trk.trajectory:
        if T is not None:
            est.append(np.linalg.inv(T))
            tru.append(poses[fid])
    assert len(est) >= 0.8 * N, f"tracked {len(est)}/{N}"
    # depth input makes scale METRIC: unaligned ATE must be small
    est = np.stack(est)
    tru = np.stack(tru)
    # align the first pose (RGBD world = first camera)
    G = tru[0]
    est_w = np.einsum("ij,njk->nik", G, est)
    d = est_w[:, :3, 3] - tru[:, :3, 3]
    ate = float(np.sqrt((d * d).sum(axis=1).mean()))
    # depth residual rows in the BA anchor the metric scale
    assert ate < 0.15, f"metric RGBD ATE too high: {ate}"


def test_stereo_tracker_metric():
    scene = synth.RoomScene(seed=4)
    N = 8
    baseline = 0.12
    poses = synth.camera_path(40)[:N]
    trk = StereoTracker(K, WH, baseline, _cfg(), depth_max=15.0)
    for i in range(N):
        Twc_l = poses[i]
        Twc_r = Twc_l.copy()
        Twc_r[:3, 3] = Twc_l[:3, 3] + Twc_l[:3, :3] @ np.array([baseline, 0.0, 0.0])
        img_l = scene.render(Twc_l, K, wh=WH)
        img_r = scene.render(Twc_r, K, wh=WH)
        trk.track(img_l, img_r)
    est, tru = [], []
    for fid, T in trk.trajectory:
        if T is not None:
            est.append(np.linalg.inv(T))
            tru.append(poses[fid])
    assert len(est) >= 0.7 * N, f"tracked {len(est)}/{N}"
    est = np.stack(est)
    tru = np.stack(tru)
    G = tru[0]
    est_w = np.einsum("ij,njk->nik", G, est)
    d = est_w[:, :3, 3] - tru[:, :3, 3]
    ate = float(np.sqrt((d * d).sum(axis=1).mean()))
    assert ate < 0.2, f"metric stereo ATE too high: {ate}"


def test_stereo_kitti_objects():
    """Stereo KITTI mode (stereo_kitti.cc analog): offline cuboid rows with
    tracklet ids drive object landmarks in the stereo tracker; the metric
    (unaligned) ATE stays small and the car-prior landmark localizes."""
    from cube_slam_tpu.slam.kitti import KittiStereoTracker
    from cube_slam_tpu.utils import np_geometry as np_geo

    half = np.array([0.5, 0.35, 0.8], dtype=np.float32)
    scene = synth.RoomScene(seed=5, box_center=[-0.8, 3.8, 0.8], box_half=half)
    N = 10
    baseline = 0.12
    poses = synth.camera_path(40)[:N]
    init_to_ground = poses[0]

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
            bbox[0], bbox[1], bbox[2], bbox[3], 0.9, 4.0,
        ]]))

    trk = KittiStereoTracker(K, WH, baseline, offline, init_to_ground,
                             config=_cfg(), car_prior=tuple(half),
                             depth_max=15.0)
    for i in range(N):
        Twc_l = poses[i]
        Twc_r = Twc_l.copy()
        Twc_r[:3, 3] = Twc_l[:3, 3] + Twc_l[:3, :3] @ np.array([baseline, 0.0, 0.0])
        trk.track(scene.render(Twc_l, K, wh=WH), scene.render(Twc_r, K, wh=WH))
    trk.flush()

    entries = [(fid, T) for fid, T in trk.final_trajectory() if T is not None]
    assert len(entries) >= 0.7 * N
    fid0, T0 = entries[0]
    G = poses[fid0] @ np.asarray(T0, dtype=np.float64)
    errs = [np.linalg.norm((G @ np_geo.inv_T(np.asarray(T)))[:3, 3]
                           - poses[fid][:3, 3]) for fid, T in entries[1:]]
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.2, f"stereo KITTI metric ATE {ate}"

    st = trk.objects.store
    assert 4 in trk.objects.trackletid_to_landmark
    o = trk.objects.trackletid_to_landmark[4]
    assert st.valid[o] and st.fix_scale[o]
    np.testing.assert_allclose(st.scale[o], half, atol=1e-6)
    # stereo map is metric from frame 0, so the landmark localizes in the
    # aligned world without any scale anchor
    p_world = (G @ np.concatenate([st.pose[o][:3, 3], [1.0]]))[:3]
    assert np.linalg.norm(p_world - T_obj[:3, 3]) < 0.8, p_world
