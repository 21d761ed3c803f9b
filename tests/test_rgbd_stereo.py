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
