"""End-to-end monocular SLAM on a synthetic video-rate sequence."""

import numpy as np
import pytest

from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
from cube_slam_tpu.slam.tracking import evaluate_ate_scaled
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)


def test_mono_slam_synthetic_sequence():
    scene = synth.RoomScene(seed=2)
    N = 14
    poses = synth.camera_path(40)[:N]  # video-rate subset of the arc
    frames = [scene.render(poses[i], K, wh=(320, 240)) for i in range(N)]

    cfg = TrackerConfig(
        n_features=600, n_levels=3, max_kf=24, max_mp=4096,
        min_init_kps=80, min_init_matches=80,
    )
    trk = MonocularTracker(K, (320, 240), cfg)
    for f in range(N):
        trk.track(frames[f])

    est, tru = [], []
    for fid, T in trk.trajectory:
        if T is not None:
            est.append(np.linalg.inv(T))
            tru.append(poses[fid])
    # must initialize early and track the large majority of frames
    assert len(est) >= 0.7 * N, f"tracked only {len(est)}/{N}"
    assert trk.map.mp_valid.sum() > 100
    ate = evaluate_ate_scaled(np.stack(est), np.stack(tru))
    # path spans ~1 m over these frames; allow generous but meaningful bound
    assert ate < 0.2, f"synthetic ATE too high: {ate}"
