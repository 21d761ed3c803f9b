"""Software-pipelined tracking (TrackerConfig.pipeline=True).

The pipelined mode dispatches frame N's fused device program without
blocking on its result and resolves frame N-1 meanwhile — the TPU-native
analog of the reference's tracking/mapping thread overlap (System.cc:104-
117). These tests pin the contract: per-frame trajectory records are
identical in structure (every frame id present, in order), tracking quality
matches the synchronous mode, and flush() resolves the final in-flight
frame.
"""

import numpy as np

from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
from cube_slam_tpu.slam.tracking import evaluate_ate_scaled
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)


def _run(pipeline, frames):
    cfg = TrackerConfig(
        n_features=600, n_levels=3, max_kf=24, max_mp=4096,
        min_init_kps=80, min_init_matches=80, pipeline=pipeline,
    )
    trk = MonocularTracker(K, (320, 240), cfg)
    for f in frames:
        trk.track(f)
    trk.flush()
    return trk


def test_pipelined_matches_sync():
    scene = synth.RoomScene(seed=2)
    N = 14
    poses = synth.camera_path(40)[:N]
    frames = [scene.render(poses[i], K, wh=(320, 240)) for i in range(N)]

    sync = _run(False, frames)
    pipe = _run(True, frames)

    # every frame id recorded exactly once, in order, in both modes
    assert [fid for fid, _ in pipe.trajectory] == list(range(N))
    assert [fid for fid, _ in sync.trajectory] == list(range(N))

    n_sync = sum(1 for _, T in sync.trajectory if T is not None)
    n_pipe = sum(1 for _, T in pipe.trajectory if T is not None)
    # the one-frame-stale keyframe re-seed may differ on isolated frames,
    # but tracking quality must match the synchronous mode
    assert n_pipe >= n_sync - 1, (n_pipe, n_sync)

    est, tru = [], []
    for fid, T in pipe.trajectory:
        if T is not None:
            est.append(np.linalg.inv(T))
            tru.append(poses[fid])
    ate = evaluate_ate_scaled(np.stack(est), np.stack(tru))
    assert ate < 0.2, f"pipelined ATE too high: {ate}"


def test_flush_resolves_in_flight_frame():
    scene = synth.RoomScene(seed=2)
    poses = synth.camera_path(40)[:10]
    frames = [scene.render(poses[i], K, wh=(320, 240)) for i in range(10)]
    cfg = TrackerConfig(
        n_features=600, n_levels=3, max_kf=24, max_mp=4096,
        min_init_kps=80, min_init_matches=80, pipeline=True,
    )
    trk = MonocularTracker(K, (320, 240), cfg)
    for f in frames:
        trk.track(f)
    # one frame may still be in flight; poses() auto-flushes
    traj = trk.poses()
    assert trk._pending is None
    assert [fid for fid, _ in traj] == list(range(10))
