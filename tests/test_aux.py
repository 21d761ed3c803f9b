"""Config, serialization, ground-scale, profiler tests."""

import os

import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.config import SlamConfig, kitti_config
from cube_slam_tpu.ops import ransac
from cube_slam_tpu.slam.ground import GroundConfig, GroundScaleEstimator
from cube_slam_tpu.slam.objects import ObjectStore
from cube_slam_tpu.slam.state import MapState
from cube_slam_tpu.utils import np_geometry as np_geo
from cube_slam_tpu.utils import profiler, serialization


def test_config_overrides():
    cfg = SlamConfig.from_overrides(**{"camera.fx": 700.0, "orb.n_features": 2000})
    assert cfg.camera.fx == 700.0
    assert cfg.orb.n_features == 2000
    assert kitti_config().objects.whether_detect_object
    K = cfg.camera.K
    assert K[0, 0] == 700.0


def test_plane_ransac_with_outliers():
    rng = np.random.default_rng(0)
    n = 200
    pts = np.zeros((n, 3), dtype=np.float32)
    # plane z = 0.5 + noise; 30% outliers
    pts[:, 0] = rng.uniform(-5, 5, n)
    pts[:, 1] = rng.uniform(-5, 5, n)
    pts[:, 2] = 0.5 + 0.01 * rng.normal(size=n)
    out_idx = rng.choice(n, 60, replace=False)
    pts[out_idx, 2] = rng.uniform(-3, 3, 60)
    valid = np.ones(n, dtype=bool)
    samples = ransac.make_triplet_indices(valid, n_hyp=256, seed=1)
    plane, inlier, n_in = ransac.fit_plane_ransac(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(samples), jnp.float32(0.05)
    )
    plane = np.array(plane)
    assert int(n_in) > 120
    n_vec = plane[:3] / np.linalg.norm(plane[:3])
    assert abs(abs(n_vec[2]) - 1.0) < 0.01
    # plane offset: n.p + d = 0 at z=0.5
    assert abs(abs(plane[3]) - 0.5) < 0.05


def test_ground_scale_apply():
    m = MapState(max_kf=4, max_mp=64, n_kp=8)
    m.kf_valid[:2] = True
    m.kf_tcw[0] = np.eye(4, dtype=np.float32)
    Twc1 = np.eye(4)
    Twc1[:3, 3] = [1.0, 0.0, 0.0]
    m.kf_tcw[1] = np_geo.inv_T(Twc1).astype(np.float32)
    m.mp_valid[:3] = True
    m.mp_pos[:3] = np.array([[2.0, 0, 0], [0, 2.0, 0], [0, 0, 2.0]], dtype=np.float32)
    GroundScaleEstimator.apply_scale(m, 0, 2.0)
    # anchor (KF0 at origin) fixed; everything else doubles
    np.testing.assert_allclose(m.mp_pos[0], [4.0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np_geo.inv_T(m.kf_tcw[1])[:3, 3], [2.0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np_geo.inv_T(m.kf_tcw[0])[:3, 3], [0, 0, 0], atol=1e-6)


def test_trajectory_writers(tmp_path):
    Tcw = np.eye(4)
    Tcw[:3, 3] = [0.0, 0.0, -1.0]
    p_tum = tmp_path / "traj_tum.txt"
    p_kitti = tmp_path / "traj_kitti.txt"
    serialization.save_trajectory_tum(p_tum, [1.5], [Tcw])
    serialization.save_trajectory_kitti(p_kitti, [Tcw])
    row = open(p_tum).read().split()
    assert len(row) == 8
    np.testing.assert_allclose([float(x) for x in row[1:4]], [0, 0, 1.0], atol=1e-6)
    row = open(p_kitti).read().split()
    assert len(row) == 12
    np.testing.assert_allclose(float(row[3]), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(row[11]), 1.0, atol=1e-9)


def test_map_checkpoint_roundtrip(tmp_path):
    m = MapState(max_kf=4, max_mp=32, n_kp=8)
    m.kf_valid[1] = True
    m.kf_tcw[1, 0, 3] = 3.0
    m.mp_valid[5] = True
    m.mp_pos[5] = [1, 2, 3]
    store = ObjectStore(max_obj=4)
    store.valid[2] = True
    store.scale[2] = [0.5, 0.6, 0.7]
    path = tmp_path / "map.npz"
    serialization.save_map(path, m, store)
    m2, store2 = serialization.load_map(path)
    assert m2.kf_valid[1] and not m2.kf_valid[0]
    np.testing.assert_allclose(m2.mp_pos[5], [1, 2, 3])
    np.testing.assert_allclose(m2.kf_tcw[1, 0, 3], 3.0)
    assert store2.valid[2]
    np.testing.assert_allclose(store2.scale[2], [0.5, 0.6, 0.7])


def test_profiler_aggregation():
    profiler.reset()
    profiler.enable()
    with profiler.span("work"):
        x = sum(range(1000))
    profiler.tictoc("paired")
    profiler.tictoc("paired")
    agg = profiler.aggregated()
    assert "work" in agg and "paired" in agg
    assert agg["work"][4] == 1
    profiler.disable()


def test_replace_mp():
    m = MapState(max_kf=2, max_mp=16, n_kp=8)
    m.kf_valid[:2] = True
    m.mp_valid[[3, 5]] = True
    m.mp_nobs[3] = 3
    m.mp_nobs[5] = 1
    m.kf_kp_mp[0, 2] = 3
    m.kf_kp_mp[1, 4] = 5
    m.replace_mp(5, 3)
    assert not m.mp_valid[5]
    assert m.kf_kp_mp[1, 4] == 3
    assert m.mp_nobs[3] == 4


def test_kitti_offline_cuboid_reader(tmp_path):
    from cube_slam_tpu.utils import io as io_utils

    d = tmp_path / "pred_3d_obj_matched_txt"
    d.mkdir()
    (d / "0000_3d_cuboids.txt").write_text("1 2 3 0.5 1.9 0.8 0.7 100 50 40 30 0.9\n")
    (d / "0001_3d_cuboids.txt").write_text("")
    rows = io_utils.read_offline_cuboid_txts(str(d))
    assert len(rows) == 2
    assert rows[0].shape == (1, 12)
    assert rows[0][0, 3] == 0.5
    assert rows[1].size == 0


def test_metrics_recorder_per_frame(tmp_path):
    """Structured per-frame metrics: attach a recorder to a tracker, run a
    few frames, get one JSONL record per frame + aggregate summary."""
    import json

    import numpy as np

    from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
    from cube_slam_tpu.utils import synth
    from cube_slam_tpu.utils.metrics import MetricsRecorder

    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], np.float32)
    scene = synth.RoomScene(seed=2)
    poses = synth.camera_path(8)
    cfg = TrackerConfig(n_features=600, n_levels=3, max_kf=24, max_mp=4096,
                        min_init_kps=80, min_init_matches=80,
                        enable_loop_closing=False)
    trk = MonocularTracker(K, (320, 240), cfg)
    trk.metrics = MetricsRecorder()
    for i in range(6):
        trk.track(scene.render(poses[i], K, wh=(320, 240)))

    assert len(trk.metrics.records) == 6
    r = trk.metrics.records[-1]
    assert r["state"] == "OK" and r["tracked"] and r["n_kf"] >= 2
    assert r["frame_ms"] > 0

    p = tmp_path / "metrics.jsonl"
    trk.metrics.dump_jsonl(str(p))
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(lines) == 6 and lines[0]["frame_id"] == 0

    s = trk.metrics.summary()
    assert s["frames"] == 6 and 0 < s["tracked_frac"] <= 1.0
    assert s["final_map_points"] > 50


def test_topdown_dynamic_pose_history_rendering():
    """MapDrawer's all-dynamic-poses view: pose-history trails render with
    a fading trail and footprints at the first/latest pose."""
    import numpy as np

    from cube_slam_tpu.viz import drawing

    poses = []
    for i in range(8):
        T = np.eye(4)
        T[:3, 3] = [0.5 * i, 0.1 * i, 0.0]
        poses.append(T)
    img = drawing.draw_map_topdown(
        est_Twc=np.stack([np.eye(4)] * 2),
        dynamic_tracks=[(np.stack(poses), np.array([0.9, 0.4, 0.35]))],
    )
    a = np.asarray(img)
    assert a.shape == (640, 640, 3)
    # the orange trail/footprint pixels must exist (R > G > B channel order)
    orange = (a[:, :, 0] > 150) & (a[:, :, 1] > 80) & (a[:, :, 2] < 100)
    assert orange.sum() > 50
