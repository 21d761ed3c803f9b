"""Dynamic objects INSIDE the SLAM runtime: a rendered moving box tracked
by the RGBD tracker with integrated masks -> KLT chains -> per-(object, KF)
poses -> joint dynamic BA with FREE cameras.

Asserts BOTH camera ATE and object velocity/trajectory — the verdict's
acceptance test for Tracking.cc:2144-2425 + Optimizer.cc:1537-2573 parity.
"""

import numpy as np

from cube_slam_tpu.slam.dynamic import DynamicDetection, DynamicRgbdTracker
from cube_slam_tpu.slam.system import TrackerConfig
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)
WH = (320, 240)


def test_dynamic_object_in_slam_runtime():
    half = np.array([0.5, 0.35, 0.35], dtype=np.float32)
    scene = synth.RoomScene(seed=3, box_center=[-1.0, 3.5, 0.35], box_half=half)
    N = 12
    v_true = 0.15  # m/frame along world +x (yaw = 0 heading)
    poses = synth.camera_path(40)[:N]

    cfg = TrackerConfig(
        n_features=600, n_levels=3, max_kf=24, max_mp=4096,
        min_init_kps=80, min_init_matches=80,
        new_kf_max_frames=2, enable_loop_closing=False,
    )
    # ground alignment (InitToGround): first camera's true pose in the
    # z-up world so the planar object-motion model applies
    tr = DynamicRgbdTracker(K, WH, cfg, depth_max=15.0, ground_Twc0=poses[0])

    rng = np.random.default_rng(4)
    true_obj = []
    for i in range(N):
        center = np.array([-1.0 + v_true * i, 3.5, 0.35])
        scene.set_box_pose(center, yaw=0.0)
        img, depth, mask = scene.render(
            poses[i], K, wh=WH, return_depth=True, return_mask=True)
        T_obj, _ = scene.box_pose_scale()
        true_obj.append(T_obj.copy())
        dets = None
        bbox = scene.box_bbox_2d(poses[i], K, wh=WH)
        if bbox is not None and mask.sum() > 200:
            # perturbed truth stands in for the per-frame cuboid detector
            local = np.linalg.inv(poses[i]) @ T_obj
            local = local.astype(np.float32)
            local[:3, 3] += 0.02 * rng.normal(size=3).astype(np.float32)
            dets = [DynamicDetection(
                tracklet_id=0, local_pose=local, scale=half,
                bbox=np.asarray(bbox, dtype=np.float32), mask=mask)]
        tr.track(img, depth, dets)

    # ---- camera trajectory must stay metric-accurate (cameras were FREE
    # in the dynamic BA — this asserts the static anchoring worked)
    est, tru = [], []
    for fid, T in tr.trajectory:
        if T is not None:
            est.append(np.linalg.inv(T.astype(np.float64))[:3, 3])
            tru.append(poses[fid][:3, 3])
    assert len(est) >= 0.7 * N, f"tracked only {len(est)}/{N}"
    ate = float(np.sqrt(np.mean(np.sum(
        (np.stack(est) - np.stack(tru)) ** 2, axis=1))))
    # static RGBD baseline on this scene is ~0.106 (integer-pixel depth
    # sampling at 320x240); the dynamic BA must not degrade it materially
    assert ate < 0.15, f"camera ATE too high with dynamic BA: {ate}"

    # ---- object state
    assert 0 in tr.dynamic.chains, "no chain created for the tracklet"
    ch = tr.dynamic.chains[0]
    assert len(ch.kf_pose) >= 3, "object observed in too few keyframes"
    assert ch.velocity_history, "velocity history never written back"
    assert ch.has_local.sum() >= 8, "too few triangulated object points"

    # velocity (m/frame — keyframe stamps are frame ids) recovered
    v_est = float(ch.velocity[0])
    assert abs(abs(v_est) - v_true) < 0.06, (v_est, v_true)

    # per-KF object positions: absolute position has a weakly-observed
    # common-mode depth offset (only the bbox extent pins it — CubeSLAM
    # itself reports ~1 m object position errors on KITTI); assert it stays
    # well under the box diagonal while relative motion is tight below
    m = tr.map
    errs = []
    for k, pose in ch.kf_pose.items():
        fid = int(m.kf_frame_id[k])
        if 0 <= fid < N:
            errs.append(np.linalg.norm(
                pose[:3, 3] - true_obj[fid][:3, 3].astype(np.float32)))
    # measured 0.079 with the reference-shipped edge gating
    # (ba_dyna_pt_obj_cam=false + whether_fixrotation) — pin well below the
    # pre-gating 0.385 so regressions to pose-dragging are caught
    assert np.median(errs) < 0.25, errs

    # object motion direction matches (relative displacement); order by
    # TIME — keyframe slots get recycled, so slot order is not frame order
    kfs = sorted(ch.kf_pose, key=lambda k: int(m.kf_frame_id[k]))
    disp = ch.kf_pose[kfs[-1]][:3, 3] - ch.kf_pose[kfs[0]][:3, 3]
    fid0, fid1 = int(m.kf_frame_id[kfs[0]]), int(m.kf_frame_id[kfs[-1]])
    disp_true = true_obj[fid1][:3, 3] - true_obj[fid0][:3, 3]
    np.testing.assert_allclose(disp, disp_true, atol=0.2)  # measured <=0.09
