"""System-level loop closing: a drifted synthetic loop injected into a
MonocularTracker's map must be detected, Sim3-verified, corrected through
the essential graph, and fused — and the trajectory ATE must drop.

This drives the REAL tracker path (MonocularTracker._try_close_loop:
signature detection with the absolute candidate floor, verify_loop_sim3,
correct_loop with covisibility + loop edges, SearchAndFuse, global BA) on a
map constructed to mimic end-of-loop drift: the revisit keyframe observes
duplicate map points (same descriptors, drift-displaced positions) of the
first keyframe's points — the situation LoopClosing.cc:401-580 resolves.
"""

import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
from cube_slam_tpu.utils import geometry as geo

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], dtype=np.float32)


def _circle_poses(n, drift_xyz):
    """True closed-loop Tcw chain + per-step-drifted estimates. The drift
    accumulates into a large endpoint gap (the open loop)."""
    step = np.asarray(geo.se3_exp(jnp.asarray(
        [0.0, 2 * np.pi / n, 0.0, 0.4, 0.0, 0.0], dtype=jnp.float32)))
    drift = np.asarray(geo.se3_exp(jnp.asarray(drift_xyz, dtype=jnp.float32)))
    T_true, T_est = np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)
    true_tcw, est_tcw = [], []
    for _ in range(n):
        true_tcw.append(T_true.copy())
        est_tcw.append(T_est.copy())
        T_true = (step @ T_true).astype(np.float32)
        T_est = (drift @ step @ T_est).astype(np.float32)
    return np.stack(true_tcw), np.stack(est_tcw)


def _project(Tcw, pts):
    pc = pts @ Tcw[:3, :3].T + Tcw[:3, 3]
    uv = pc @ K.T
    return uv[:, :2] / np.maximum(uv[:, 2:3], 1e-6), pc[:, 2]


def test_tracker_closes_drifted_loop():
    rng = np.random.default_rng(11)
    n_kf = 14
    pts_per_kf = 48
    share_prev = 32

    true_tcw, est_tcw = _circle_poses(
        n_kf, [0.0, 0.012, 0.0, 0.03, 0.0, 0.0])

    cfg = TrackerConfig(loop_min_gap_kfs=10, loop_covis_theta=30,
                        loop_global_ba=True, max_kf=16, max_mp=2048)
    tr = MonocularTracker(K, img_wh=(640, 480), config=cfg)
    m = tr.map

    # physical points per KF: in front of the TRUE camera
    phys_pts, descs = [], []
    for i in range(n_kf):
        Twc = np.linalg.inv(true_tcw[i].astype(np.float64))
        local = np.stack([rng.uniform(-1.5, 1.5, pts_per_kf),
                          rng.uniform(-1.0, 1.0, pts_per_kf),
                          rng.uniform(3.0, 6.0, pts_per_kf)], axis=1)
        phys_pts.append((local @ Twc[:3, :3].T + Twc[:3, 3]).astype(np.float32))
        descs.append(rng.integers(0, 2**32, (pts_per_kf, 8), dtype=np.uint32))

    # the revisit KF (last) sees KF0's physical points with near-identical
    # descriptors (a real revisit), but they will be stored as NEW map
    # points at drift-displaced positions
    flip = (rng.integers(0, 2**32, (pts_per_kf, 8), dtype=np.uint32)
            & rng.integers(0, 2**32, (pts_per_kf, 8), dtype=np.uint32)
            & rng.integers(0, 2**32, (pts_per_kf, 8), dtype=np.uint32))
    desc_revisit = descs[0] ^ flip  # ~12% bits flipped

    # per-KF world distortion G_i: p_est = G_i @ p_true keeps camera-frame
    # geometry exact under the drifted pose
    G = [np.linalg.inv(est_tcw[i].astype(np.float64)) @ true_tcw[i].astype(np.float64)
         for i in range(n_kf)]

    mp_ids_of_kf = []
    for i in range(n_kf):
        k = m.alloc_kf()
        m.kf_valid[k] = True
        m.kf_tcw[k] = est_tcw[i]
        m.kf_frame_id[k] = i

        if i < n_kf - 1:
            base_pts, base_desc = phys_pts[i], descs[i]
        else:
            base_pts, base_desc = phys_pts[0], desc_revisit
        p_est = (base_pts @ G[i][:3, :3].T + G[i][:3, 3]).astype(np.float32)
        ids = m.alloc_mps(pts_per_kf)
        m.mp_pos[ids] = p_est
        m.mp_valid[ids] = True
        m.mp_desc[ids] = base_desc
        m.mp_first_kf[ids] = k
        m.mp_nobs[ids] = 1
        cam_c = np.linalg.inv(est_tcw[i].astype(np.float64))[:3, 3]
        view = p_est - cam_c
        # scale bounds as UpdateNormalAndDepth produces them for level-0
        # keypoints: max = viewing distance (the projection search derives
        # its predicted-octave window from this — an arbitrary large bound
        # would predict a nonexistent high octave and kill every match)
        m.mp_max_dist[ids] = np.linalg.norm(view, axis=1)
        m.mp_min_dist[ids] = m.mp_max_dist[ids] / 1.2 ** 7
        m.mp_normal[ids] = (view / np.linalg.norm(view, axis=1, keepdims=True)
                            ).astype(np.float32)
        mp_ids_of_kf.append(ids)

        uv, z = _project(est_tcw[i], p_est)
        m.kf_kp_xy[k, :pts_per_kf] = uv
        m.kf_kp_desc[k, :pts_per_kf] = base_desc
        m.kf_kp_valid[k, :pts_per_kf] = z > 0
        m.kf_kp_mp[k, :pts_per_kf] = ids

        # covisibility: also observe some of the previous KF's points
        if i > 0:
            prev = mp_ids_of_kf[i - 1][:share_prev]
            uv2, z2 = _project(est_tcw[i], m.mp_pos[prev])
            s0 = pts_per_kf
            m.kf_kp_xy[k, s0:s0 + share_prev] = uv2
            m.kf_kp_desc[k, s0:s0 + share_prev] = m.mp_desc[prev]
            m.kf_kp_valid[k, s0:s0 + share_prev] = z2 > 0
            m.kf_kp_mp[k, s0:s0 + share_prev] = prev
            m.mp_nobs[prev] += 1

        # populate the keyframe database (in the tracker this happens in
        # _create_keyframe, before loop detection)
        tr.loop_detector.add(k, m.kf_kp_desc[k], m.kf_kp_valid[k])

        # record the as-tracked trajectory the way track() does, so
        # final_trajectory() can recompose through corrected KF poses
        tr.frame_id = i
        tr.ref_kf = k
        tr.trajectory.append((i, est_tcw[i].copy()))
        tr._record_pose(est_tcw[i])

    def kf_errs():
        errs = []
        for i in range(n_kf):
            c_est = np.linalg.inv(m.kf_tcw[i].astype(np.float64))[:3, 3]
            c_true = np.linalg.inv(true_tcw[i].astype(np.float64))[:3, 3]
            errs.append(np.linalg.norm(c_est - c_true))
        return np.asarray(errs)

    def loop_gap():
        """Endpoint consistency: true relative pose KF0<->KF_last applied to
        the estimates — THE metric a pose graph is built to close."""
        rel_true = true_tcw[0] @ np.linalg.inv(true_tcw[n_kf - 1])
        g = (rel_true @ m.kf_tcw[n_kf - 1].astype(np.float64)
             @ np.linalg.inv(m.kf_tcw[0].astype(np.float64)))
        return float(np.linalg.norm(np.asarray(
            geo.se3_log(jnp.asarray(g.astype(np.float32))))))

    errs_before = kf_errs()
    gap_before = loop_gap()
    k_last = n_kf - 1
    tr.frame_id = n_kf
    covis = m.covisibility_counts(k_last)
    tr._try_close_loop(k_last, covis)

    assert tr.loops_closed >= 1, "loop not detected/verified"
    assert (k_last, 0) in [(b, a) for a, b in tr.loop_edges]

    # the open loop must be closed (endpoint consistency restored)
    gap_after = loop_gap()
    assert gap_after < 0.05 * gap_before, (gap_before, gap_after)

    errs_after = kf_errs()
    # trajectory near the revisit must be pulled onto the truth...
    tail_before = float(np.sqrt(np.mean(errs_before[-4:] ** 2)))
    tail_after = float(np.sqrt(np.mean(errs_after[-4:] ** 2)))
    assert tail_after < 0.55 * tail_before, (tail_before, tail_after)
    # ...and the correction must not degrade the rest of the trajectory
    ate_before = float(np.sqrt(np.mean(errs_before ** 2)))
    ate_after = float(np.sqrt(np.mean(errs_after ** 2)))
    assert ate_after < ate_before, (ate_before, ate_after)

    # SearchAndFuse must have merged duplicate geometry: the revisit KF's
    # keypoints should now reference some of KF0's original map points
    revisit_mps = set(m.kf_kp_mp[k_last][m.kf_kp_mp[k_last] >= 0].tolist())
    kf0_mps = set(mp_ids_of_kf[0].tolist())
    assert revisit_mps & kf0_mps, "no loop-side points fused into revisit KF"

    # --- corrected-output contract (System::SaveTrajectoryTUM semantics):
    # the SAVED trajectory file must carry the loop-corrected poses, not
    # the as-tracked drifted ones
    import os
    import tempfile

    from cube_slam_tpu.utils import serialization as ser

    final = dict(tr.final_trajectory())
    for i in range(n_kf):
        assert final[i] is not None
        assert np.allclose(final[i], m.kf_tcw[i], atol=1e-4), i

    path = os.path.join(tempfile.mkdtemp(), "traj_tum.txt")
    ser.save_trajectory_tum(path, np.arange(n_kf, dtype=np.float64),
                            [T for _, T in tr.final_trajectory()])
    rows = np.loadtxt(path)
    assert rows.shape[0] == n_kf
    Twc_corr = np.linalg.inv(m.kf_tcw[k_last].astype(np.float64))
    Twc_drift = np.linalg.inv(est_tcw[k_last].astype(np.float64))
    # the endpoint moved by the correction; the file must show the moved one
    assert np.linalg.norm(Twc_corr[:3, 3] - Twc_drift[:3, 3]) > 0.05
    assert np.allclose(rows[-1, 1:4], Twc_corr[:3, 3], atol=1e-3)
    assert not np.allclose(rows[-1, 1:4], Twc_drift[:3, 3], atol=1e-2)
