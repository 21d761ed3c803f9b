"""Everything-on system test: cuboid object landmarks + loop closing +
monocular scale recovery coexisting in ONE ObjectSlamTracker run — the
configuration the reference actually ships (Tracking.cc object paths and
LoopClosing.cc running simultaneously; System.cc wires both threads
unconditionally), which previous tests only exercised disjointly.

Phase A drives the real tracker over a 60-frame there-and-back orbit with
live TPU cuboid detection, object BA, the object-depth metric scale anchor
(Tracking.cc:852-930) and loop closing enabled, asserting tracking health,
scale recovery, object landmark accuracy, and metric trajectory ATE.

Phase B injects accumulated end-of-loop drift into that SAME live map (the
situation LoopClosing.cc:401-580 resolves: per-keyframe world warp growing
with temporal rank + duplicate landmarks at the revisit) and runs the real
loop path (_try_close_loop: detect -> Sim3 verify -> essential-graph
correct -> object re-anchor -> SearchAndFuse -> global BA), asserting the
keyframe ATE drops AND the object landmark rides the correction — the
object re-anchoring goes BEYOND the reference, whose LoopClosing leaves
MapObjects at stale world poses."""

import numpy as np

import jax.numpy as jnp

from cube_slam_tpu.ops import lsd as lsd_ops
from cube_slam_tpu.slam.system import ObjectSlamTracker, TrackerConfig
from cube_slam_tpu.utils import geometry as geo
from cube_slam_tpu.utils import np_geometry as np_geo
from cube_slam_tpu.utils import synth

K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], dtype=np.float32)
WH = (320, 240)
BOX_CENTER = np.array([0.0, 3.2, 0.45])
BOX_HALF = np.array([0.6, 0.4, 0.45])


def test_everything_on_objects_loop_scale():
    scene = synth.RoomScene(seed=3, box_center=BOX_CENTER, box_half=BOX_HALF)
    # there-and-back orbit with a COSINE time warp: velocity passes smoothly
    # through zero at the turnaround instead of reversing instantly (an
    # instant reversal defeats the constant-velocity motion model and loses
    # tracking at the apex)
    N = 61
    ss = 0.5 - 0.5 * np.cos(np.linspace(0.0, 2.0 * np.pi, N))
    poses = synth.camera_path(N, kind="orbit", target=[0.0, 3.2, 0.6],
                              s_values=ss)  # ends at start

    cfg = TrackerConfig(n_features=800, n_levels=3, max_kf=48, max_mp=8192,
                        min_init_kps=80, min_init_matches=80,
                        match_radius_motion=20.0,
                        enable_loop_closing=True, loop_global_ba=True,
                        loop_min_gap_kfs=6)
    trk = ObjectSlamTracker(K, WH, cfg, ground_Twc0=poses[0])

    for f in range(N):
        frame = scene.render(poses[f], K, wh=WH)
        lines, lv = lsd_ops.detect_lines(
            jnp.asarray(frame, dtype=jnp.float32), min_length=15.0,
            max_lines=128)
        lines_np = np.array(lines)[np.array(lv)]
        bb = scene.box_bbox_2d(poses[f], K, wh=WH)
        trk.track(frame, bboxes_2d=None if bb is None else bb[None, :],
                  lines=lines_np)
    trk.flush()

    # ---- phase A: the whole configuration ran together and stayed healthy
    tracked = {fid: T for fid, T in trk.trajectory if T is not None}
    assert len(tracked) >= 0.8 * N, f"tracked only {len(tracked)}/{N}"
    assert trk.mono_scale_initialized, "object-depth scale anchor never fired"
    st = trk.objects.store
    assert st.valid.any(), "no object landmark promoted"
    o = int(np.where(st.valid)[0][np.argmax(st.n_obs[st.valid])])

    # object landmark accuracy (metric — the scale anchor makes units real)
    center_err = float(np.linalg.norm(st.pose[o][:3, 3] - BOX_CENTER))
    assert center_err < 0.5, f"object center off by {center_err:.3f} m"
    scale_err = float(np.mean(np.abs(np.sort(st.scale[o])
                                     - np.sort(BOX_HALF))))
    assert scale_err < 0.2, f"object half-scale err {scale_err:.3f} m"

    # metric trajectory ATE: with ground_Twc0 given the tracker anchors the
    # SLAM world on the ground at init (build_worldframe_on_ground,
    # Tracking.cc:1103-1116), so Tcw maps ROOM -> camera directly
    errs = []
    for fid, Tcw in tracked.items():
        Twc_room = np_geo.inv_T(Tcw.astype(np.float64))
        errs.append(np.linalg.norm(Twc_room[:3, 3] - poses[fid][:3, 3]))
    ate_live = float(np.sqrt(np.mean(np.square(errs))))
    assert ate_live < 0.5, f"live metric ATE {ate_live:.3f} m"

    # ---- phase B: inject accumulated drift into the LIVE map and close it
    m = trk.map
    kfs = sorted((int(k) for k in m.kf_ids()),
                 key=lambda k: int(m.kf_frame_id[k]))
    Ks = len(kfs)
    # reference-faithful keyframe culling (LocalMapping.cc:833, >=90%
    # redundant) prunes the there-and-back revisit down to ~10 keyframes;
    # the drift-injection harness below only needs a rankable chain
    assert Ks >= 8, f"need a real keyframe chain, got {Ks}"
    rank = {k: i for i, k in enumerate(kfs)}

    tcw_pre = {k: m.kf_tcw[k].copy() for k in kfs}
    mp_pre = m.mp_pos.copy()
    obj_center_pre = st.pose[o][:3, 3].copy()

    # accumulated world warp W_i = D^i applied to rank-i-anchored state
    D = np.asarray(geo.se3_exp(jnp.asarray(
        [0.0, 0.025, 0.0, 0.0625, 0.0, 0.025], dtype=jnp.float32))
    ).astype(np.float64)
    W = [np.eye(4)]
    for _ in range(Ks):
        W.append(W[-1] @ D)

    # keyframes: camera-frame geometry preserved under the warp
    for k in kfs:
        m.kf_tcw[k] = (tcw_pre[k].astype(np.float64)
                       @ np_geo.inv_T(W[rank[k]])).astype(np.float32)
    # map points ride their first-observing keyframe's warp
    for mp in m.mp_ids():
        r = rank.get(int(m.mp_first_kf[mp]), 0)
        m.mp_pos[mp] = (W[r][:3, :3] @ mp_pre[mp].astype(np.float64)
                        + W[r][:3, 3]).astype(np.float32)
    # the object landmark rides its latest measurement keyframe's warp
    anchor_kf = max((d.kf_id for d in trk.objects.meas[o]
                     if d.kf_id in rank), key=lambda k: rank[k])
    Wo = W[rank[anchor_kf]]
    st.pose[o] = (Wo @ st.pose[o].astype(np.float64)).astype(np.float32)

    # the revisit keyframe re-observed early structure; under real drift
    # ALL of those would have been re-triangulated as displaced duplicates
    # (the revisit would share no map points with the early keyframes —
    # that is exactly why the reference needs loop DETECTION rather than
    # covisibility: a covisible pair is not a loop, LoopClosing.cc:152-158)
    k_last = kfs[-1]
    kp_mp = m.kf_kp_mp[k_last]
    early_max = 2
    while True:
        early_pts = set()
        for e in kfs[: early_max + 1]:
            emp = m.kf_kp_mp[e]
            early_pts.update(int(p) for p in emp[emp >= 0])
        sel = [j for j in np.where((kp_mp >= 0) & m.kf_kp_valid[k_last])[0]
               if m.mp_valid[kp_mp[j]]
               and (int(kp_mp[j]) in early_pts
                    or rank.get(int(m.mp_first_kf[kp_mp[j]]), Ks) <= early_max)]
        if len(sel) >= 30 or early_max > Ks // 3:
            break
        early_max += 1
    assert len(sel) >= 25, f"revisit shares only {len(sel)} early points"
    dups = m.alloc_mps(len(sel))
    for dup, j in zip(dups, sel):
        orig = int(kp_mp[j])
        p_dup = W[Ks - 1][:3, :3] @ mp_pre[orig].astype(np.float64) \
            + W[Ks - 1][:3, 3]
        m.mp_pos[dup] = p_dup.astype(np.float32)
        m.mp_desc[dup] = m.mp_desc[orig]
        m.mp_valid[dup] = True
        m.mp_first_kf[dup] = k_last
        m.mp_nobs[dup] = 1
        m.mp_normal[dup] = m.mp_normal[orig]
        m.mp_min_dist[dup] = m.mp_min_dist[orig]
        m.mp_max_dist[dup] = m.mp_max_dist[orig]
        m.kf_kp_mp[k_last, j] = dup

    def kf_ate():
        errs = []
        for k in kfs:
            c = np_geo.inv_T(m.kf_tcw[k].astype(np.float64))[:3, 3]
            c0 = np_geo.inv_T(tcw_pre[k].astype(np.float64))[:3, 3]
            errs.append(np.linalg.norm(c - c0))
        return float(np.sqrt(np.mean(np.square(errs))))

    ate_drifted = kf_ate()
    assert ate_drifted > 0.1, "drift injection too small to matter"

    loops_before = trk.loops_closed
    trk.frame_id = N + 1
    trk.last_Tcw = m.kf_tcw[k_last].copy()
    counts = m.covisibility_counts(k_last)
    trk._try_close_loop(k_last, counts)

    assert trk.loops_closed > loops_before, "loop not detected/verified"
    ate_closed = kf_ate()
    assert ate_closed < 0.6 * ate_drifted, (ate_drifted, ate_closed)

    # the object landmark rode the correction (reference leaves it stale:
    # drifted error would persist); it must return toward its pre-drift
    # position
    obj_err_drifted = float(np.linalg.norm(
        (Wo @ np.append(obj_center_pre, 1.0))[:3] - obj_center_pre))
    obj_err_closed = float(np.linalg.norm(st.pose[o][:3, 3]
                                          - obj_center_pre))
    assert obj_err_closed < 0.6 * obj_err_drifted, \
        (obj_err_drifted, obj_err_closed)

    # the saved trajectory must carry the corrected poses
    final = dict(trk.final_trajectory())
    k_last_fid = int(m.kf_frame_id[k_last])
    assert final[k_last_fid] is not None
    assert np.allclose(final[k_last_fid], m.kf_tcw[k_last], atol=1e-4)
