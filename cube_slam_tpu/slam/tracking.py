"""Tracking-side jitted kernels: projection search, pose tracking,
epipolar triangulation.

Device-side pieces of Tracking.cc's per-frame pipeline — each kernel is one
fused XLA program over padded arrays:

* `track_pose` — SearchByProjection (ORBmatcher.cc:1373) + PoseOptimization
  (Optimizer.cc:253) in one program: project candidate map points, window-
  match descriptors, robust pose LM, inlier classification.
* `search_local_points` — frustum/distance/angle culling of the whole map
  (Tracking::SearchLocalPoints, Tracking.cc:2673) fused with the window
  match.
* `triangulate_pair` — SearchForTriangulation's epipolar-constrained
  matching (ORBmatcher.cc:679) + SVD triangulation + the cheirality/
  parallax/reprojection/scale acceptance tests (LocalMapping::
  CreateNewMapPoints, LocalMapping.cc:319-653).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import ba
from ..ops import matching
from ..utils import geometry as geo

SCALE_FACTOR = 1.2
BIG = 10_000


def level_sigma2(level):
    return SCALE_FACTOR ** (2.0 * level.astype(jnp.float32))


def _project_batch(Tcw, K, pts):
    """pts (M, 3) -> (uv (M, 2), z (M,))."""
    pc = pts @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = (pc @ K.T)[:, :2] / zs[:, None]
    return uv, z


def predicted_level(dist, mp_max_dist, n_levels, mp_level=None):
    """Scale level PREDICTED from the current viewing distance
    (MapPoint::PredictScale, MapPoint.cc:350-365): the octave this point
    would be detected at from here. Projection windows must use this, not
    the stored creation octave — as the camera approaches/recedes the
    point's apparent scale moves and a creation-level window misses it.

    Points whose scale bounds were never set (mp_max_dist at the 1e9
    initialization default — hand-built maps, fresh depth-backed points
    before the first refresh) fall back to their stored octave when
    `mp_level` is given."""
    ratio = jnp.maximum(mp_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(SCALE_FACTOR))
    lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
    if mp_level is not None:
        lvl = jnp.where(mp_max_dist < 1e8, lvl, mp_level)
    return lvl


@functools.partial(jax.jit, static_argnames=("n_levels",))
def track_pose(
    Tcw_pred, K,
    mp_pos, mp_desc, mp_level, mp_valid,         # (M, ...) candidate map points
    kp_xy, kp_desc, kp_level, kp_valid,          # (N, ...) frame keypoints
    radius, img_wh,
    mp_max_dist=None,
    n_levels: int = 8,
    Tcw_alt=None,
):
    """Project candidates with the predicted pose, window-match, optimize.

    With `Tcw_alt` (the LAST pose, i.e. the zero-velocity hypothesis) the
    pose LM runs from BOTH seeds and keeps the higher-inlier / lower-cost
    solution. Near-planar point sets give the pose problem conjugate local
    minima (the two-fold plane-homography ambiguity); seeding only from the
    velocity prediction lets a single basin-hop feed back through the
    motion model and diverge exponentially — the second seed anchors every
    frame to the previous solution, turning that feedback into a bounded
    random walk. The reference never needs this because its CPU tracking
    re-matches against last-frame keypoints, but the failure mode is real
    on low-depth-variance views (long walls on KITTI, corridors).

    Returns (Tcw, mp_to_kp (M,) int32, inlier (M,) bool, n_inlier)."""
    uv, z = _project_batch(Tcw_pred, K, mp_pos)
    in_img = (
        (z > 0)
        & (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
    )
    cand = mp_valid & in_img

    # window level/radius from the DISTANCE-PREDICTED octave when scale
    # bounds are available (SearchByProjection: th * scaleFactor^level with
    # nPredictedLevel, ORBmatcher.cc:1373-1470), else the stored octave
    if mp_max_dist is not None:
        Twc_t = -(Tcw_pred[:3, :3].T @ Tcw_pred[:3, 3])
        dist = jnp.linalg.norm(mp_pos - Twc_t, axis=1)
        lvl = predicted_level(dist, mp_max_dist, n_levels, mp_level)
    else:
        lvl = mp_level
    r = radius * SCALE_FACTOR ** lvl.astype(jnp.float32)
    d = matching.hamming_matrix(mp_desc, kp_desc, cand, kp_valid)
    wm = matching.window_mask(uv, kp_xy, r, lvl, kp_level, level_slack=1)
    d = jnp.where(wm, d, matching.BIG)
    mp_to_kp, dist = matching.match_mutual_ratio(
        d, max_dist=matching.TH_HIGH, ratio=0.9, mutual=False
    )
    matched = mp_to_kp >= 0

    kp_sel = jnp.clip(mp_to_kp, 0, None)
    uv_meas = kp_xy[kp_sel]
    sig = jnp.sqrt(level_sigma2(kp_level[kp_sel]))
    sqrt_info = 1.0 / sig
    if Tcw_alt is None:
        Tcw, inlier, n_in = ba.pose_optimization(
            Tcw_pred, K, mp_pos, uv_meas, sqrt_info, matched,
        )
    else:
        seeds = jnp.stack([Tcw_pred, Tcw_alt])
        Tcws, inls, nins = jax.vmap(
            lambda s: ba.pose_optimization(
                s, K, mp_pos, uv_meas, sqrt_info, matched))(seeds)

        def _robust_cost(T):
            uv, _ = _project_batch(T, K, mp_pos)
            r = (uv - uv_meas) * sqrt_info[:, None]
            chi2 = jnp.sum(r * r, axis=-1)
            e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
            h = ba.HUBER_MONO
            rho = jnp.where(e <= h, chi2, 2 * h * e - h * h)
            return jnp.sum(rho * matched)

        costs = jax.vmap(_robust_cost)(Tcws)
        # inlier count dominates; robust cost breaks ties
        pick = jnp.argmax(nins.astype(jnp.float32)
                          - costs / (jnp.max(costs) + 1.0))
        Tcw = Tcws[pick]
        inlier = inls[pick]
        n_in = nins[pick]
    return Tcw, jnp.where(inlier, mp_to_kp, -1), inlier, n_in, mp_to_kp


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_local_points(
    Tcw, K,
    mp_pos, mp_desc, mp_level, mp_valid, mp_normal, mp_min_dist, mp_max_dist,
    kp_xy, kp_desc, kp_level, kp_valid, kp_taken,
    img_wh, radius,
    n_levels: int = 8,
):
    """Frustum-culled whole-map projection search (SearchLocalPoints +
    SearchByProjection frame variant). kp_taken marks keypoints already
    matched by track_pose. Returns (mp_to_kp (M,), visible (M,))."""
    uv, z = _project_batch(Tcw, K, mp_pos)
    Twc_t = -(Tcw[:3, :3].T @ Tcw[:3, 3])
    view = mp_pos - Twc_t
    dist = jnp.linalg.norm(view, axis=1)
    viewcos = jnp.sum(view * mp_normal, axis=1) / jnp.where(dist > 1e-9, dist, 1.0)
    visible = (
        mp_valid
        & (z > 0)
        & (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
        & (dist >= 0.8 * mp_min_dist) & (dist <= 1.2 * mp_max_dist)
        & (viewcos > 0.5)  # 60 deg (Frame::isInFrustum)
    )
    d = matching.hamming_matrix(mp_desc, kp_desc, visible, kp_valid & (~kp_taken))
    # distance-predicted octave for the window (Frame::isInFrustum computes
    # mnTrackScaleLevel = PredictScale(dist); SearchByProjection then uses
    # it for the radius and the [l-1, l] level gate)
    lvl = predicted_level(dist, mp_max_dist, n_levels, mp_level)
    r = radius * SCALE_FACTOR ** lvl.astype(jnp.float32)
    wm = matching.window_mask(uv, kp_xy, r, lvl, kp_level, level_slack=1)
    d = jnp.where(wm, d, matching.BIG)
    mp_to_kp, _ = matching.match_mutual_ratio(
        d, max_dist=matching.TH_HIGH, ratio=0.8, mutual=True
    )
    return mp_to_kp, visible


@functools.partial(jax.jit, static_argnames=("n_levels",))
def track_frame_fused(
    Tcw_pred, K,
    cand_ids, cand_valid,                          # (C,) map-point ids + mask
    mp_pos, mp_desc, mp_level, mp_valid,           # FULL map arrays (M, ...)
    mp_normal, mp_min_dist, mp_max_dist,
    kp_xy, kp_desc, kp_level, kp_valid,            # frame keypoints (N, ...)
    radius_motion, radius_local, img_wh,
    n_levels: int = 8,
    Tcw_alt=None,
):
    """The whole happy-path of Tracking::Track's per-frame pipeline as ONE
    device program: motion-model candidate tracking (track_pose), local-map
    projection search (search_local_points), and the final pose
    optimization — with the keypoint->map-point association table built on
    device. One dispatch + one download per frame instead of three
    programs with host bookkeeping between them (which costs several
    host<->device round trips each on real hardware).

    Candidate map-point data is gathered from the FULL map arrays on
    device, so the host uploads only the id list. The rare rescue paths
    (PnP / reference-KF / relocalization) stay host-driven: the caller
    falls back to them when the returned motion-stage inlier count is low.

    Returns (Tcw, kp_mp (N,) int32 global map ids or -1, n_inlier_motion,
    n_inlier_final, visible (M,) bool, raw_match (C,)).
    """
    N = kp_xy.shape[0]
    M = mp_pos.shape[0]
    cand_pos = mp_pos[cand_ids]
    cand_desc = mp_desc[cand_ids]
    cand_level = mp_level[cand_ids]
    cand_max_dist = mp_max_dist[cand_ids]

    Tcw1, mp_to_kp, _inl1, n_in, raw = track_pose(
        Tcw_pred, K, cand_pos, cand_desc, cand_level, cand_valid,
        kp_xy, kp_desc, kp_level, kp_valid, radius_motion, img_wh,
        mp_max_dist=cand_max_dist, n_levels=n_levels, Tcw_alt=Tcw_alt)
    # wide-window retry (TrackWithMotionModel, Tracking.cc:1300-1310: "If
    # few matches, uses a wider window search"): when the prediction error
    # exceeds the window — large inter-frame motion at high resolution —
    # the 2x window recovers the frame the narrow pass lost. Both passes
    # run unconditionally (XLA fixed shapes); the better one wins.
    Tcw1w, mp_to_kp_w, _inlw, n_in_w, raw_w = track_pose(
        Tcw_pred, K, cand_pos, cand_desc, cand_level, cand_valid,
        kp_xy, kp_desc, kp_level, kp_valid, 2.0 * radius_motion, img_wh,
        mp_max_dist=cand_max_dist, n_levels=n_levels, Tcw_alt=Tcw_alt)
    use_wide = (n_in < 20) & (n_in_w > n_in)
    Tcw1 = jnp.where(use_wide, Tcw1w, Tcw1)
    mp_to_kp = jnp.where(use_wide, mp_to_kp_w, mp_to_kp)
    n_in = jnp.where(use_wide, n_in_w, n_in)
    raw = jnp.where(use_wide, raw_w, raw)

    # kp -> global map id from the motion stage (scatter, dummy slot N)
    kp_mp = jnp.full((N + 1,), -1, dtype=jnp.int32)
    m1 = mp_to_kp >= 0
    tgt1 = jnp.where(m1, jnp.clip(mp_to_kp, 0, None), N)
    kp_mp = kp_mp.at[tgt1].set(
        jnp.where(m1, cand_ids.astype(jnp.int32), -1))
    kp_mp = kp_mp.at[N].set(-1)

    mp_to_kp2, visible = search_local_points(
        Tcw1, K, mp_pos, mp_desc, mp_level, mp_valid, mp_normal,
        mp_min_dist, mp_max_dist,
        kp_xy, kp_desc, kp_level, kp_valid, kp_mp[:N] >= 0,
        img_wh, radius_local, n_levels=n_levels)
    m2 = mp_to_kp2 >= 0
    tgt2 = jnp.where(m2, jnp.clip(mp_to_kp2, 0, None), N)
    kp_mp = kp_mp.at[tgt2].set(
        jnp.where(m2, jnp.arange(M, dtype=jnp.int32), -1))
    kp_mp = kp_mp.at[N].set(-1)
    kp_mp = kp_mp[:N]

    # final pose optimization over every associated keypoint
    assoc = (kp_mp >= 0) & kp_valid
    pts = mp_pos[jnp.clip(kp_mp, 0, None)]
    si = 1.0 / (SCALE_FACTOR ** kp_level.astype(jnp.float32))
    Tcw_f, inl_f, n_in2 = ba.pose_optimization(
        Tcw1, K, pts, kp_xy, si, assoc)
    kp_mp = jnp.where(assoc & ~inl_f, -1, kp_mp)
    return Tcw_f, kp_mp, n_in, n_in2, visible, raw


@functools.partial(jax.jit, static_argnames=(
    "orb_cfg", "use_suppress", "radius_motion", "radius_local",
    "min_track", "min_local", "n_cand"))
def step_frame(
    gray,                                     # (H, W) f32 — the ONLY per-frame upload
    last_Tcw, velocity, last_kp_mp,           # device-resident tracker state
    mp_pos, mp_desc, mp_level, mp_valid,      # full-map mirror arrays (M, ...)
    mp_normal, mp_min_dist, mp_max_dist,
    vis_acc, found_acc,                       # (M,) int32 device counters
    K, img_wh,
    suppress,                                 # (H, W) f32 mask or dummy
    orb_cfg=None,
    use_suppress: bool = False,
    radius_motion: float = 15.0,
    radius_local: float = 6.0,
    min_track: int = 10,
    min_local: int = 20,
    n_cand: int = 1024,
):
    """ONE device program for the ENTIRE per-frame happy path:

    ORB pyramid extraction (ops/orb.extract_orb_fused body) -> motion-model
    candidate selection from the previous frame's device-resident
    associations (TrackWithMotionModel's candidate set + _select_best's
    found/visible ranking, on-device top-k) -> fused motion tracking +
    local-map search + final pose optimization (track_frame_fused) ->
    motion-model velocity update -> visibility/found counter accumulation.

    The host uploads ONLY the gray frame and downloads ONLY a small packed
    vector; everything else (tracker state, frame features, counters) stays
    device-resident between frames. This is what makes video-rate tracking
    possible on a tunneled TPU where every host<->device transfer costs a
    round trip (Tracking::Track, Tracking.cc:480-780, restructured).

    Returns (small, new_state, feats, counters, rescue):
      small     (20,) f32: [Tcw_f(16), n_in, n_in2, ok, n_valid_kps]
      new_state (last_Tcw, velocity, kp_mp) — feed back next frame
      feats     dict with xy/level/angle/desc/valid/packed (device)
      counters  (vis_acc, found_acc) — feed back next frame
      rescue    (cand_ids, raw_match) for the host PnP rescue path
    """
    from ..ops import orb as orb_ops

    # accept uint8 frames: 4x less upload bandwidth through the tunnel
    gray = gray.astype(jnp.float32)
    feats = orb_ops._extract_body(gray, orb_cfg)
    kp_xy, kp_desc = feats["xy"], feats["desc"]
    kp_level, kp_valid = feats["level"], feats["valid"]
    if use_suppress:
        H, W = gray.shape
        xi = jnp.clip(kp_xy[:, 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(kp_xy[:, 1].astype(jnp.int32), 0, H - 1)
        kp_valid = kp_valid & (suppress[yi, xi] < 0.5)
        feats = dict(feats, valid=kp_valid)
    feats["packed"] = orb_ops.pack_features(
        feats["xy"], feats["level"], feats["angle"], kp_valid, kp_desc)

    M = mp_pos.shape[0]
    N = kp_xy.shape[0]
    Tcw_pred = velocity @ last_Tcw

    # candidate set: map points associated in the last frame (device
    # scatter), ranked by found/visible (the host _select_best policy),
    # top-n_cand gathered on device. Falls back to the whole map when the
    # last frame contributed too few candidates.
    seen = jnp.zeros((M + 1,), dtype=bool)
    tgt = jnp.where(last_kp_mp >= 0, last_kp_mp, M)
    seen = seen.at[tgt].set(True)[:M]
    cand_mask = seen & mp_valid
    # candidate starvation guard: after one weak frame the last-frame
    # association set shrinks to a handful of points, which caps the next
    # frame's matches at that handful — a feedback spiral down to LOST.
    # Below ~50 candidates, widen to the whole map (the found/visible
    # ranking + top-k keeps the best n_cand) — the reference equivalently
    # falls back from last-frame matching to the local-map search.
    enough = jnp.sum(cand_mask) >= jnp.maximum(min_track, 50)
    cand_mask = jnp.where(enough, cand_mask, mp_valid)
    score = found_acc.astype(jnp.float32) / jnp.maximum(
        vis_acc.astype(jnp.float32), 1.0)
    score = jnp.where(cand_mask, score + 1.0, -1.0)
    _, cand_ids = jax.lax.top_k(score, n_cand)
    cand_valid = cand_mask[cand_ids]

    Tcw_f, kp_mp, n_in, n_in2, visible, raw = track_frame_fused(
        Tcw_pred, K, cand_ids.astype(jnp.int32), cand_valid,
        mp_pos, mp_desc, mp_level, mp_valid, mp_normal,
        mp_min_dist, mp_max_dist,
        kp_xy, kp_desc, kp_level, kp_valid,
        jnp.float32(radius_motion), jnp.float32(radius_local), img_wh,
        n_levels=orb_cfg.n_levels, Tcw_alt=last_Tcw)

    # acceptance (Tracking::Track, :560-640): the FINAL TrackLocalMap count
    # decides. A weak motion stage normally routes to the host rescue
    # chain (its pose seed may be garbage), but when the final stage is
    # decisively healthy (>= 3x min_local inliers — the dual-seed pose LM
    # recovered despite the window mismatch) the frame is tracked; failing
    # it on the motion count alone was resetting runs whose local stage
    # had hundreds of inliers.
    ok = (n_in2 >= min_local) & ((n_in >= min_track)
                                 | (n_in2 >= 3 * min_local))
    okf = ok.astype(jnp.float32)

    # counters only advance on a successful track (host rescue paths update
    # the host arrays directly; these deltas sync at keyframe events)
    vis_acc = vis_acc + (visible & ok).astype(jnp.int32)
    fnd = jnp.zeros((M + 1,), dtype=jnp.int32)
    ftgt = jnp.where((kp_mp >= 0) & ok, kp_mp, M)
    fnd = fnd.at[ftgt].add(1)[:M]
    found_acc = found_acc + fnd

    kp_mp_out = jnp.where(ok, kp_mp, -1)
    new_last_Tcw = jnp.where(ok, Tcw_f, last_Tcw)
    # motion-model update with a translation growth clamp: a single-frame
    # jump >3x the previous speed is a pose glitch, not motion — feeding it
    # back unclamped catapults the next window search off the map (the
    # rescue-path analog of Tracking.cc:1347's mVelocity reset). The clamp
    # is SCALE-FREE: it only engages when the previous velocity is real
    # (non-identity) — right after initialization / relocalization / reset
    # the model is identity and the first tracked frame must re-seed it at
    # full magnitude, whatever the map's scale unit is (an absolute floor
    # here throttled KITTI-scale motion to ~zero and collapsed tracking).
    vel_raw = Tcw_f @ geo.inv_T(last_Tcw)
    prev_n = jnp.linalg.norm(velocity[:3, 3])
    new_n = jnp.linalg.norm(vel_raw[:3, 3])
    cap = 3.0 * prev_n
    clamp = (prev_n > 1e-6) & (new_n > cap)
    tscale = jnp.where(clamp, cap / jnp.maximum(new_n, 1e-12), 1.0)
    vel_raw = vel_raw.at[:3, 3].multiply(tscale)
    new_velocity = jnp.where(ok, vel_raw, velocity)

    small = jnp.concatenate([
        Tcw_f.reshape(-1),
        jnp.stack([n_in.astype(jnp.float32), n_in2.astype(jnp.float32),
                   okf, jnp.sum(kp_valid).astype(jnp.float32)]),
    ])
    return (small, (new_last_Tcw, new_velocity, kp_mp_out), feats,
            (vis_acc, found_acc), (cand_ids, raw))


@jax.jit
def pack_track_state(buf):
    """Unpack a host-packed tracker-state upload: [Tcw(16), vel(16),
    kp_mp bits (N)] -> (Tcw, velocity, kp_mp). One transfer instead of
    three when the host re-seeds the device state after a rescue/reset."""
    Tcw = buf[:16].reshape(4, 4)
    vel = buf[16:32].reshape(4, 4)
    kp_mp = jax.lax.bitcast_convert_type(buf[32:], jnp.int32)
    return Tcw, vel, kp_mp


@functools.partial(jax.jit, static_argnames=())
def triangulate_pair(
    Tcw1, Tcw2, K,
    kp1_xy, kp1_desc, kp1_level, kp1_free,
    kp2_xy, kp2_desc, kp2_level, kp2_free,
    kp1_angle=None, kp2_angle=None,
):
    """Epipolar-constrained matching + triangulation between two keyframes.

    Returns (pts3d (N1, 3) in world, kp2_idx (N1,), ok (N1,))."""
    # fundamental matrix from relative pose (LocalMapping::ComputeF12)
    T12 = Tcw1 @ geo.inv_T(Tcw2)
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    E = geo.hat(t12) @ R12
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ E @ Kinv  # x1^T F12 x2 = 0

    d = matching.hamming_matrix(kp1_desc, kp2_desc, kp1_free, kp2_free)
    # epipolar distance of kp2 to the line of kp1
    ph1 = jnp.concatenate([kp1_xy, jnp.ones((kp1_xy.shape[0], 1))], axis=1)
    ph2 = jnp.concatenate([kp2_xy, jnp.ones((kp2_xy.shape[0], 1))], axis=1)
    lines2 = ph1 @ F12  # (N1, 3) lines in image 2
    num = jnp.abs(lines2 @ ph2.T)  # (N1, N2)
    den = jnp.sqrt(lines2[:, 0:1] ** 2 + lines2[:, 1:2] ** 2)
    ep_dist2 = (num / jnp.where(den > 1e-9, den, 1e-9)) ** 2
    sig2 = level_sigma2(kp2_level)[None, :]
    ok_ep = ep_dist2 < 3.84 * sig2
    # near-epipole exclusion (SearchForTriangulation, ORBmatcher.cc:
    # 716-725): a kp2 near the projection of camera-1's center matches the
    # epipolar constraint of EVERY kp1, and its triangulated depth is
    # arbitrary — these are the fat tail of wrong-depth map points that
    # poison pose tracking whenever the epipole is inside the image.
    o1 = -(Tcw1[:3, :3].T @ Tcw1[:3, 3])
    e2c = Tcw2[:3, :3] @ o1 + Tcw2[:3, 3]
    e2z = jnp.where(jnp.abs(e2c[2]) < 1e-9, 1e-9, e2c[2])
    e2 = (K @ e2c)[:2] / e2z
    d_ep2 = jnp.sum((kp2_xy - e2[None, :]) ** 2, axis=1)
    far_from_epipole = (d_ep2 >= 100.0 * SCALE_FACTOR
                        ** kp2_level.astype(jnp.float32)) | (e2c[2] <= 0)
    ok_ep = ok_ep & far_from_epipole[None, :]
    d = jnp.where(ok_ep, d, matching.BIG)
    # ratio 0.8 (not the reference's none): SearchForTriangulation only
    # compares descriptors that share a BoW vocabulary node — a strong
    # implicit ambiguity filter. All-vs-all epipolar matching has no such
    # gate, and an ambiguous match ALONG the epipolar line triangulates to
    # a self-consistent point at the wrong depth (it passes every
    # reprojection test by construction). The ratio test is the dense-
    # matching replacement for the BoW-node gate.
    m12, _ = matching.match_mutual_ratio(d, max_dist=matching.TH_LOW, ratio=0.8, mutual=True)
    if kp1_angle is not None and kp2_angle is not None:
        # SearchForTriangulation runs with checkOrientation=true: matches
        # outside the dominant rotation-histogram bins are spurious
        m12 = matching.rotation_consistency(kp1_angle, kp2_angle, m12)
    matched = m12 >= 0

    kp2_sel = jnp.clip(m12, 0, None)
    p2 = kp2_xy[kp2_sel]
    P1 = K @ Tcw1[:3, :]
    P2 = K @ Tcw2[:3, :]
    from .initializer import triangulate

    X = triangulate(P1, P2, kp1_xy, p2)  # (N1, 3) world

    # acceptance checks (CreateNewMapPoints, LocalMapping.cc:430-640)
    def depth_of(Tcw, X):
        return (X @ Tcw[:3, :3].T + Tcw[:3, 3])[:, 2]

    z1 = depth_of(Tcw1, X)
    z2 = depth_of(Tcw2, X)
    o1 = -(Tcw1[:3, :3].T @ Tcw1[:3, 3])
    o2 = -(Tcw2[:3, :3].T @ Tcw2[:3, 3])
    v1 = X - o1
    v2 = X - o2
    n1 = jnp.linalg.norm(v1, axis=1)
    n2 = jnp.linalg.norm(v2, axis=1)
    cos_par = jnp.sum(v1 * v2, axis=1) / jnp.where(n1 * n2 > 1e-12, n1 * n2, 1e-12)

    uv1, _ = _project_batch(Tcw1, K, X)
    uv2, _ = _project_batch(Tcw2, K, X)
    e1 = jnp.sum((uv1 - kp1_xy) ** 2, axis=1)
    e2 = jnp.sum((uv2 - p2) ** 2, axis=1)
    s1 = level_sigma2(kp1_level)
    s2 = level_sigma2(kp2_level[kp2_sel])

    # scale consistency (LocalMapping.cc:601-614): the distance ratio to
    # the two cameras must agree with the octave ratio of the two
    # detections within ratioFactor = 1.5 * scaleFactor. Wrong matches on
    # the epipolar line pass the reprojection tests by construction; their
    # detection octaves usually don't agree with the implied geometry.
    ratio_dist = n2 / jnp.where(n1 > 1e-12, n1, 1e-12)
    ratio_octave = (SCALE_FACTOR ** kp1_level.astype(jnp.float32)
                    / SCALE_FACTOR ** kp2_level[kp2_sel].astype(jnp.float32))
    ratio_factor = 1.5 * SCALE_FACTOR
    ok_scale = ((ratio_dist * ratio_factor >= ratio_octave)
                & (ratio_dist <= ratio_octave * ratio_factor))

    ok = (
        matched
        & (z1 > 0) & (z2 > 0)
        & (cos_par < 0.9998)
        & (e1 < 5.991 * s1) & (e2 < 5.991 * s2)
        & ok_scale
        & jnp.isfinite(X).all(axis=1)
    )
    return X, m12, ok


@functools.partial(jax.jit, static_argnames=())
def triangulate_multi(Tcw1, Tcw2_stack, K,
                      kp1_xy, kp1_desc, kp1_level, kp1_free,
                      kp2_xy_s, kp2_desc_s, kp2_level_s, kp2_free_s,
                      kp1_angle=None, kp2_angle_s=None):
    """triangulate_pair vmapped over a stack of neighbor keyframes — ONE
    device program covers every triangulation baseline of a new keyframe
    (the host previously dispatched one program per covisible neighbor).
    Pad unused neighbor slots with all-False kp2_free masks."""
    fn = jax.vmap(
        triangulate_pair,
        in_axes=(None, 0, None, None, None, None, None, 0, 0, 0, 0,
                 None, 0))
    return fn(Tcw1, Tcw2_stack, K, kp1_xy, kp1_desc, kp1_level, kp1_free,
              kp2_xy_s, kp2_desc_s, kp2_level_s, kp2_free_s,
              kp1_angle, kp2_angle_s)


@functools.partial(jax.jit, static_argnames=("n_levels",))
def search_local_points_multi(Tcw_stack, K,
                              mp_pos, mp_desc, mp_level, mp_valid,
                              mp_normal, mp_min_dist, mp_max_dist,
                              kp_xy_s, kp_desc_s, kp_level_s, kp_valid_s,
                              kp_taken_s, img_wh, radius, n_levels=8):
    """search_local_points vmapped over a stack of target keyframes (the
    SearchInNeighbors fusion projects one candidate set into several
    covisible keyframes — one program instead of one per neighbor)."""
    fn = jax.vmap(
        functools.partial(search_local_points, n_levels=n_levels),
        in_axes=(0, None, None, None, None, None, None, None, None,
                 0, 0, 0, 0, 0, None, None))
    return fn(Tcw_stack, K, mp_pos, mp_desc, mp_level, mp_valid,
              mp_normal, mp_min_dist, mp_max_dist,
              kp_xy_s, kp_desc_s, kp_level_s, kp_valid_s, kp_taken_s,
              img_wh, radius)


def evaluate_ate_scaled(est_Twc, truth_Twc):
    """Mono ATE with Sim3 (Umeyama) alignment — scale is unobservable in
    pure monocular SLAM."""
    x = est_Twc[:, :3, 3]
    y = truth_Twc[:, :3, 3]
    mx = x.mean(axis=0)
    my = y.mean(axis=0)
    xc = x - mx
    yc = y - my
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc * xc).sum() / len(x)
    s = np.trace(np.diag(D) @ S) / var_x if var_x > 0 else 1.0
    t = my - s * R @ mx
    aligned = (s * (R @ x.T)).T + t
    d = aligned - y
    return float(np.sqrt((d * d).sum(axis=1).mean()))
