"""Dynamic (moving) object tracking — the KITTI-car pipeline.

Re-design of the reference's dynamic-object machinery (SURVEY 2.4 "Dynamic-
object tracking"): instance masks flag object pixels (Frame.cc:221-264),
Harris corners inside the mask are tracked by pyramidal KLT
(SearchByTrackingHarris, ORBmatcher.cc:1524-1580), dynamic points are
triangulated with OBJECT-MOTION-COMPENSATED camera poses
(Tracking.cc:2144-2244), and everything is jointly optimized by
graph/dynamic_ba.py (per-keyframe object poses, object-frame points with
in-box priors, planar-bicycle velocity — Optimizer::
LocalBACameraPointObjectsDynamic).

This module glues those verified components into a per-sequence pipeline:
detections (bbox + per-frame cuboid measurement) and masks in, optimized
per-frame object trajectory + velocity out. Camera poses come from the
static SLAM layer (or ground truth in evaluation).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..graph.dynamic_ba import dynamic_object_ba
from ..ops import klt
from ..utils import np_geometry as np_geo


@dataclass
class DynamicTrackResult:
    obj_pose_per_frame: np.ndarray  # (N, 4, 4) optimized object->world
    velocity: np.ndarray            # (2,) [v, steer]
    local_pts: np.ndarray           # (Q, 3) object-frame points
    n_tracked_pts: int
    chi2: float


def track_dynamic_object(
    frames,          # list of (H, W) grayscale images
    masks,           # list of (H, W) bool instance masks
    cam_tcw,         # (N, 4, 4) camera poses (world->camera)
    stamps,          # (N,) timestamps
    obj_pose_init,   # (N, 4, 4) initial per-frame object poses (detector)
    obj_scale,       # (3,) fixed half-scale (e.g. the KITTI car prior)
    K,
    bboxes=None,     # optional per-frame [x y w h] detections (bbox edges)
    max_pts=64,
    ba_iters=20,
    klt_max_err=45.0,
    motion_weight=1.5,
):
    """Track one moving object through a sequence and jointly optimize its
    per-frame poses, velocity, and surface points."""
    N = len(frames)
    K = np.asarray(K, dtype=np.float32)

    # --- Harris corners on the object in frame 0 (Tracking.cc:2258-2338);
    # erode the mask so corners sit on the object interior (edge corners
    # mix background and die immediately under KLT)
    m0 = masks[0]
    er = m0.copy()
    for dy in (-3, 0, 3):
        for dx in (-3, 0, 3):
            er &= np.roll(np.roll(m0, dy, axis=0), dx, axis=1)
    xy0, valid0 = klt.harris_corners(
        jnp.asarray(frames[0], dtype=jnp.float32), max_corners=max_pts,
        mask=jnp.asarray(er),
    )
    xy0 = np.array(xy0)
    valid0 = np.array(valid0)

    # --- KLT chains through the sequence (SearchByTrackingHarris)
    tracks = np.zeros((N, max_pts, 2), dtype=np.float32)
    alive = np.zeros((N, max_pts), dtype=bool)
    tracks[0] = xy0
    alive[0] = valid0
    def center_uv(i):
        c = obj_pose_init[i][:3, 3]
        pc = cam_tcw[i][:3, :3] @ c + cam_tcw[i][:3, 3]
        uv = K @ pc
        return uv[:2] / max(uv[2], 1e-6)

    for i in range(1, N):
        # seed KLT with the projected object-center motion
        # (SearchByTracking's motion prediction, ORBmatcher.cc:1582-1620)
        guess = (center_uv(i) - center_uv(i - 1)).astype(np.float32)
        pts1, status = klt.pyr_lk(
            jnp.asarray(frames[i - 1], dtype=jnp.float32),
            jnp.asarray(frames[i], dtype=jnp.float32),
            jnp.asarray(tracks[i - 1]), jnp.asarray(alive[i - 1]),
            init_flow=np.broadcast_to(guess, (max_pts, 2)),
            max_err=klt_max_err,
        )
        pts1 = np.array(pts1)
        status = np.array(status)
        # keep only points still on the object mask
        xi = np.clip(pts1[:, 0].astype(int), 0, masks[i].shape[1] - 1)
        yi = np.clip(pts1[:, 1].astype(int), 0, masks[i].shape[0] - 1)
        status &= masks[i][yi, xi]
        tracks[i] = pts1
        alive[i] = status & alive[i - 1]

    # --- initialize object-frame points by motion-compensated triangulation
    # (Tracking.cc:2144-2244): move camera 1 into the object's frame-0
    # position, then classic two-view triangulation
    from .initializer import triangulate

    j = min(2, N - 1)  # a couple of frames of baseline
    P0_obj = obj_pose_init[0].astype(np.float64)
    Pj_obj = obj_pose_init[j].astype(np.float64)
    # camera j expressed as if the object had not moved:
    comp = P0_obj @ np_geo.inv_T(Pj_obj)  # moves frame-j object back to frame-0
    Tcw_j_comp = cam_tcw[j].astype(np.float64) @ np_geo.inv_T(comp)
    P1 = K.astype(np.float64) @ cam_tcw[0][:3, :].astype(np.float64)
    P2 = K.astype(np.float64) @ Tcw_j_comp[:3, :]
    good = alive[j]
    Xw = np.array(triangulate(
        jnp.asarray(P1, dtype=jnp.float32), jnp.asarray(P2, dtype=jnp.float32),
        jnp.asarray(tracks[0]), jnp.asarray(tracks[j]),
    ))
    # world (frame-0 object position) -> object frame
    local = (np_geo.inv_T(P0_obj)[:3, :3] @ Xw.T).T + np_geo.inv_T(P0_obj)[:3, 3]
    # sanity: inside a margin of the box
    inside = (np.abs(local) < 2.0 * np.asarray(obj_scale)).all(axis=1)
    pt_valid = good & inside & np.isfinite(local).all(axis=1)

    # --- dynamic point reprojection edges
    dp_kf, dp_obj, dp_pt, dp_uv = [], [], [], []
    for i in range(N):
        for q in range(max_pts):
            if alive[i][q] and pt_valid[q]:
                dp_kf.append(i)
                dp_obj.append(0)
                dp_pt.append(q)
                dp_uv.append(tracks[i][q])
    if len(dp_kf) < 10:
        raise RuntimeError("too few dynamic point observations")
    E = len(dp_kf)

    mo_k0 = np.arange(N - 1, dtype=np.int32)
    mo_k1 = np.arange(1, N, dtype=np.int32)

    bo_args = {}
    if bboxes is not None:
        bo_kf, bo_meas = [], []
        for i, bb in enumerate(bboxes):
            if bb is not None:
                bo_kf.append(i)
                bo_meas.append([bb[0] + bb[2] / 2.0, bb[1] + bb[3] / 2.0, bb[2], bb[3]])
        if bo_kf:
            B = len(bo_kf)
            bo_args = dict(
                bo_kf=jnp.asarray(np.asarray(bo_kf, dtype=np.int32)),
                bo_obj=jnp.zeros(B, dtype=jnp.int32),
                bo_meas=jnp.asarray(np.asarray(bo_meas, dtype=np.float32)),
                bo_si=jnp.full(B, 0.2, dtype=jnp.float32),
                bo_valid=jnp.ones(B, dtype=bool),
            )

    out = dynamic_object_ba(
        jnp.asarray(cam_tcw.astype(np.float32)), jnp.asarray(np.asarray(stamps, dtype=np.float32)),
        jnp.asarray(obj_pose_init.astype(np.float32)[None]),
        jnp.asarray(np.asarray(obj_scale, dtype=np.float32)[None]),
        jnp.zeros((1, 2), dtype=jnp.float32),
        jnp.asarray(local.astype(np.float32)), jnp.asarray(K),
        jnp.asarray(np.asarray(dp_kf, dtype=np.int32)),
        jnp.asarray(np.asarray(dp_obj, dtype=np.int32)),
        jnp.asarray(np.asarray(dp_pt, dtype=np.int32)),
        jnp.asarray(np.stack(dp_uv).astype(np.float32)),
        jnp.ones(E, dtype=jnp.float32), jnp.ones(E, dtype=bool),
        jnp.zeros(N - 1, dtype=jnp.int32), jnp.asarray(mo_k0), jnp.asarray(mo_k1),
        jnp.ones(N - 1, dtype=bool),
        jnp.ones(N, dtype=bool),                       # cameras fixed (from SLAM)
        jnp.ones((1, N), dtype=bool), jnp.ones(1, dtype=bool),
        jnp.asarray(pt_valid),
        num_iters=ba_iters,
        motion_weight=motion_weight,
        **bo_args,
    )
    kf_out, obj_out, vel_out, pts_out, chi2 = out
    return DynamicTrackResult(
        obj_pose_per_frame=np.array(obj_out)[0],
        velocity=np.array(vel_out)[0],
        local_pts=np.array(pts_out),
        n_tracked_pts=int(pt_valid.sum()),
        chi2=float(chi2),
    )
