"""Single-image 3D cuboid detection — the flagship batched kernel.

TPU-native re-design of the reference detector
(detect_3d_cuboid/src/box_proposal_detail.cpp:56-557 `detect_cuboid` and
object_3d_util.cpp). The reference walks a deep loop nest

    bbox -> height-sample -> (cam_roll x cam_pitch x obj_yaw) -> top-pt -> config

with early-`continue`s, evaluating 240-18k proposals per object one at a
time on the CPU. Here the whole lattice is one fused XLA program:

* Canny + exact-L2 distance transform once per (bbox, height) crop region
  (ops/image.py, ops/distance_transform.py),
* vanishing-point support angles per (roll, pitch, yaw) as masked
  reductions over the padded line set,
* the 8-corner ray chain (seg_hit_boundary / lineSegmentIntersect,
  object_3d_util.cpp:194-252) evaluated for every lattice point at once
  with validity masks replacing `continue`,
* distance scoring as one big gather from the distance map
  (box_edge_sum_dists, object_3d_util.cpp:427-453) and angle scoring from
  the VP-support table (:455-492),
* the 2/3-keep score fusion (fuse_normalize_scores_v2, :495-565) as masked
  rank arithmetic,
* 2D->3D lifting (change_2d_corner_to_3d_object, :610-648) batched over
  all proposals,

then a top-k over the combined skew-penalized score
(box_proposal_detail.cpp:517-536). Host code only prepares padded inputs
(line merge is exact-greedy and order-dependent -> ops/lines.py, numpy).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance_transform as dt
from ..ops import image as im_ops
from ..ops import lines as line_ops
from ..utils import geometry as geo
from ..utils import np_geometry as np_geo

BIG = 1e8

# ---------------------------------------------------------------------------
# static tables (box_proposal_detail.cpp:429-446), 0-indexed corner ids
# ---------------------------------------------------------------------------

# config 1: 9 visible edges
_VISIBLE_EDGES_C1 = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 0], [1, 5], [2, 4], [3, 7], [4, 7], [4, 5]], dtype=np.int32
)
# config 2: 7 visible edges
_VISIBLE_EDGES_C2 = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 0], [1, 5], [2, 4], [4, 5]], dtype=np.int32
)
# per-VP pairs of box edges for angle alignment (3 VPs x [e1_1 e1_2 e2_1 e2_2])
_VP_BOX_EDGES_C1 = np.array([[0, 1, 7, 4], [3, 0, 4, 5], [3, 7, 1, 5]], dtype=np.int32)
_VP_BOX_EDGES_C2 = np.array([[0, 1, 2, 3], [3, 0, 4, 5], [2, 4, 1, 5]], dtype=np.int32)
# config-2 distance reweighting (object_3d_util.cpp:442-448)
_EDGE_WEIGHT_C2 = np.array([1.0, 1.0, 1.0, 1.0, 1.5, 1.5, 2.0], dtype=np.float32)
_EDGE_WEIGHT_C1 = np.ones(9, dtype=np.float32)

# corner remap for the final cuboid struct (object_3d_util.cpp:637-640), 0-idx
_CUBOID_REMAP_VP_LEFT = np.array([5, 4, 7, 6, 1, 2, 3, 0], dtype=np.int32)
_CUBOID_REMAP_VP_RIGHT = np.array([4, 5, 6, 7, 2, 1, 0, 3], dtype=np.int32)

# proposal-generation constants (box_proposal_detail.cpp:79-88)
VP12_EDGE_ANGLE_THRE = 15.0
VP3_EDGE_ANGLE_THRE = 10.0
SHORTED_EDGE_THRE = 20.0
WEIGHT_VP_ANGLE = 0.8
WEIGHT_SKEW_ERROR = 1.5


def linespace_cpp(start, end, step):
    """Literal port of the accumulating linespace (matrix_utils.cpp:350-364)
    so sample counts/values match the C++ double accumulation exactly."""
    res = []
    x = float(start)
    while x <= end:
        res.append(x)
        x += step
        if len(res) > 1000:
            break
    return np.asarray(res, dtype=np.float64)


# ---------------------------------------------------------------------------
# geometric primitives of the corner chain
# ---------------------------------------------------------------------------

def _hit_vertical(vp, pt, x_bound, y0, y1):
    """Ray vp->pt extended to the vertical segment x=x_bound, y in [y0, y1]
    (seg_hit_boundary, object_3d_util.cpp:216-228). Returns (hit(2,), ok)."""
    d = pt - vp
    dx = jnp.where(jnp.abs(d[0]) < 1e-12, jnp.where(d[0] < 0, -1e-12, 1e-12), d[0])
    lam = (x_bound - vp[0]) / dx
    hit_y = vp[1] + lam * d[1]
    ok = (lam >= 0) & (y0 <= hit_y) & (hit_y <= y1)
    return jnp.stack([x_bound, hit_y]), ok


def _hit_horizontal(vp, pt, y_bound, x0, x1):
    """Ray vp->pt to the horizontal segment y=y_bound, x in [x0, x1]
    (seg_hit_boundary, object_3d_util.cpp:203-215)."""
    d = pt - vp
    dy = jnp.where(jnp.abs(d[1]) < 1e-12, jnp.where(d[1] < 0, -1e-12, 1e-12), d[1])
    lam = (y_bound - vp[1]) / dy
    hit_x = vp[0] + lam * d[0]
    ok = (lam >= 0) & (x0 <= hit_x) & (hit_x <= x1)
    return jnp.stack([hit_x, y_bound]), ok


def _line_intersect(p1, p2, p3, p4):
    """Infinite-line intersection of (p1,p2) and (p3,p4)
    (lineSegmentIntersect, object_3d_util.cpp:233-252, infinite_line=true).
    Parallel lines yield non-finite values; callers' inside-box checks
    reject them."""
    x21 = p2[0] - p1[0]
    y21 = p2[1] - p1[1]
    x43 = p4[0] - p3[0]
    y43 = p4[1] - p3[1]
    x13 = p1[0] - p3[0]
    y13 = p1[1] - p3[1]
    denom = y43 * x21 - x43 * y21
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    ua = (x43 * y13 - y43 * x13) / denom
    return jnp.stack([p1[0] + x21 * ua, p1[1] + y21 * ua])


def _inside(pt, lt, rb):
    return (lt[0] <= pt[0]) & (pt[0] <= rb[0]) & (lt[1] <= pt[1]) & (pt[1] <= rb[1])


def _norm_ok(a, b):
    return jnp.linalg.norm(a - b) >= SHORTED_EDGE_THRE


def corner_chain(vp1, vp2, vp3, corner1, config_id, bx):
    """Build the 8-corner 2D chain for one proposal; returns
    (corners (8, 2), valid, vp1_position). config_id is static (1 or 2).

    bx: dict of bbox scalars (left_x, top_y, right_x, down_y_expan,
    expan_lt (2,), expan_rb (2,)). Mirrors box_proposal_detail.cpp:254-418.
    """
    left_x, top_y = bx["left_x"], bx["top_y"]
    right_x, down_y = bx["right_x"], bx["down_y_expan"]
    expan_lt, expan_rb = bx["expan_lt"], bx["expan_rb"]

    c2_r, ok_r = _hit_vertical(vp1, corner1, right_x, top_y, down_y)
    c2_l, ok_l = _hit_vertical(vp1, corner1, left_x, top_y, down_y)
    vp1_pos = jnp.where(ok_r, 1, jnp.where(ok_l, 2, 0))
    c2 = jnp.where(ok_r, c2_r, c2_l)
    valid = (vp1_pos > 0) & _norm_ok(corner1, c2)

    x_opp = jnp.where(vp1_pos == 1, left_x, right_x)
    if config_id == 1:
        c4, ok4 = _hit_vertical(vp2, corner1, x_opp, top_y, down_y)
        valid &= ok4 & _norm_ok(corner1, c4)
        c3 = _line_intersect(vp2, c2, vp1, c4)
        valid &= _inside(c3, jnp.stack([left_x, top_y]), jnp.stack([right_x, down_y]))
        valid &= _norm_ok(c3, c4) & _norm_ok(c3, c2)
    else:
        c3, ok3 = _hit_vertical(vp2, c2, x_opp, top_y, down_y)
        valid &= ok3 & _norm_ok(c2, c3)
        c4 = _line_intersect(vp1, c3, vp2, corner1)
        # note: the reference checks this corner against the raw x-range but
        # the distmap-expanded y-range (box_proposal_detail.cpp:347)
        valid &= _inside(c4, jnp.stack([left_x, expan_lt[1]]), jnp.stack([right_x, expan_rb[1]]))
        valid &= _norm_ok(c3, c4) & _norm_ok(c4, corner1)

    c5, ok5 = _hit_horizontal(vp3, c3, down_y, left_x, right_x)
    valid &= ok5 & _norm_ok(c3, c5)
    c6 = _line_intersect(vp2, c5, vp3, c2)
    valid &= _inside(c6, expan_lt, expan_rb) & _norm_ok(c6, c2) & _norm_ok(c6, c5)
    c7 = _line_intersect(vp1, c6, vp3, corner1)
    valid &= _inside(c7, expan_lt, expan_rb) & _norm_ok(c7, corner1) & _norm_ok(c7, c6)
    c8 = _line_intersect(vp1, c5, vp2, c7)
    valid &= _inside(c8, expan_lt, expan_rb) & _norm_ok(c8, c4) & _norm_ok(c8, c5) & _norm_ok(c8, c7)

    corners = jnp.stack([corner1, c2, c3, c4, c5, c6, c7, c8])  # (8, 2)
    corners = jnp.where(valid, corners, 0.0)
    return corners, valid, vp1_pos


# ---------------------------------------------------------------------------
# per-(roll, pitch, yaw) VP support angles
# ---------------------------------------------------------------------------

def vp_support_edge_infos(vps, edge_angles, edge_mids, line_mask):
    """Boundary supported-edge angles per VP (object_3d_util.cpp:380-425).

    vps: (3, 2); edge_angles: (L,); edge_mids: (L, 2); line_mask: (L,) bool.
    Returns (bound_angles (3, 2), has_support (3,) bool).
    """
    thres = jnp.deg2rad(jnp.asarray([VP12_EDGE_ANGLE_THRE, VP12_EDGE_ANGLE_THRE, VP3_EDGE_ANGLE_THRE]))

    def per_vp(vp, thre, swap):
        raw = jnp.arctan2(edge_mids[:, 1] - vp[1], edge_mids[:, 0] - vp[0])  # (L,)
        norm = geo.normalize_to_pi(raw)
        diff = geo.angle_diff_undirected(edge_angles, norm)
        inlier = (diff < thre) & line_mask
        has = jnp.any(inlier)
        # smooth_jump_angles (object_3d_util.cpp:175-189): base = first inlier
        first = jnp.argmax(inlier)
        base = raw[first]
        shifted = jnp.where(raw - base < -jnp.pi, raw + 2 * jnp.pi,
                            jnp.where(raw - base > jnp.pi, raw - 2 * jnp.pi, raw))
        low_idx = jnp.argmax(jnp.where(inlier, shifted, -BIG))
        top_idx = jnp.argmin(jnp.where(inlier, shifted, BIG))
        a0 = jnp.where(swap, edge_angles[top_idx], edge_angles[low_idx])
        a1 = jnp.where(swap, edge_angles[low_idx], edge_angles[top_idx])
        return jnp.stack([a0, a1]), has

    b0, h0 = per_vp(vps[0], thres[0], False)
    b1, h1 = per_vp(vps[1], thres[1], True)
    b2, h2 = per_vp(vps[2], thres[2], True)
    return jnp.stack([b0, b1, b2]), jnp.stack([h0, h1, h2])


def box_edge_angle_error(bound_angles, has_support, vp_box_edges, corners):
    """Angle alignment error (object_3d_util.cpp:455-492).

    bound_angles (3, 2), has_support (3,), vp_box_edges (3, 4) int,
    corners (8, 2). Returns scalar total angle diff."""
    not_found_penalty = np.deg2rad(30.0) * 2.0
    total = 0.0
    for vp_id in range(3):
        per_vp = 0.0
        for ee in range(2):
            p1 = corners[vp_box_edges[vp_id, 2 * ee]]
            p2 = corners[vp_box_edges[vp_id, 2 * ee + 1]]
            ang = geo.normalize_to_pi(jnp.arctan2(p2[1] - p1[1], p2[0] - p1[0]))
            diffs = geo.angle_diff_undirected(ang, bound_angles[vp_id])  # (2,)
            per_vp = per_vp + jnp.min(diffs)
        total = total + jnp.where(has_support[vp_id], per_vp, not_found_penalty)
    return total


def box_edge_sum_dists(dist_map, corners, edge_ids, edge_weights):
    """Summed distance-map values along 11 samples per visible edge
    (object_3d_util.cpp:427-453). corners are full-image coordinates; the
    distance map is full-image (masked to the crop region upstream)."""
    H, W = dist_map.shape
    p1 = corners[edge_ids[:, 0]]  # (E, 2)
    p2 = corners[edge_ids[:, 1]]
    s = jnp.arange(11, dtype=jnp.float32)[:, None, None] / 10.0  # (11, 1, 1)
    pts = s * p1[None] + (1.0 - s) * p2[None]  # (11, E, 2)
    xi = jnp.clip(pts[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(pts[..., 1].astype(jnp.int32), 0, H - 1)
    vals = dist_map[yi, xi]  # (11, E)
    return jnp.sum(vals * edge_weights[None, :])


# ---------------------------------------------------------------------------
# score fusion (fuse_normalize_scores_v2, object_3d_util.cpp:495-565)
# ---------------------------------------------------------------------------

def fuse_normalize_scores(dist_err, angle_err, valid, weight_vp_angle=WEIGHT_VP_ANGLE):
    """Masked port of fuse_normalize_scores_v2. Returns (scores, keep_mask):
    scores are the normalized combined errors for kept proposals (BIG
    elsewhere)."""
    n = jnp.sum(valid)
    d = jnp.where(valid, dist_err, BIG)
    a = jnp.where(valid, angle_err, BIG)

    order_d = jnp.argsort(d, stable=True)
    order_a = jnp.argsort(a, stable=True)
    rank_d = jnp.zeros_like(order_d).at[order_d].set(jnp.arange(d.shape[0]))
    rank_a = jnp.zeros_like(order_a).at[order_a].set(jnp.arange(a.shape[0]))

    bn = jnp.round(n.astype(jnp.float32) / 3.0 * 2.0).astype(jnp.int32)
    a_sorted = jnp.take(a, order_a)
    idx1 = jnp.clip(bn - 1, 0, a.shape[0] - 1)
    idx2 = jnp.clip(bn - 2, 0, a.shape[0] - 1)
    consider_angle = a_sorted[idx1] > a_sorted[idx2]

    keep_small = valid  # n <= 4: keep everything
    keep_d = valid & (rank_d < bn - 1)
    keep_da = keep_d & (rank_a < bn - 1)
    keep = jnp.where(n > 4, jnp.where(consider_angle, keep_da, keep_d), keep_small)

    kd_min = jnp.min(jnp.where(keep, d, BIG))
    kd_max = jnp.max(jnp.where(keep, d, -BIG))
    ka_min = jnp.min(jnp.where(keep, a, BIG))
    ka_max = jnp.max(jnp.where(keep, a, -BIG))
    n_keep = jnp.sum(keep)

    d_span = kd_max - kd_min
    a_span = ka_max - ka_min
    nd = (d - kd_min) / jnp.where(d_span > 0, d_span, 1.0)
    na_norm = (a - ka_min) / jnp.where(a_span > 0, a_span, 1.0)
    # reference quirk: if angle span == 0, the *raw* angles enter the blend
    na = jnp.where(a_span > 0, na_norm, a)
    combined_norm = (nd + weight_vp_angle * na) / (1.0 + weight_vp_angle)
    combined_raw = (d + weight_vp_angle * a) / (1.0 + weight_vp_angle)
    scores = jnp.where(n_keep > 1, combined_norm, combined_raw)
    return jnp.where(keep, scores, BIG), keep


# ---------------------------------------------------------------------------
# 2D -> 3D lifting (object_3d_util.cpp:568-648)
# ---------------------------------------------------------------------------

def ray_plane_interact(rays, plane):
    """rays (..., N, 3) from origin; plane (..., 4). -> intersections (..., N, 3)."""
    denom = jnp.einsum("...k,...nk->...n", plane[..., :3], rays)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    frac = -plane[..., 3:4] / denom
    return frac[..., None] * rays


def plane_hits_3d(Twc, invK, plane_sensor, pixels):
    """Ray-cast pixels (..., N, 2) onto a plane (sensor frame), world output
    (plane_hits_3d, object_3d_util.cpp:574-585)."""
    ph = jnp.concatenate([pixels, jnp.ones(pixels.shape[:-1] + (1,), pixels.dtype)], axis=-1)
    rays = ph @ jnp.swapaxes(invK, -1, -2)
    pts_sensor = ray_plane_interact(rays, plane_sensor)
    return geo.transform_points(Twc, pts_sensor)


def get_wall_plane_equation(g1, g2):
    """World wall plane through ground segment g1-g2 (z=0)
    (object_3d_util.cpp:587-600). g1, g2: (..., 3)."""
    up = jnp.array([0.0, 0.0, 1.0], dtype=g1.dtype)
    n = jnp.cross(g1 - g2, jnp.broadcast_to(up, g1.shape))
    n = n / jnp.where(jnp.linalg.norm(n, axis=-1, keepdims=True) < 1e-12, 1e-12,
                      jnp.linalg.norm(n, axis=-1, keepdims=True))
    dist = -jnp.sum(n * g1, axis=-1, keepdims=True)
    plane = jnp.concatenate([n, dist], axis=-1)
    return jnp.where(dist < 0, -plane, plane)


def lift_to_3d(corners2d, yaw, vp1_pos, Twc, invK, ground_plane_sensor):
    """change_2d_corner_to_3d_object (object_3d_util.cpp:610-648), batched
    over leading dims. corners2d: (..., 8, 2) in chain order; returns
    (pos (..., 3), scale (..., 3), corners2d_struct (..., 8, 2))."""
    gnd_px = corners2d[..., 4:8, :]  # corners 5-8
    gnd_w = plane_hits_3d(Twc, invK, ground_plane_sensor, gnd_px)  # (..., 4, 3)
    length_half = jnp.linalg.norm(gnd_w[..., 0, :] - gnd_w[..., 3, :], axis=-1) / 2
    width_half = jnp.linalg.norm(gnd_w[..., 0, :] - gnd_w[..., 1, :], axis=-1) / 2

    wall_world = get_wall_plane_equation(gnd_w[..., 0, :], gnd_w[..., 1, :])
    wall_sensor = jnp.einsum("...ji,...j->...i", Twc, wall_world)
    top_w = plane_hits_3d(Twc, invK, wall_sensor, corners2d[..., 1:2, :])  # corner 2
    height_half = top_w[..., 0, 2] / 2

    mean_x = jnp.mean(gnd_w[..., :, 0], axis=-1)
    mean_y = jnp.mean(gnd_w[..., :, 1], axis=-1)
    pos = jnp.stack([mean_x, mean_y, height_half], axis=-1)
    scale = jnp.stack([length_half, width_half, height_half], axis=-1)

    remap_l = jnp.asarray(_CUBOID_REMAP_VP_LEFT)
    remap_r = jnp.asarray(_CUBOID_REMAP_VP_RIGHT)
    remap = jnp.where((vp1_pos == 1)[..., None], remap_l, remap_r)  # (..., 8)
    corners_struct = jnp.take_along_axis(corners2d, remap[..., None].repeat(2, -1), axis=-2)
    return pos, scale, corners_struct


# ---------------------------------------------------------------------------
# the fused lattice kernel: one (bbox, height-sample) -> scored proposals
# ---------------------------------------------------------------------------

class LatticeResult(NamedTuple):
    """Flat per-proposal arrays of shape (..., L) / (..., L, k)."""

    valid: jnp.ndarray
    keep: jnp.ndarray          # survived fuse_normalize 2/3 cut
    norm_score: jnp.ndarray    # normalized combined error (BIG if not kept)
    dist_err: jnp.ndarray
    angle_err: jnp.ndarray
    config_id: jnp.ndarray
    vp1_pos: jnp.ndarray
    yaw: jnp.ndarray
    roll: jnp.ndarray
    pitch: jnp.ndarray
    pos: jnp.ndarray           # (..., L, 3)
    scale: jnp.ndarray         # (..., L, 3)
    corners2d: jnp.ndarray     # (..., L, 8, 2) struct order
    down_expand: jnp.ndarray


def _lattice_one_bh(strong, weak, bh, K, invK, Twc_raw, cam_yaw,
                    sample_roll_pitch: bool):
    """Evaluate the full proposal lattice for one (bbox, height-sample).

    bh: dict of padded per-(bbox,height) inputs (see _prepare_bh).
    strong/weak: full-image Canny NMS maps (computed once per frame).
    Returns LatticeResult with L = NRP * NY * NT * 2 flat proposals.
    """
    H, W = strong.shape
    # --- distance map: hysteresis + exact EDT confined to the expanded rect
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    lt, rb = bh["expan_lt"], bh["expan_rb"]
    rect = (xx >= lt[0]) & (xx <= rb[0]) & (yy >= lt[1]) & (yy <= rb[1])
    edges = im_ops.canny_hysteresis(strong & rect, weak & rect)
    from ..ops import pallas_kernels as pk

    if pk.use_pallas():
        dist_map = pk.edt_l2_pallas(edges)
    else:
        dist_map = dt.edt_l2(edges)

    # --- per (roll, pitch): sampled camera pose
    rolls, pitchs, rp_mask = bh["rolls"], bh["pitchs"], bh["rp_mask"]  # (NRP,)
    if sample_roll_pitch:
        R_new = geo.euler_zyx_to_rot(rolls, pitchs, jnp.broadcast_to(cam_yaw, rolls.shape))
    else:
        R_new = jnp.broadcast_to(Twc_raw[:3, :3], rolls.shape + (3, 3))
    t_raw = Twc_raw[:3, 3]
    Twc_new = geo.make_T(R_new, jnp.broadcast_to(t_raw, rolls.shape + (3,)))  # (NRP,4,4)
    gplane_world = jnp.array([0.0, 0.0, 1.0, 0.0], dtype=jnp.float32)
    gplane_sensor = jnp.einsum("rji,j->ri", Twc_new, gplane_world)  # (NRP, 4)
    KinvR = K @ jnp.swapaxes(R_new, -1, -2)  # (NRP, 3, 3)

    # --- per (rp, yaw): vanishing points + VP-support angles
    yaws, yaw_mask = bh["yaws"], bh["yaw_mask"]  # (NY,)

    def vps_of(KiR, yaw):
        d1 = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), 0.0 * yaw])
        d2 = jnp.stack([-jnp.sin(yaw), jnp.cos(yaw), 0.0 * yaw])
        d3 = jnp.stack([0.0 * yaw, 0.0 * yaw, 1.0 + 0.0 * yaw])
        vs = (jnp.stack([d1, d2, d3]) @ KiR.T)  # (3, 3)
        w = vs[:, 2:3]
        w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
        return vs[:, :2] / w

    line_angles, line_mids, line_mask = bh["line_angles"], bh["line_mids"], bh["line_mask"]

    def per_rp_yaw(KiR, yaw):
        vps = vps_of(KiR, yaw)
        bound, has = vp_support_edge_infos(vps, line_angles, line_mids, line_mask)
        return vps, bound, has

    vps_all, bound_all, has_all = jax.vmap(
        lambda KiR: jax.vmap(lambda y: per_rp_yaw(KiR, y))(yaws)
    )(KinvR)  # (NRP, NY, 3, 2), (NRP, NY, 3, 2), (NRP, NY, 3)

    # --- corner chains + scoring over (rp, yaw, top, config)
    top_pts, top_mask = bh["top_pts"], bh["top_mask"]  # (NT, 2), (NT,)
    bx = {
        "left_x": bh["left_x"], "top_y": bh["top_y"], "right_x": bh["right_x"],
        "down_y_expan": bh["down_y_expan"], "expan_lt": lt, "expan_rb": rb,
    }

    edge_tables = [
        (jnp.asarray(_VISIBLE_EDGES_C1), jnp.asarray(_EDGE_WEIGHT_C1), jnp.asarray(_VP_BOX_EDGES_C1)),
        (jnp.asarray(_VISIBLE_EDGES_C2), jnp.asarray(_EDGE_WEIGHT_C2), jnp.asarray(_VP_BOX_EDGES_C2)),
    ]

    def eval_one(vps, bound, has, corner1, config_id):
        corners, ok, vp1_pos = corner_chain(vps[0], vps[1], vps[2], corner1, config_id, bx)
        ids, wts, vpbox = edge_tables[config_id - 1]
        sdist = box_edge_sum_dists(dist_map, corners, ids, wts)
        aerr = box_edge_angle_error(bound, has, vpbox, corners)
        return corners, ok, vp1_pos, sdist / bh["diag"], aerr

    def eval_top(vps, bound, has, corner1):
        outs = [eval_one(vps, bound, has, corner1, cid) for cid in (1, 2)]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(5))  # (2, ...)

    def eval_rpy(vps, bound, has):
        return jax.vmap(lambda c1: eval_top(vps, bound, has, c1))(top_pts)

    corners_l, ok_l, vp1_l, dist_l, ang_l = jax.vmap(jax.vmap(eval_rpy))(
        vps_all, bound_all, has_all
    )  # (NRP, NY, NT, 2, ...)

    NRP, NY, NT = rp_mask.shape[0], yaw_mask.shape[0], top_mask.shape[0]
    full_mask = (
        rp_mask[:, None, None, None]
        & yaw_mask[None, :, None, None]
        & top_mask[None, None, :, None]
        & bh["config_mask"][None, None, None, :]
    )
    valid = ok_l & full_mask

    L = NRP * NY * NT * 2
    flat = lambda x: x.reshape((L,) + x.shape[4:])
    valid_f = flat(valid)
    dist_f = flat(dist_l)
    ang_f = flat(ang_l)
    corners_f = flat(corners_l)  # (L, 8, 2)
    vp1_f = flat(vp1_l)

    # broadcast lattice coordinates to flat
    rp_idx = jnp.arange(NRP)[:, None, None, None]
    y_idx = jnp.arange(NY)[None, :, None, None]
    cfg = jnp.broadcast_to(jnp.arange(1, 3)[None, None, None, :], valid.shape)
    rp_b = jnp.broadcast_to(rp_idx, valid.shape)
    y_b = jnp.broadcast_to(y_idx, valid.shape)
    roll_f = flat(rolls[rp_b])
    pitch_f = flat(pitchs[rp_b])
    yaw_f = flat(yaws[y_b])
    cfg_f = flat(cfg)
    rp_f = flat(rp_b)

    # --- fuse/normalize within this (bbox, height) sample
    norm_score, keep = fuse_normalize_scores(dist_f, ang_f, valid_f)

    # --- lift all proposals to 3D
    Twc_p = Twc_new[rp_f]            # (L, 4, 4)
    gplane_p = gplane_sensor[rp_f]   # (L, 4)
    pos, scale, corners_struct = lift_to_3d(
        corners_f, yaw_f, vp1_f, Twc_p, invK, gplane_p
    )
    good_scale = jnp.all(scale > 0, axis=-1) & jnp.all(jnp.isfinite(scale), axis=-1) \
        & jnp.all(jnp.isfinite(pos), axis=-1)
    keep = keep & good_scale

    return LatticeResult(
        valid=valid_f, keep=keep, norm_score=jnp.where(keep, norm_score, BIG),
        dist_err=dist_f, angle_err=ang_f, config_id=cfg_f, vp1_pos=vp1_f,
        yaw=yaw_f, roll=roll_f, pitch=pitch_f, pos=pos, scale=scale,
        corners2d=corners_struct, down_expand=jnp.broadcast_to(bh["down_expand"], keep.shape),
    )


def unpack_bh(packA, packTop, packLines, packYaw, packRP):
    """Expand the 5 packed transfer arrays into the per-(bbox, height) input
    dict consumed by the lattice kernel. Packing exists purely to minimize
    host->device transfer count (each upload over a tunneled TPU costs
    fixed latency)."""
    return {
        "left_x": packA[..., 0], "top_y": packA[..., 1],
        "right_x": packA[..., 2], "down_y_expan": packA[..., 3],
        "expan_lt": packA[..., 4:6], "expan_rb": packA[..., 6:8],
        "diag": packA[..., 8], "down_expand": packA[..., 9],
        "config_mask": packA[..., 10:12] > 0.5,
        "bh_mask": packA[..., 12] > 0.5,
        "top_pts": packTop[..., :2], "top_mask": packTop[..., 2] > 0.5,
        "line_angles": packLines[..., 0], "line_mids": packLines[..., 1:3],
        "line_mask": packLines[..., 3] > 0.5,
        "yaws": packYaw[..., 0], "yaw_mask": packYaw[..., 1] > 0.5,
        "rolls": packRP[..., 0], "pitchs": packRP[..., 1],
        "rp_mask": packRP[..., 2] > 0.5,
    }


@functools.partial(jax.jit, static_argnames=("sample_roll_pitch", "top_k"))
def detect_lattice_batch(gray, bh_batch, K, invK, Twc_raw, cam_yaw,
                         sample_roll_pitch: bool, top_k: int,
                         nominal_skew_ratio: float, max_cut_skew: float):
    """Full-frame fused detection: Canny NMS once, then vmapped lattice over
    all (bbox, height) samples, then per-bbox top-k over the skew-penalized
    combined score (box_proposal_detail.cpp:517-536).

    bh_batch: either a dict of stacked per-(bbox,height) inputs with leading
    dims (NB, NH) or a tuple of the 5 packed arrays (see unpack_bh).
    Returns (LatticeResult reshaped (NB, NH*L), topk indices, topk score,
    topk valid, packed top-k fields (NB, top_k, 33)).
    """
    if isinstance(bh_batch, (tuple, list)):
        bh_batch = unpack_bh(*bh_batch)
    strong, weak = im_ops.canny_nms(gray)

    NB, NH = bh_batch["left_x"].shape

    def one_bh(bh):
        return _lattice_one_bh(strong, weak, bh, K, invK, Twc_raw, cam_yaw, sample_roll_pitch)

    res = jax.vmap(jax.vmap(one_bh))(bh_batch)  # leading dims (NB, NH)
    bh_valid = bh_batch["bh_mask"]  # (NB, NH)

    # flatten height dim into proposal dim
    def fl(x):
        return x.reshape((NB, -1) + x.shape[3:])

    res = LatticeResult(*[fl(x) for x in res])
    keep = res.keep & jnp.repeat(bh_valid, res.keep.shape[1] // NH, axis=1)

    skew = jnp.max(res.scale[..., :2], axis=-1) / jnp.maximum(
        jnp.min(res.scale[..., :2], axis=-1), 1e-12
    )
    skew_err = WEIGHT_SKEW_ERROR * jnp.maximum(skew - nominal_skew_ratio, 0.0)
    skew_err = jnp.where(skew > max_cut_skew, 100.0, skew_err)
    combined = res.norm_score + WEIGHT_SKEW_ERROR * skew_err
    combined = jnp.where(keep, combined, BIG)

    top_scores_neg, top_idx = jax.lax.top_k(-combined, top_k)  # (NB, top_k)
    top_scores = -top_scores_neg
    top_valid = jnp.take_along_axis(keep, top_idx, axis=1)

    # gather the top-k proposal fields ON DEVICE and pack them into two
    # arrays: host<->device transfers over a tunneled TPU cost ~30 ms per
    # leaf, so shipping 14 full (NB, L, ...) leaves dominated frame time
    def take(x):
        idx = top_idx
        while idx.ndim < x.ndim:
            idx = idx[..., None]
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)

    packed_f = jnp.concatenate(
        [
            take(res.pos), take(res.scale),
            take(res.corners2d).reshape(NB, top_k, 16),
            take(res.yaw)[..., None], take(res.roll)[..., None],
            take(res.pitch)[..., None], take(res.dist_err)[..., None],
            take(res.angle_err)[..., None], take(res.norm_score)[..., None],
            take(res.down_expand)[..., None],
            take(res.config_id).astype(jnp.float32)[..., None],
            take(res.vp1_pos).astype(jnp.float32)[..., None],
            top_scores[..., None],
            top_valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # (NB, top_k, 33)
    return res, top_idx, top_scores, top_valid, packed_f


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------

@dataclass
class CuboidProposal:
    """Host-side view of one detected cuboid (parity with the reference's
    `cuboid` struct, detect_3d_cuboid.h:15-36)."""

    pos: np.ndarray            # (3,)
    rotY: float
    scale: np.ndarray          # (3,) half extents
    box_config_type: np.ndarray  # [config_id, vp1_position]
    box_corners_2d: np.ndarray   # (2, 8) int, struct corner order
    rect_detect_2d: np.ndarray   # (4,) [x y w h]
    edge_distance_error: float
    edge_angle_error: float
    normalized_error: float
    skew_ratio: float
    down_expand_height: float
    camera_roll_delta: float
    camera_pitch_delta: float


@dataclass
class CuboidDetector:
    """Mirror of the reference detector's mode flags
    (detect_3d_cuboid.h:53-80) over the fused TPU lattice kernel."""

    consider_config_1: bool = True
    consider_config_2: bool = True
    whether_sample_cam_roll_pitch: bool = False
    whether_sample_bbox_height: bool = False
    max_cuboid_num: int = 1
    nominal_skew_ratio: float = 1.0
    max_cut_skew: float = 3.0

    # static padding capacities (lattice shape)
    max_lines: int = 80
    max_top_samples: int = 32
    num_yaw_pad: int = 16
    num_rp_pad: int = 25  # 5 x 5 when sampling roll/pitch
    max_height_samples: int = 3
    top_k: int = 16

    K: np.ndarray | None = None

    def set_calibration(self, K):
        self.K = np.asarray(K, dtype=np.float64)

    # -- host prep ---------------------------------------------------------
    def _prepare_bh(self, bbox, down_expand_sample, lines_aligned, img_hw, cam_euler_raw,
                    cam_yaw_raw):
        """Per-(bbox, height-sample) padded inputs
        (box_proposal_detail.cpp:107-191 integer bookkeeping, exact)."""
        img_h, img_w = img_hw
        left_x_raw = int(bbox[0])
        top_y_raw = int(bbox[1])
        obj_width_raw = int(bbox[2])
        obj_height_raw = int(bbox[3])
        right_x_raw = left_x_raw + obj_width_raw

        obj_height_expan = obj_height_raw + down_expand_sample
        down_y_expan = top_y_raw + obj_height_expan
        diag = np.sqrt(obj_width_raw**2 + obj_height_expan**2)

        # top-edge x samples (integer linespace, :144-152)
        step = min(20, obj_width_raw // 10)
        step = max(step, 1)
        top_xs = linespace_cpp(left_x_raw + 5, right_x_raw - 5, step).astype(np.int64)
        top_pts = np.zeros((self.max_top_samples, 2), dtype=np.float32)
        top_mask = np.zeros(self.max_top_samples, dtype=bool)
        nt = min(len(top_xs), self.max_top_samples)
        top_pts[:nt, 0] = top_xs[:nt]
        top_pts[:nt, 1] = top_y_raw
        top_mask[:nt] = True

        # distance-map expansion margin (:155-163)
        wid = min(max(min(20, obj_width_raw - 100), 10), max(min(20, obj_height_expan - 100), 10))
        left_e = max(0, left_x_raw - wid)
        right_e = min(img_w - 1, right_x_raw + wid)
        top_e = max(0, top_y_raw - wid)
        down_e = min(img_h - 1, down_y_expan + wid)

        # lines inside expanded box, greedy-merged (:165-182)
        inside = line_ops.filter_inside_box(lines_aligned, (left_e, top_e), (right_e, down_e))
        merged = line_ops.merge_break_lines(inside, 20.0, 5.0, 30.0)
        angles, mids = line_ops.line_angles_midpoints(merged)
        nl = min(merged.shape[0], self.max_lines)
        line_angles = np.zeros(self.max_lines, dtype=np.float32)
        line_mids = np.zeros((self.max_lines, 2), dtype=np.float32)
        line_mask = np.zeros(self.max_lines, dtype=bool)
        line_angles[:nl] = angles[:nl]
        line_mids[:nl] = mids[:nl]
        line_mask[:nl] = True

        # object yaw samples (:126-128)
        yaw_init = cam_yaw_raw - np.pi / 2.0
        yaw_s = linespace_cpp(yaw_init - np.deg2rad(45.0), yaw_init + np.deg2rad(45.0),
                              np.deg2rad(6.0))
        yaws = np.zeros(self.num_yaw_pad, dtype=np.float32)
        yaw_mask = np.zeros(self.num_yaw_pad, dtype=bool)
        ny = min(len(yaw_s), self.num_yaw_pad)
        yaws[:ny] = yaw_s[:ny]
        yaw_mask[:ny] = True

        # camera roll/pitch samples (:215-226)
        if self.whether_sample_cam_roll_pitch:
            roll_s = linespace_cpp(cam_euler_raw[0] - np.deg2rad(6.0),
                                   cam_euler_raw[0] + np.deg2rad(6.0), np.deg2rad(3.0))
            pitch_s = linespace_cpp(cam_euler_raw[1] - np.deg2rad(6.0),
                                    cam_euler_raw[1] + np.deg2rad(6.0), np.deg2rad(3.0))
        else:
            roll_s = np.array([cam_euler_raw[0]])
            pitch_s = np.array([cam_euler_raw[1]])
        rp = np.array([(r, p) for r in roll_s for p in pitch_s])
        nrp_pad = self.num_rp_pad if self.whether_sample_cam_roll_pitch else 1
        rolls = np.zeros(nrp_pad, dtype=np.float32)
        pitchs = np.zeros(nrp_pad, dtype=np.float32)
        rp_mask = np.zeros(nrp_pad, dtype=bool)
        nrp = min(len(rp), nrp_pad)
        rolls[:nrp] = rp[:nrp, 0]
        pitchs[:nrp] = rp[:nrp, 1]
        rp_mask[:nrp] = True

        return {
            "left_x": np.float32(left_x_raw), "top_y": np.float32(top_y_raw),
            "right_x": np.float32(right_x_raw), "down_y_expan": np.float32(down_y_expan),
            "expan_lt": np.array([left_e, top_e], dtype=np.float32),
            "expan_rb": np.array([right_e, down_e], dtype=np.float32),
            "diag": np.float32(diag),
            "down_expand": np.float32(down_expand_sample),
            "top_pts": top_pts, "top_mask": top_mask,
            "line_angles": line_angles, "line_mids": line_mids, "line_mask": line_mask,
            "yaws": yaws, "yaw_mask": yaw_mask,
            "rolls": rolls, "pitchs": pitchs, "rp_mask": rp_mask,
            "config_mask": np.array([self.consider_config_1, self.consider_config_2]),
            "bh_mask": np.asarray(True),
        }

    def prepare_batch(self, rgb_or_gray, transToWorld, obj_bboxes, lines_raw):
        """Host-side prep: padded (bbox, height) batch + device args for
        detect_lattice_batch. Returns (kernel_args dict, aux dict)."""
        assert self.K is not None, "call set_calibration first"
        from ..utils import io as io_utils

        gray = rgb_or_gray if rgb_or_gray.ndim == 2 else io_utils.rgb_to_gray(rgb_or_gray)
        img_h, img_w = gray.shape
        Twc = np.asarray(transToWorld, dtype=np.float64)
        # host prep must stay numpy-only: eager jnp ops dispatch tiny device
        # programs whose remote compiles dominate wall time
        roll, pitch, yaw = np_geo.rot_to_euler_zyx(Twc[:3, :3])
        cam_euler_raw = (roll, pitch, yaw)

        lines_aligned = line_ops.align_left_right_edges(np.asarray(lines_raw, dtype=np.float64))

        bboxes = np.asarray(obj_bboxes, dtype=np.float64)
        num_obj = bboxes.shape[0]

        # height expansion samples (box_proposal_detail.cpp:114-123)
        def height_samples(bbox):
            samples = [0]
            if self.whether_sample_bbox_height:
                h = int(bbox[3])
                rng = max(min(20, h - 90), 20)
                rng = min(rng, img_h - int(bbox[1]) - h - 1)
                if rng > 10:
                    samples.append(int(round(rng / 2)))
                samples.append(rng)
            return samples[: self.max_height_samples]

        NH = self.max_height_samples if self.whether_sample_bbox_height else 1
        bh_list = []
        for b in range(num_obj):
            hs = height_samples(bboxes[b])
            row = []
            for hi in range(NH):
                if hi < len(hs):
                    d = self._prepare_bh(bboxes[b], hs[hi], lines_aligned, (img_h, img_w),
                                         cam_euler_raw, yaw)
                else:
                    d = self._prepare_bh(bboxes[b], 0, lines_aligned, (img_h, img_w),
                                         cam_euler_raw, yaw)
                    d["bh_mask"] = np.asarray(False)
                row.append(d)
            bh_list.append(row)

        # pack the ~20 per-bh fields into 5 arrays: each host->device upload
        # over a tunneled TPU costs fixed latency, so transfer count matters
        NT = self.max_top_samples
        L = self.max_lines
        NY = self.num_yaw_pad
        NRP = len(bh_list[0][0]["rolls"])
        packA = np.zeros((num_obj, NH, 13), dtype=np.float32)
        packTop = np.zeros((num_obj, NH, NT, 3), dtype=np.float32)
        packLines = np.zeros((num_obj, NH, L, 4), dtype=np.float32)
        packYaw = np.zeros((num_obj, NH, NY, 2), dtype=np.float32)
        packRP = np.zeros((num_obj, NH, NRP, 3), dtype=np.float32)
        for b in range(num_obj):
            for h in range(NH):
                d = bh_list[b][h]
                packA[b, h, 0:4] = [d["left_x"], d["top_y"], d["right_x"], d["down_y_expan"]]
                packA[b, h, 4:6] = d["expan_lt"]
                packA[b, h, 6:8] = d["expan_rb"]
                packA[b, h, 8] = d["diag"]
                packA[b, h, 9] = d["down_expand"]
                packA[b, h, 10:12] = d["config_mask"]
                packA[b, h, 12] = d["bh_mask"]
                packTop[b, h, :, :2] = d["top_pts"]
                packTop[b, h, :, 2] = d["top_mask"]
                packLines[b, h, :, 0] = d["line_angles"]
                packLines[b, h, :, 1:3] = d["line_mids"]
                packLines[b, h, :, 3] = d["line_mask"]
                packYaw[b, h, :, 0] = d["yaws"]
                packYaw[b, h, :, 1] = d["yaw_mask"]
                packRP[b, h, :, 0] = d["rolls"]
                packRP[b, h, :, 1] = d["pitchs"]
                packRP[b, h, :, 2] = d["rp_mask"]

        K32 = jnp.asarray(self.K, dtype=jnp.float32)
        invK = jnp.asarray(np.linalg.inv(self.K), dtype=jnp.float32)
        kernel_args = dict(
            gray=jnp.asarray(gray, dtype=jnp.float32),
            bh_batch=(jnp.asarray(packA), jnp.asarray(packTop), jnp.asarray(packLines),
                      jnp.asarray(packYaw), jnp.asarray(packRP)),
            K=K32, invK=invK, Twc_raw=jnp.asarray(Twc, dtype=jnp.float32),
            cam_yaw=jnp.float32(yaw),
            sample_roll_pitch=self.whether_sample_cam_roll_pitch,
            top_k=self.top_k,
            nominal_skew_ratio=float(self.nominal_skew_ratio),
            max_cut_skew=float(self.max_cut_skew),
        )
        aux = dict(bboxes=bboxes, cam_euler_raw=cam_euler_raw, num_obj=num_obj)
        return kernel_args, aux

    def detect_cuboid(self, rgb_or_gray, transToWorld, obj_bboxes, lines_raw):
        """Reference-equivalent entry point (box_proposal_detail.cpp:56).

        rgb_or_gray: (H, W[, 3]) image; transToWorld: (4, 4) camera-to-world;
        obj_bboxes: (N, >=4) rows [x y w h ...]; lines_raw: (M, 4).
        Returns list (per bbox) of lists of CuboidProposal, best first.
        """
        kernel_args, aux = self.prepare_batch(rgb_or_gray, transToWorld, obj_bboxes, lines_raw)
        res, top_idx, top_scores, top_valid, packed = detect_lattice_batch(**kernel_args)
        bboxes = aux["bboxes"]
        cam_euler_raw = aux["cam_euler_raw"]
        num_obj = aux["num_obj"]

        # ONE small host transfer instead of one per proposal field
        packed = np.asarray(packed)   # (NB, top_k, 33)
        top_valid = packed[..., 32] > 0.5
        out = []
        for b in range(num_obj):
            props = []
            for k in range(min(self.max_cuboid_num, self.top_k)):
                if not top_valid[b, k]:
                    continue
                row = packed[b, k]
                pos = row[0:3]
                scale = row[3:6]
                corners = row[6:22].reshape(8, 2)
                skew = max(scale[0], scale[1]) / max(min(scale[0], scale[1]), 1e-12)
                props.append(CuboidProposal(
                    pos=pos,
                    rotY=float(row[22]),
                    scale=scale,
                    box_config_type=np.array([int(row[29]), int(row[30])]),
                    box_corners_2d=corners.T.astype(np.int32),
                    rect_detect_2d=bboxes[b, :4].copy(),
                    edge_distance_error=float(row[25]),
                    edge_angle_error=float(row[26]),
                    normalized_error=float(row[27]),
                    skew_ratio=float(skew),
                    down_expand_height=float(row[28]),
                    camera_roll_delta=float(row[23] - cam_euler_raw[0]),
                    camera_pitch_delta=float(row[24] - cam_euler_raw[1]),
                ))
            out.append(props)
        return out
