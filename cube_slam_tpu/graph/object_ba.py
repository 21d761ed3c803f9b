"""Camera + point + cuboid-object bundle adjustment.

Re-design of Optimizer::LocalBACameraPointObjects (orb_object_slam/src/
Optimizer.cc:826-1534): the optimizer that makes CubeSLAM CubeSLAM. Three
edge families over one reduced system:

* point reprojection (camera <-> point), Schur-eliminated points,
* camera-object 2D bbox projection (EdgeSE3CuboidProj, g2o_Object.cpp:
  118-153): project the cuboid's 8 corners, bound them, compare
  [cx cy w h] to the detected box; Huber delta = 30 px, information
  proportional to camera_object_BA_weight * quality^2 (Optimizer.cc:
  1279-1366),
* object-point hinge, in BOTH reference flavors:
  - unary (EdgePointCuboidOnlyObject, g2o_Object.cpp:300-354): owned map
    points pull the cuboid around them; points enter as constants
    (stop_gradient) — the default, matching LocalBACameraPointObjects'
    active branch (Optimizer.cc:1234-1254),
  - binary (EdgePointCuboid[FixScale], g2o_Object.h:405-432, cpp:356-381):
    point and cuboid jointly optimized; the error is
    |point_boundary_error|/scale + 0.2*scale (shape prior), and the point
    blocks enter the Schur system through the same generalized coupling W
    as the reprojection edges. Enabled with po_binary=True.

Cameras and objects form the reduced block (objects are few); points are
eliminated exactly as in graph/ba.py. Object scale can be frozen per
object (VertexCuboidFixScale, the KITTI car prior 1.9420/0.8143/0.7631,
Optimizer.cc:994).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..models import cuboid as cb
from ..utils import geometry as geo
from .ba import CHI2_MONO, HUBER_MONO, _project, huber_weight

HUBER_BBOX = 30.0
# effectively quadratic: the reference's point-cuboid edge carries identity
# information with NO robust kernel (Optimizer.cc:1245-1247), and the
# scale-normalized truncated hinge is already bounded at
# max_outside_margin_ratio (=1) per axis — a small Huber delta here would
# down-weight exactly the points resisting a scale collapse, making the
# collapse self-reinforcing (measured)
HUBER_PT_OBJ = 10.0


def _robust_cost(r, delta, valid):
    chi2 = jnp.sum(r * r, axis=-1)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
    rho = jnp.where(e <= delta, chi2, 2 * delta * e - delta * delta)
    return jnp.sum(rho * valid)


# ---------------------------------------------------------------------------
# Shared building blocks (used by the single-device solver below AND the
# edge-sharded multi-chip solver in parallel/sharded_ba.py — the sharded
# path assembles these same blocks from its LOCAL edge shard and psums them,
# then runs the identical reduced solve replicated.)
# ---------------------------------------------------------------------------


def _hinge_residual_unary(cub, p, si):
    """EdgePointCuboidOnlyObject error (point constant), scale-normalized
    exactly as the reference (g2o_Object.cpp:300-327: `point_edge_error /
    estimate_cube.scale`). The normalization is load-bearing: the raw
    truncated hinge's far-point branch is `ratio * scale`, whose gradient
    wrt scale is POSITIVE — an un-normalized edge rewards collapsing the
    box to zero through its outlier points (measured: the depth half-extent
    pinched to 0.01 at a frontal revisit view where the bbox edge cannot
    see depth). Dividing by scale makes the truncated branch constant
    (no shrink reward) and the linear branch push the surface outward."""
    err = cb.point_boundary_error(cub, p[:, None, :])[:, 0, :]
    return err / jnp.maximum(cub.scale, 1e-6) * si[:, None]


# weak shape prior of the reference's indoor branch (g2o_Object.cpp:
# 318-327: `prior_weight = 0.2; prior_shape_error = estimate_cube.scale`) —
# the counter-pressure that keeps the scale-free hinge from inflating the
# box without bound
PRIOR_SHAPE_W = 0.2

HUBER_MEAS = 1.0  # 9-DoF measurement log error is in meters/radians


def _meas_residuals(state, K, meas_kf, meas_obj, meas_pose, meas_scale,
                    meas_si, meas_valid):
    """Camera-cuboid 9-DoF measurement edges (EdgeSE3Cuboid, object_slam
    g2o_Object.h:230-256): the detector's camera-frame cuboid, lifted into
    the world through the (optimized) camera pose, vs the landmark state.
    This is the family the demo graph optimizes (main_obj.cpp:531-544,
    info proportional to meas_quality) and the one observation that pins
    the cuboid's DEPTH extent at frontal views, where the projected-bbox
    edge is depth-blind and the owned points only cover visible faces."""
    kf_tcw, pts, obj_pose, obj_scale = state
    Twc = geo.inv_T(kf_tcw[meas_kf])
    lifted = cb.transform_from(cb.Cuboid(meas_pose, meas_scale), Twc)
    landmark = cb.Cuboid(obj_pose[meas_obj], obj_scale[meas_obj])
    err = cb.min_log_error(landmark, lifted)
    return err * meas_si[:, None] * meas_valid[:, None]


def _shape_prior_residual(obj_pose, obj_scale, obj_valid, obj_fix_scale):
    """Per-object 0.2 * scale residual (zero for invalid / fixed-scale
    objects — their scale is frozen out of the state anyway)."""
    on = (obj_valid & ~obj_fix_scale).astype(obj_scale.dtype)
    return PRIOR_SHAPE_W * obj_scale * on[:, None]


def _hinge_residual_binary(cub, p, si):
    """EdgePointCuboid error (g2o_Object.cpp:356-369): |boundary error|
    normalized by the cuboid scale plus a 0.2-weighted shape prior."""
    err = cb.point_boundary_error(cub, p[:, None, :])[:, 0, :]
    err = jnp.abs(err) / jnp.maximum(cub.scale, 1e-6)
    return (err + 0.2 * cub.scale) * si[:, None]


def residual_families(state, K, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
                      box_kf, box_obj, box_meas, box_si, box_valid,
                      po_obj, po_pt, po_si, po_valid, po_binary=False):
    """Raw (un-robustified) residuals of the three edge families."""
    kf_tcw, pts, obj_pose, obj_scale = state

    def one_reproj(T, p, uv, si):
        uv_p, _ = _project(T, K, p)
        return (uv_p - uv) * si

    r_r = jax.vmap(one_reproj)(kf_tcw[obs_kf], pts[obs_pt], obs_uv, obs_si)

    cub_b = cb.Cuboid(obj_pose[box_obj], obj_scale[box_obj])
    rect = cb.project_onto_image_bbox(cub_b, kf_tcw[box_kf], K)
    r_b = (rect - box_meas) * box_si[:, None]

    cub_p = cb.Cuboid(obj_pose[po_obj], obj_scale[po_obj])
    if po_binary:
        r_p = _hinge_residual_binary(cub_p, pts[po_pt], po_si)
    else:
        r_p = _hinge_residual_unary(cub_p, lax.stop_gradient(pts[po_pt]), po_si)
    return r_r, r_b, r_p


def total_robust_cost(state, K, obs_edges, box_edges, po_edges,
                      po_binary=False, obj_flags=None, prior_factor=1.0,
                      meas_edges=None):
    """Sum of robustified costs; additive over edges, so the sharded solver
    psums per-device partial sums of this same function.

    obj_flags = (obj_valid, obj_fix_scale) enables the reference's 0.2*scale
    shape prior (plain quadratic, one per object). prior_factor rescales its
    sqrt-weight so an N-way edge-sharded solve that adds the prior on every
    device psums back to EXACTLY one prior (pass 1/sqrt(N))."""
    (obs_kf, obs_pt, obs_uv, obs_si, obs_valid) = obs_edges
    (box_kf, box_obj, box_meas, box_si, box_valid) = box_edges
    (po_obj, po_pt, po_si, po_valid) = po_edges
    r_r, r_b, r_p = residual_families(
        state, K, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
        box_kf, box_obj, box_meas, box_si, box_valid,
        po_obj, po_pt, po_si, po_valid, po_binary=po_binary)
    cost = (
        _robust_cost(r_r, HUBER_MONO, obs_valid)
        + _robust_cost(r_b, HUBER_BBOX, box_valid)
        + _robust_cost(r_p, HUBER_PT_OBJ, po_valid)
    )
    if obj_flags is not None:
        _, _, obj_pose, obj_scale = state
        r_s = _shape_prior_residual(obj_pose, obj_scale, *obj_flags)
        cost = cost + jnp.sum((prior_factor * r_s) ** 2)
    if meas_edges is not None:
        r_m = _meas_residuals(state, K, *meas_edges)
        cost = cost + _robust_cost(r_m, HUBER_MEAS, meas_edges[-1])
    return cost


def assemble_normal_blocks(state, K, Kf, P, O,
                           obs_edges, box_edges, po_edges, po_binary=False,
                           obj_flags=None, prior_factor=1.0, meas_edges=None):
    """Per-edge Jacobians -> summed normal-equation blocks.

    Returns (H_C, b_C, Hpp, bp, W): the camera+object super-block system
    (D = Kf*6 + O*9), the point diagonal blocks, point gradient, and the
    GENERALIZED coupling W of shape (D, P, 3) — camera rows from the
    reprojection family, object rows from the binary point-cuboid family
    (zero when po_binary=False). All outputs are SUMS over the edges passed
    in, so they psum across devices when edges are sharded.
    """
    (obs_kf, obs_pt, obs_uv, obs_si, obs_valid) = obs_edges
    (box_kf, box_obj, box_meas, box_si, box_valid) = box_edges
    (po_obj, po_pt, po_si, po_valid) = po_edges
    kf_tcw, pts, obj_pose, obj_scale = state
    D = Kf * 6 + O * 9

    r_r_raw, r_b_raw, r_p_raw = residual_families(
        state, K, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
        box_kf, box_obj, box_meas, box_si, box_valid,
        po_obj, po_pt, po_si, po_valid, po_binary=po_binary)

    # --- reproj family: blocks wrt cam (2, 6) and point (2, 3)
    def reproj_local(dx, T, p, uv, si, w):
        T2 = geo.se3_exp(dx[:6]) @ T
        uv_p, _ = _project(T2, K, p + dx[6:])
        return (uv_p - uv) * si * w

    chi2_r = jnp.sum(r_r_raw * r_r_raw, axis=-1)
    w_r = lax.stop_gradient(huber_weight(chi2_r, HUBER_MONO)) * obs_valid
    J_r = jax.vmap(
        lambda T, p, uv, si, w: jax.jacfwd(
            lambda dx: reproj_local(dx, T, p, uv, si, w)
        )(jnp.zeros(9))
    )(kf_tcw[obs_kf], pts[obs_pt], obs_uv, obs_si, w_r)
    Jc_r = J_r[..., :6]
    Jp_r = J_r[..., 6:]
    rr_w = r_r_raw * w_r[:, None]

    # --- bbox family: blocks wrt cam (4, 6) and object (4, 9)
    def bbox_local(dx, T, opose, oscale, meas, si, w):
        T2 = geo.se3_exp(dx[:6]) @ T
        cub = cb.exp_update(cb.Cuboid(opose, oscale), dx[6:])
        rect = cb.project_onto_image_bbox(cub, T2, K)
        return (rect - meas) * si * w

    chi2_b = jnp.sum(r_b_raw * r_b_raw, axis=-1)
    w_b = lax.stop_gradient(huber_weight(chi2_b, HUBER_BBOX)) * box_valid
    rb_w = r_b_raw * w_b[:, None]
    J_b = jax.vmap(
        lambda T, op, os_, meas, si, w: jax.jacfwd(
            lambda dx: bbox_local(dx, T, op, os_, meas, si, w)
        )(jnp.zeros(15))
    )(kf_tcw[box_kf], obj_pose[box_obj], obj_scale[box_obj], box_meas, box_si, w_b)
    Jc_b = J_b[..., :6]
    Jo_b = J_b[..., 6:]

    # --- point-object family: blocks wrt object (3, 9) and, in the binary
    # flavor, wrt the point (3, 3)
    def po_local(dx, op, os_, p, si, w):
        cub = cb.exp_update(cb.Cuboid(op, os_), dx[:9])
        p2 = p + dx[9:] if po_binary else p
        err = cb.point_boundary_error(cub, p2[None, :])[0]
        if po_binary:
            err = jnp.abs(err) / jnp.maximum(cub.scale, 1e-6) + 0.2 * cub.scale
        return err * si * w

    chi2_p = jnp.sum(r_p_raw * r_p_raw, axis=-1)
    w_p = lax.stop_gradient(huber_weight(chi2_p, HUBER_PT_OBJ)) * po_valid
    rp_w = r_p_raw * w_p[:, None]
    po_pts = pts[po_pt] if po_binary else lax.stop_gradient(pts[po_pt])
    J_pfull = jax.vmap(
        lambda op, os_, p, si, w: jax.jacfwd(
            lambda dx: po_local(dx, op, os_, p, si, w)
        )(jnp.zeros(12))
    )(obj_pose[po_obj], obj_scale[po_obj], po_pts, po_si, w_p)
    J_p = J_pfull[..., :9]
    Jp_po = J_pfull[..., 9:]  # zero-effect unless po_binary (see below)

    # ---------------- assemble ----------------------------------------
    H_C = jnp.zeros((D, D))
    b_C = jnp.zeros((D,))

    Hcc = jax.ops.segment_sum(
        jnp.einsum("eai,eaj->eij", Jc_r, Jc_r), obs_kf, num_segments=Kf
    )
    Hpp = jax.ops.segment_sum(
        jnp.einsum("eai,eaj->eij", Jp_r, Jp_r), obs_pt, num_segments=P
    )
    bc = jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jc_r, rr_w), obs_kf, num_segments=Kf)
    bp = jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jp_r, rr_w), obs_pt, num_segments=P)
    W_cam = jax.ops.segment_sum(
        jnp.einsum("eai,eaj->eij", Jc_r, Jp_r), obs_kf * P + obs_pt,
        num_segments=Kf * P,
    ).reshape(Kf, P, 6, 3)
    W = jnp.zeros((D, P, 3))
    W = W.at[: Kf * 6].set(W_cam.transpose(0, 2, 1, 3).reshape(Kf * 6, P, 3))

    idx6 = jnp.arange(Kf)
    Hcc_dense = jnp.zeros((Kf * 6, Kf * 6))
    Hcc_dense = Hcc_dense.at[
        (idx6[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
        (idx6[:, None, None] * 6 + jnp.arange(6)[None, None, :]),
    ].add(Hcc)
    H_C = H_C.at[: Kf * 6, : Kf * 6].add(Hcc_dense)
    b_C = b_C.at[: Kf * 6].add(bc.reshape(-1))

    # bbox: cam & object blocks, incl. cross terms
    Hcc_e = jnp.einsum("eai,eaj->eij", Jc_b, Jc_b)
    Hoo_e = jnp.einsum("eai,eaj->eij", Jo_b, Jo_b)
    Hco_e = jnp.einsum("eai,eaj->eij", Jc_b, Jo_b)
    bc_e = jnp.einsum("eai,ea->ei", Jc_b, rb_w)
    bo_e = jnp.einsum("eai,ea->ei", Jo_b, rb_w)
    Hcc_s = jax.ops.segment_sum(Hcc_e, box_kf, num_segments=Kf)
    Hoo_s = jax.ops.segment_sum(Hoo_e, box_obj, num_segments=O)
    Hco_s = jax.ops.segment_sum(Hco_e, box_kf * O + box_obj, num_segments=Kf * O)
    bc_s = jax.ops.segment_sum(bc_e, box_kf, num_segments=Kf)
    bo_s = jax.ops.segment_sum(bo_e, box_obj, num_segments=O)

    cam_rows = jnp.zeros((Kf * 6, Kf * 6)).at[
        (jnp.arange(Kf)[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
        (jnp.arange(Kf)[:, None, None] * 6 + jnp.arange(6)[None, None, :]),
    ].add(Hcc_s)
    obj_rows = jnp.zeros((O * 9, O * 9)).at[
        (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, :, None]),
        (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, None, :]),
    ].add(Hoo_s)
    cross = Hco_s.reshape(Kf, O, 6, 9).transpose(0, 2, 1, 3).reshape(Kf * 6, O * 9)
    H_C = H_C.at[: Kf * 6, : Kf * 6].add(cam_rows)
    H_C = H_C.at[Kf * 6 :, Kf * 6 :].add(obj_rows)
    H_C = H_C.at[: Kf * 6, Kf * 6 :].add(cross)
    H_C = H_C.at[Kf * 6 :, : Kf * 6].add(cross.T)
    b_C = b_C.at[: Kf * 6].add(bc_s.reshape(-1))
    b_C = b_C.at[Kf * 6 :].add(bo_s.reshape(-1))

    # point-object: object blocks (+ point blocks/coupling when binary)
    Hoo_p = jax.ops.segment_sum(
        jnp.einsum("eai,eaj->eij", J_p, J_p), po_obj, num_segments=O
    )
    bo_p = jax.ops.segment_sum(jnp.einsum("eai,ea->ei", J_p, rp_w), po_obj, num_segments=O)
    obj_rows_p = jnp.zeros((O * 9, O * 9)).at[
        (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, :, None]),
        (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, None, :]),
    ].add(Hoo_p)
    H_C = H_C.at[Kf * 6 :, Kf * 6 :].add(obj_rows_p)
    b_C = b_C.at[Kf * 6 :].add(bo_p.reshape(-1))

    # 9-DoF camera-cuboid measurement family (EdgeSE3Cuboid): camera (9, 6)
    # and object (9, 9) blocks, assembled exactly like the bbox family
    if meas_edges is not None:
        (meas_kf, meas_obj, meas_pose, meas_scale, meas_si, meas_valid) = meas_edges

        def meas_local(dx, T, mp_, ms_, op, os_, si, w):
            T2 = geo.se3_exp(dx[:6]) @ T
            lifted = cb.transform_from(cb.Cuboid(mp_, ms_), geo.inv_T(T2))
            cub = cb.exp_update(cb.Cuboid(op, os_), dx[6:])
            return cb.min_log_error(cub, lifted) * si * w

        r_m_raw = _meas_residuals(state, K, *meas_edges)
        chi2_m = jnp.sum(r_m_raw * r_m_raw, axis=-1)
        w_m = lax.stop_gradient(huber_weight(chi2_m, HUBER_MEAS)) \
            * meas_valid.astype(r_m_raw.dtype)
        rm_w = r_m_raw * w_m[:, None]
        J_m = jax.vmap(
            lambda T, mp_, ms_, op, os_, si, w: jax.jacfwd(
                lambda dx: meas_local(dx, T, mp_, ms_, op, os_, si, w)
            )(jnp.zeros(15))
        )(kf_tcw[meas_kf], meas_pose, meas_scale,
          obj_pose[meas_obj], obj_scale[meas_obj], meas_si, w_m)
        Jc_m = J_m[..., :6]
        Jo_m = J_m[..., 6:]
        Hcc_m = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jc_m, Jc_m), meas_kf, num_segments=Kf)
        Hoo_m = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jo_m, Jo_m), meas_obj, num_segments=O)
        Hco_m = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jc_m, Jo_m),
            meas_kf * O + meas_obj, num_segments=Kf * O)
        bc_m = jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", Jc_m, rm_w), meas_kf, num_segments=Kf)
        bo_m = jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", Jo_m, rm_w), meas_obj, num_segments=O)
        cam_rows_m = jnp.zeros((Kf * 6, Kf * 6)).at[
            (jnp.arange(Kf)[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
            (jnp.arange(Kf)[:, None, None] * 6 + jnp.arange(6)[None, None, :]),
        ].add(Hcc_m)
        obj_rows_m = jnp.zeros((O * 9, O * 9)).at[
            (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, :, None]),
            (jnp.arange(O)[:, None, None] * 9 + jnp.arange(9)[None, None, :]),
        ].add(Hoo_m)
        cross_m = Hco_m.reshape(Kf, O, 6, 9).transpose(0, 2, 1, 3) \
            .reshape(Kf * 6, O * 9)
        H_C = H_C.at[: Kf * 6, : Kf * 6].add(cam_rows_m)
        H_C = H_C.at[Kf * 6 :, Kf * 6 :].add(obj_rows_m)
        H_C = H_C.at[: Kf * 6, Kf * 6 :].add(cross_m)
        H_C = H_C.at[Kf * 6 :, : Kf * 6].add(cross_m.T)
        b_C = b_C.at[: Kf * 6].add(bc_m.reshape(-1))
        b_C = b_C.at[Kf * 6 :].add(bo_m.reshape(-1))

    # shape prior 0.2*scale (g2o_Object.cpp:318-327): scale updates are
    # additive (exp_update), so J = f*0.2*I on the scale sub-block exactly
    if obj_flags is not None:
        r_s = prior_factor * _shape_prior_residual(obj_pose, obj_scale,
                                                   *obj_flags)  # (O, 3)
        w2 = (prior_factor * PRIOR_SHAPE_W) ** 2
        on = (obj_flags[0] & ~obj_flags[1]).astype(obj_scale.dtype)  # (O,)
        oidx = Kf * 6 + jnp.arange(O)[:, None] * 9 + jnp.arange(6, 9)[None, :]
        H_C = H_C.at[oidx.reshape(-1), oidx.reshape(-1)].add(
            jnp.repeat(w2 * on, 3))
        b_C = b_C.at[oidx.reshape(-1)].add(
            (prior_factor * PRIOR_SHAPE_W) * r_s.reshape(-1))

    if po_binary:
        Hpp = Hpp + jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jp_po, Jp_po), po_pt, num_segments=P
        )
        bp = bp + jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", Jp_po, rp_w), po_pt, num_segments=P
        )
        W_obj = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", J_p, Jp_po), po_obj * P + po_pt,
            num_segments=O * P,
        ).reshape(O, P, 9, 3)
        W = W.at[Kf * 6 :].add(W_obj.transpose(0, 2, 1, 3).reshape(O * 9, P, 3))

    return H_C, b_C, Hpp, bp, W


def schur_reduce_solve(H_C, b_C, Hpp, bp, W, lam, C_mask, pt_mask, Kf, D):
    """Schur-eliminate points, solve the reduced camera+object system, and
    back-substitute point updates. W is the generalized (D, P, 3) coupling
    (camera AND object rows). Deterministic given summed blocks — the
    sharded solver runs this replicated after psum."""
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + (lam + 1e-6) * eye3 + (1.0 - pt_mask)[:, None, None] * eye3
    Hpp_inv = jnp.linalg.inv(Hpp_d) * pt_mask[:, None, None]
    Y = jnp.einsum("dpi,pij->dpj", W, Hpp_inv)      # (D, P, 3)
    S = jnp.einsum("dpj,epj->de", Y, W)             # (D, D)
    H_red = H_C - S
    rhs = -b_C + jnp.einsum("dpj,pj->d", Y, bp)

    A = H_red + lam * jnp.eye(D)
    A = C_mask[:, None] * A * C_mask[None, :] + jnp.diag(1.0 - C_mask)
    Lc, low = jax.scipy.linalg.cho_factor(A, lower=True)
    dC = jax.scipy.linalg.cho_solve((Lc, low), rhs * C_mask) * C_mask

    WT_dc = jnp.einsum("dpi,d->pi", W, dC)
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, -bp - WT_dc) * pt_mask[:, None]
    return dC, dp


def retract_state(state, dC, dp, Kf, O):
    kf_tcw, pts, obj_pose, obj_scale = state
    dc = (dC[: Kf * 6]).reshape(Kf, 6)
    do = (dC[Kf * 6 :]).reshape(O, 9)
    new_tcw = geo.se3_exp(dc) @ kf_tcw
    cub = cb.exp_update(cb.Cuboid(obj_pose, obj_scale), do)
    return (new_tcw, pts + dp, cub.pose, cub.scale)


def camera_object_mask(kf_fixed, obj_valid, obj_fix_scale, O):
    cam_mask = jnp.repeat((~kf_fixed).astype(jnp.float32), 6)
    scale_keep = jnp.concatenate(
        [jnp.ones((O, 6)), jnp.where(obj_fix_scale[:, None], 0.0, 1.0).repeat(3, axis=1)],
        axis=1,
    )  # (O, 9)
    obj_mask = (obj_valid[:, None].astype(jnp.float32) * scale_keep).reshape(-1)
    return jnp.concatenate([cam_mask, obj_mask])


@functools.partial(jax.jit, static_argnames=("num_iters", "po_binary"))
def local_ba_objects(
    kf_tcw,          # (Kf, 4, 4)
    pts,             # (P, 3)
    obj_pose,        # (O, 4, 4) object->world
    obj_scale,       # (O, 3)
    K,               # (3, 3)
    # point reprojection edges
    obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
    # camera-object bbox edges
    box_kf, box_obj, box_meas, box_si, box_valid,
    # object-point hinge edges
    po_obj, po_pt, po_si, po_valid,
    # masks
    kf_fixed, pt_valid, obj_valid, obj_fix_scale,
    num_iters: int = 10,
    po_binary: bool = False,
    meas_kf=None, meas_obj=None, meas_pose=None, meas_scale=None,
    meas_si=None, meas_valid=None,
):
    """Returns (kf_tcw, pts, obj_pose, obj_scale, cost, reproj_inlier,
    box_inlier). The optional meas_* arrays add 9-DoF camera-cuboid
    measurement edges (EdgeSE3Cuboid)."""
    Kf = kf_tcw.shape[0]
    P = pts.shape[0]
    O = obj_pose.shape[0]
    D = Kf * 6 + O * 9

    C_mask = camera_object_mask(kf_fixed, obj_valid, obj_fix_scale, O)
    pt_mask = pt_valid.astype(jnp.float32)
    obs_edges = (obs_kf, obs_pt, obs_uv, obs_si, obs_valid)
    box_edges = (box_kf, box_obj, box_meas, box_si, box_valid)
    po_edges = (po_obj, po_pt, po_si, po_valid)
    meas_edges = (None if meas_kf is None else
                  (meas_kf, meas_obj, meas_pose, meas_scale, meas_si,
                   meas_valid))

    obj_flags = (obj_valid, obj_fix_scale)

    def total_cost(state):
        return total_robust_cost(state, K, obs_edges, box_edges, po_edges,
                                 po_binary=po_binary, obj_flags=obj_flags,
                                 meas_edges=meas_edges)

    def lm_step(state, lam):
        H_C, b_C, Hpp, bp, W = assemble_normal_blocks(
            state, K, Kf, P, O, obs_edges, box_edges, po_edges,
            po_binary=po_binary, obj_flags=obj_flags, meas_edges=meas_edges)
        dC, dp = schur_reduce_solve(H_C, b_C, Hpp, bp, W, lam, C_mask, pt_mask, Kf, D)
        return retract_state(state, dC, dp, Kf, O)

    def body(i, carry):
        state, lam, cost = carry
        new_state = lm_step(state, lam)
        new_cost = total_cost(new_state)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_state, state)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return state, lam, cost

    state0 = (kf_tcw, pts, obj_pose, obj_scale)
    cost0 = total_cost(state0)
    state, _, cost = lax.fori_loop(0, num_iters, body, (state0, 1e-4, cost0))

    raw_r, raw_b, _ = residual_families(state, K, *obs_edges, *box_edges, *po_edges,
                                        po_binary=po_binary)
    chi2_r = jnp.sum(raw_r * raw_r, axis=-1)
    chi2_b = jnp.sum(raw_b * raw_b, axis=-1)
    kf_tcw, pts, obj_pose, obj_scale = state
    return (
        kf_tcw, pts, obj_pose, obj_scale, cost,
        obs_valid & (chi2_r <= CHI2_MONO),
        box_valid & (chi2_b <= 900.0),
    )


@functools.partial(jax.jit, static_argnames=("po_binary",))
def local_ba_objects_two_stage(
    kf_tcw, pts, obj_pose, obj_scale, K,
    obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
    box_kf, box_obj, box_meas, box_si, box_valid,
    po_obj, po_pt, po_si, po_valid,
    kf_fixed, pt_valid, obj_valid, obj_fix_scale,
    po_binary: bool = False,
    meas_kf=None, meas_obj=None, meas_pose=None, meas_scale=None,
    meas_si=None, meas_valid=None,
):
    """The reference's optimize(5) -> prune outliers -> optimize(10)
    schedule (Optimizer.cc:1389-1444): reprojection edges with chi2 > 5.991
    and bbox edges with error norm > 80 px are dropped after the first
    stage, then the survivors are re-optimized.

    Returns the same tuple as local_ba_objects (inlier masks reflect the
    pruned sets)."""
    meas_kw = dict(meas_kf=meas_kf, meas_obj=meas_obj, meas_pose=meas_pose,
                   meas_scale=meas_scale, meas_si=meas_si,
                   meas_valid=meas_valid)
    out1 = local_ba_objects(
        kf_tcw, pts, obj_pose, obj_scale, K,
        obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
        box_kf, box_obj, box_meas, box_si, box_valid,
        po_obj, po_pt, po_si, po_valid,
        kf_fixed, pt_valid, obj_valid, obj_fix_scale,
        num_iters=5, po_binary=po_binary, **meas_kw,
    )
    kf1, pts1, op1, os1 = out1[:4]
    # chi2 gates on the STAGE-1 state (the reference checks e->chi2() after
    # optimize(5)); bbox gate is the raw pixel error norm > 80
    raw_r, raw_b, _ = residual_families(
        (kf1, pts1, op1, os1), K,
        obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
        box_kf, box_obj, box_meas, box_si, box_valid,
        po_obj, po_pt, po_si, po_valid, po_binary=po_binary)
    obs_keep = obs_valid & (jnp.sum(raw_r * raw_r, axis=-1) <= CHI2_MONO)
    box_err = jnp.linalg.norm(raw_b / jnp.maximum(box_si, 1e-9)[:, None], axis=-1)
    box_keep = box_valid & (box_err <= 80.0)
    return local_ba_objects(
        kf1, pts1, op1, os1, K,
        obs_kf, obs_pt, obs_uv, obs_si, obs_keep,
        box_kf, box_obj, box_meas, box_si, box_keep,
        po_obj, po_pt, po_si, po_valid,
        kf_fixed, pt_valid, obj_valid, obj_fix_scale,
        num_iters=10, po_binary=po_binary, **meas_kw,
    )
