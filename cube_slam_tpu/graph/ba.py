"""Bundle adjustment: pose-only LM and point BA with blocked Schur.

TPU-native re-design of Optimizer.cc:

* `pose_optimization` — per-frame pose-only LM with Huber kernel and the
  4-round chi-square outlier re-leveling (Optimizer::PoseOptimization,
  Optimizer.cc:253-472: 4 x 10 iterations, outliers at 5.991 excluded
  between rounds).
* `local_ba_points` — camera+point BA (Optimizer::LocalBundleAdjustment,
  :474-824) as a dense-BLOCKED Schur solver: per-observation 2x6/2x3
  Jacobian blocks from vmapped autodiff, segment-sum assembly of Hcc/Hpp/W,
  the reduced camera system S = Hcc - W Hpp^-1 W^T formed with one big
  matmul (MXU food), Cholesky on S, back-substitution for points.

Edges are padded arrays (obs_kf, obs_pt, uv, sqrt_info, valid); masked
edges contribute zeros everywhere. Huber weighting is IRLS-style: residuals
are rescaled by sqrt(rho'(chi2)) inside the residual evaluation, which
matches g2o's robustified quadratic model to first order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils import geometry as geo

CHI2_MONO = 5.991
HUBER_MONO = float(np.sqrt(5.991))


def _project(Tcw, K, pt):
    pc = Tcw[:3, :3] @ pt + Tcw[:3, 3]
    z = jnp.where(jnp.abs(pc[2]) < 1e-9, 1e-9, pc[2])
    uv = (K @ pc)[:2] / z
    return uv, pc[2]


def inv3_sym(A):
    """Closed-form inverse of a batch of symmetric positive-definite 3x3
    blocks (adjugate / determinant). Pure elementwise arithmetic that XLA
    fuses into the surrounding assembly — the batched LU custom call
    jnp.linalg.inv lowers to is the single most expensive op in the BA
    program (~40% of device time at local-BA shapes)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    co_a = d * f - e * e
    co_b = c * e - b * f
    co_c = b * e - c * d
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    co_d = a * f - c * c
    co_e = b * c - a * e
    co_f = a * d - b * b
    row0 = jnp.stack([co_a, co_b, co_c], axis=-1)
    row1 = jnp.stack([co_b, co_d, co_e], axis=-1)
    row2 = jnp.stack([co_c, co_e, co_f], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def huber_weight(chi2, delta=HUBER_MONO):
    """sqrt of the IRLS weight for the Huber kernel."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
    return jnp.where(e <= delta, 1.0, jnp.sqrt(delta / e))


# ---------------------------------------------------------------------------
# pose-only optimization
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_rounds", "iters_per_round"))
def pose_optimization(Tcw0, K, pts_world, uv_meas, sqrt_info, valid,
                      num_rounds: int = 4, iters_per_round: int = 10):
    """Optimize one camera pose against fixed map points.

    Tcw0 (4, 4); pts_world (N, 3); uv_meas (N, 2); sqrt_info (N,) = 1/sigma
    per observation (pyramid-level dependent); valid (N,).

    Returns (Tcw, inlier_mask, n_inliers). Mirrors PoseOptimization's
    round structure: optimize, re-classify outliers at chi2 > 5.991,
    repeat with outliers excluded (they may return in later rounds).
    """

    def edge_chi2(Tcw, active):
        uv, _ = jax.vmap(lambda p: _project(Tcw, K, p))(pts_world)
        r = (uv - uv_meas) * sqrt_info[:, None]
        chi2 = jnp.sum(r * r, axis=-1)
        return chi2

    def lm_round(Tcw, active):
        def residual(dx):
            T = geo.se3_exp(dx) @ Tcw
            uv, _ = jax.vmap(lambda p: _project(T, K, p))(pts_world)
            r = (uv - uv_meas) * sqrt_info[:, None]
            chi2 = jnp.sum(r * r, axis=-1)
            # IRLS: freeze the robust weight at the current iterate —
            # differentiating through it corrupts the GN direction
            w = lax.stop_gradient(huber_weight(chi2))[:, None]
            r = r * w * active[:, None]
            return r.reshape(-1)

        def chi2_of(T):
            uv, _ = jax.vmap(lambda p: _project(T, K, p))(pts_world)
            r = (uv - uv_meas) * sqrt_info[:, None]
            chi2 = jnp.sum(r * r, axis=-1)
            # robustified cost
            e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
            rho = jnp.where(
                e <= HUBER_MONO, chi2, 2 * HUBER_MONO * e - HUBER_MONO**2
            )
            return jnp.sum(rho * active)

        def body(i, state):
            T, lam, chi2 = state
            r0 = residual(jnp.zeros(6))
            J = jax.jacfwd(residual)(jnp.zeros(6))
            H = J.T @ J
            g = J.T @ r0
            A = H + lam * jnp.eye(6)
            L, low = jax.scipy.linalg.cho_factor(A, lower=True)
            dx = jax.scipy.linalg.cho_solve((L, low), -g)
            T_new = geo.se3_exp(dx) @ T
            c_new = chi2_of(T_new)
            accept = (c_new < chi2) & jnp.isfinite(c_new)
            T = jax.tree.map(lambda a, b: jnp.where(accept, a, b), T_new, T)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return T, lam, jnp.where(accept, c_new, chi2)

        chi0 = chi2_of(Tcw)
        T, _, _ = lax.fori_loop(0, iters_per_round, body, (Tcw, 1e-3, chi0))
        return T

    active = valid.astype(jnp.float32)
    Tcw = Tcw0
    for _ in range(num_rounds):
        Tcw = lm_round(Tcw, active)
        chi2 = edge_chi2(Tcw, active)
        active = (valid & (chi2 <= CHI2_MONO)).astype(jnp.float32)
    inlier = active > 0
    return Tcw, inlier, jnp.sum(inlier)


# ---------------------------------------------------------------------------
# camera + point BA with blocked Schur complement
# ---------------------------------------------------------------------------

def make_schur_pairs(obs_pt, obs_valid, bucket=True):
    """Host-side edge-pair list for the SPARSE reduced-camera assembly:
    all ordered pairs (e1, e2) of valid edges observing the SAME point.
    S[k1,k2] = sum over pairs of W_e1 Hpp^-1 W_e2^T — the pair list makes
    that a single batched (Q, 6, 6) matmul + scatter instead of the dense
    (Kf, P, 6, 3) W grid and its O(Kf^2 P) contraction.

    Returns (pair_e1, pair_e2) int32, zero-padded to a pow2 bucket (with
    both pointing at edge 0 — masked out on device via obs_valid)."""
    idx = np.where(np.asarray(obs_valid))[0].astype(np.int32)
    pts = np.asarray(obs_pt)[idx]
    order = np.argsort(pts, kind="stable")
    idx = idx[order]
    pts = pts[order]
    e1_list, e2_list = [], []
    start = 0
    n = len(idx)
    for i in range(1, n + 1):
        if i == n or pts[i] != pts[start]:
            seg = idx[start:i]
            if len(seg) >= 1:
                a, b = np.meshgrid(seg, seg, indexing="ij")
                e1_list.append(a.reshape(-1))
                e2_list.append(b.reshape(-1))
            start = i
    if e1_list:
        e1 = np.concatenate(e1_list)
        e2 = np.concatenate(e2_list)
    else:
        e1 = np.zeros(1, dtype=np.int32)
        e2 = np.zeros(1, dtype=np.int32)
    if bucket:
        Q = 1 << int(np.ceil(np.log2(max(len(e1), 64))))
        pad = Q - len(e1)
        if pad:
            e1 = np.concatenate([e1, np.zeros(pad, dtype=np.int32)])
            e2 = np.concatenate([e2, np.full(pad, -1, dtype=np.int32)])
    return e1.astype(np.int32), e2.astype(np.int32)


@functools.partial(
    jax.jit, static_argnames=("num_iters", "n_kf", "n_pt", "schur_window")
)
def local_ba_points(
    kf_tcw,        # (Kf, 4, 4)
    pts,           # (P, 3)
    K,             # (3, 3)
    obs_kf,        # (E,) int32
    obs_pt,        # (E,) int32
    obs_uv,        # (E, 2)
    obs_sqrt_info, # (E,)
    obs_valid,     # (E,) bool
    kf_fixed,      # (Kf,) bool — fixed camera vertices
    pt_valid,      # (P,) bool
    obs_z=None,    # (E,) optional metric depth measurements (0 = none)
    obs_z_si=None, # (E,) sqrt-info of the depth residual (0 disables)
    pair_e1=None,  # (Q,) int32 edge-pair lists (make_schur_pairs) — when
    pair_e2=None,  # given, the reduced system assembles SPARSELY (no
                   # dense (Kf, P) W grid; pairs with e2 < 0 are padding)
    num_iters: int = 5,
    n_kf: int = 0,
    n_pt: int = 0,
    schur_window: int = 0,
):
    """Joint camera-point BA: monocular reprojection edges, plus an
    optional per-edge DEPTH residual row (z_pred - z_meas) * z_si — the
    RGBD/stereo information channel (EdgeStereoSE3ProjectXYZ analog,
    types_six_dof_expmap.h).

    Returns (kf_tcw, pts, chi2_final, edge_inlier). One LM iteration:
    per-edge Jacobians (vmapped jacfwd over the 9 local dofs), blocked
    assembly, Schur-reduced camera solve, point back-substitution.
    """
    Kf = kf_tcw.shape[0]
    P = pts.shape[0]
    E = obs_kf.shape[0]
    if obs_z is None:
        obs_z = jnp.zeros((E,), dtype=jnp.float32)
    if obs_z_si is None:
        obs_z_si = jnp.zeros((E,), dtype=jnp.float32)

    kf_free = (~kf_fixed) & jnp.ones((Kf,), dtype=bool)
    cam_mask = kf_free.astype(jnp.float32)  # (Kf,)
    pt_mask = pt_valid.astype(jnp.float32)

    # DEVICE-side sparse-pair schedule (schur_window > 0): sort edges by
    # point id once (loop-invariant) and pair each edge with the next
    # schur_window-1 edges of the same point. Exact when no point has more
    # than schur_window observations (in a BA problem each point is
    # observed at most once per keyframe, so schur_window = Kf is exact).
    # Replaces the host pair list of make_schur_pairs: no O(obs^2) host
    # loop, no pair upload, and ONE compiled shape per (E, Kf, P) combo
    # instead of one per pair-count bucket.
    if schur_window > 0 and pair_e1 is None:
        _sort_key = jnp.where(obs_valid, obs_pt, P)
        sched_order = jnp.argsort(_sort_key)
        sched_pt = _sort_key[sched_order]
    else:
        sched_order = sched_pt = None

    def edge_residual(Tcw, pt, uv, si, z, z_si):
        uv_p, z_p = _project(Tcw, K, pt)
        r_uv = (uv_p - uv) * si
        r_z = (z_p - z) * z_si
        return jnp.concatenate([r_uv, r_z[None]])

    def all_residuals(kf_tcw, pts):
        T_e = kf_tcw[obs_kf]
        p_e = pts[obs_pt]
        r = jax.vmap(edge_residual)(T_e, p_e, obs_uv, obs_sqrt_info, obs_z, obs_z_si)  # (E, 3)
        chi2 = jnp.sum(r * r, axis=-1)
        w = huber_weight(chi2)
        r = r * (w * obs_valid)[:, None]
        return r, chi2

    def robust_cost(kf_tcw, pts):
        _, chi2 = all_residuals(kf_tcw, pts)
        e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
        rho = jnp.where(e <= HUBER_MONO, chi2, 2 * HUBER_MONO * e - HUBER_MONO**2)
        return jnp.sum(rho * obs_valid)

    def edge_jacobians(kf_tcw, pts):
        """Per-edge (r (3,), Jc (3,6), Jp (3,3)) at the zero local tangent,
        in CLOSED FORM (the same pinhole+SE3 jacobian the reference's g2o
        types hand-derive, types_six_dof_expmap.h): autodiff through
        se3_exp costs 9 forward evaluations with per-edge transcendentals
        every LM iteration, ~half the BA program's device time."""
        T_e = kf_tcw[obs_kf]
        p_e = pts[obs_pt]
        r, chi2 = all_residuals(kf_tcw, pts)
        # IRLS weight frozen at current iterate (see pose_optimization)
        w = lax.stop_gradient(huber_weight(chi2)) * obs_valid

        R = T_e[:, :3, :3]
        pc = jnp.einsum("eij,ej->ei", R, p_e) + T_e[:, :3, 3]  # (E, 3)
        x, y = pc[:, 0], pc[:, 1]
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        zi = 1.0 / z
        zi2 = zi * zi
        fx, fy = K[0, 0], K[1, 1]
        O = jnp.zeros_like(zi)
        I1 = jnp.ones_like(zi)
        # d(weighted residual rows [u*si, v*si, z*z_si]) / d pc
        J_pc = jnp.stack([
            jnp.stack([fx * zi, O, -fx * x * zi2], -1) * obs_sqrt_info[:, None],
            jnp.stack([O, fy * zi, -fy * y * zi2], -1) * obs_sqrt_info[:, None],
            jnp.stack([O, O, I1], -1) * obs_z_si[:, None],
        ], axis=-2) * w[:, None, None]                          # (E, 3, 3)
        # left-multiplied tangent dx = (omega, rho): d pc / d dx = [-[pc]x | I]
        neg_px = jnp.stack([
            jnp.stack([O, pc[:, 2], -y], -1),
            jnp.stack([-pc[:, 2], O, x], -1),
            jnp.stack([y, -x, O], -1),
        ], axis=-2)                                             # (E, 3, 3)
        Jc = jnp.concatenate([J_pc @ neg_px, J_pc], axis=-1)    # (E, 3, 6)
        Jp = J_pc @ R                                           # (E, 3, 3)
        return r, Jc, Jp

    def lm_step(kf_tcw, pts, lam):
        r, Jc, Jp = edge_jacobians(kf_tcw, pts)

        # block accumulations
        Hcc = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jc, Jc), obs_kf, num_segments=Kf
        )  # (Kf, 6, 6)
        Hpp = jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", Jp, Jp), obs_pt, num_segments=P
        )  # (P, 3, 3)
        bc = jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", Jc, r), obs_kf, num_segments=Kf
        )  # (Kf, 6)
        bp = jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", Jp, r), obs_pt, num_segments=P
        )  # (P, 3)
        W_blocks = jnp.einsum("eai,eaj->eij", Jc, Jp)  # (E, 6, 3)

        # damping + masks
        eye3 = jnp.eye(3)
        Hpp_d = Hpp + (lam + 1e-6) * eye3 + (1.0 - pt_mask)[:, None, None] * eye3
        Hpp_inv = inv3_sym(Hpp_d) * pt_mask[:, None, None]

        if sched_order is not None:
            # scan over window offsets d = 0..W-1: at offset d, edge
            # sched_order[i] pairs with sched_order[i+d] when both observe
            # the same point. Off-diagonal contributions (d > 0) scatter
            # into BOTH (k1, k2) and (k2, k1); memory stays O(E * 36) per
            # step instead of O(Q * 36) for a materialized pair list.
            Hinv_e = Hpp_inv[obs_pt[sched_order]]           # (E, 3, 3)
            WH = W_blocks[sched_order] @ Hinv_e             # (E, 6, 3)
            k1 = obs_kf[sched_order]
            idxs = jnp.arange(E)

            def scan_d(S_acc, d):
                j = jnp.clip(idxs + d, 0, E - 1)
                same = (sched_pt == sched_pt[j]) & (sched_pt < P) \
                    & (idxs + d < E)
                e2 = sched_order[j]
                contrib = (WH @ jnp.swapaxes(W_blocks[e2], -1, -2)
                           ) * same[:, None, None]           # (E, 6, 6)
                k2 = obs_kf[e2]
                S_acc = S_acc + jax.ops.segment_sum(
                    contrib, k1 * Kf + k2, num_segments=Kf * Kf)
                swapped = jnp.swapaxes(contrib, -1, -2) * (d > 0)
                S_acc = S_acc + jax.ops.segment_sum(
                    swapped, k2 * Kf + k1, num_segments=Kf * Kf)
                return S_acc, None

            S_flat = jnp.zeros((Kf * Kf, 6, 6))
            S_flat, _ = lax.scan(scan_d, S_flat,
                                 jnp.arange(schur_window))
            S_off = S_flat.reshape(Kf, Kf, 6, 6)
            ypt = jnp.einsum("pij,pj->pi", Hpp_inv, bp)     # (P, 3)
            z_e = jnp.einsum("eij,ej->ei", W_blocks, ypt[obs_pt])
            Wy = jax.ops.segment_sum(z_e, obs_kf, num_segments=Kf)
            rhs = -(bc - Wy)
        elif pair_e1 is not None:
            # SPARSE reduced-camera assembly over edge pairs sharing a
            # point: S_off[k1,k2] = sum_pairs W_e1 Hpp^-1 W_e2^T. Memory is
            # O(pairs * 36) instead of the O(Kf * P * 18) dense W grid
            # (~85 MB at global-BA scale), and the contraction is one
            # batched (Q, 6, 3)@(3, 3)@(3, 6) matmul instead of O(Kf^2 P).
            pv = pair_e2 >= 0
            p2 = jnp.clip(pair_e2, 0, None)
            Hinv_pair = Hpp_inv[obs_pt[pair_e1]]            # (Q, 3, 3)
            contrib = (W_blocks[pair_e1] @ Hinv_pair
                       @ jnp.swapaxes(W_blocks[p2], -1, -2))  # (Q, 6, 6)
            contrib = contrib * pv[:, None, None]
            seg = obs_kf[pair_e1] * Kf + obs_kf[p2]
            S_off = jax.ops.segment_sum(
                contrib, seg, num_segments=Kf * Kf).reshape(Kf, Kf, 6, 6)
            # rhs: per-edge y = W_e (Hpp^-1 bp)_pt, reduced over cameras
            ypt = jnp.einsum("pij,pj->pi", Hpp_inv, bp)     # (P, 3)
            z_e = jnp.einsum("eij,ej->ei", W_blocks, ypt[obs_pt])
            Wy = jax.ops.segment_sum(z_e, obs_kf, num_segments=Kf)
            rhs = -(bc - Wy)
        else:
            # dense (Kf, P) block grid of W, contracted as ONE explicit
            # (Kf*6, P*3) @ (P*3, Kf*6) matmul — the MXU-shaped form of the
            # reduced-camera assembly. The W grid is Kf*P*18 floats (~85 MB
            # at global-BA scale, trivial against 16 GB HBM) and the
            # contraction is 2*(Kf*6)^2*(P*3) FLOPs of real matmul work,
            # which beats any gather/scan-based sparse schedule on TPU.
            W = jax.ops.segment_sum(
                W_blocks, obs_kf * P + obs_pt, num_segments=Kf * P
            ).reshape(Kf, P, 6, 3)
            Y = jnp.einsum("kpij,pjl->kpil", W, Hpp_inv)  # (Kf, P, 6, 3)
            Ym = Y.transpose(0, 2, 1, 3).reshape(Kf * 6, P * 3)
            Wm = W.transpose(0, 2, 1, 3).reshape(Kf * 6, P * 3)
            S_off = (Ym @ Wm.T).reshape(Kf, 6, Kf, 6).transpose(0, 2, 1, 3)
            rhs = -(bc - (Ym @ bp.reshape(-1)).reshape(Kf, 6))

        S = -S_off
        S = S.at[jnp.arange(Kf), jnp.arange(Kf)].add(Hcc + lam * jnp.eye(6))

        # flatten, freeze fixed cameras
        cm = jnp.repeat(cam_mask, 6)
        S_f = (S.transpose(0, 2, 1, 3).reshape(Kf * 6, Kf * 6) * cm[:, None] * cm[None, :]
               + jnp.diag(1.0 - cm))
        rhs_f = rhs.reshape(-1) * cm
        L, low = jax.scipy.linalg.cho_factor(S_f, lower=True)
        dc = jax.scipy.linalg.cho_solve((L, low), rhs_f) * cm  # (Kf*6,)
        dc_b = dc.reshape(Kf, 6)

        # back-substitute points: dp = Hpp^-1 (-bp - W^T dc)
        wtd_e = jnp.einsum("eij,ei->ej", W_blocks, dc_b[obs_kf])
        WT_dc = jax.ops.segment_sum(wtd_e, obs_pt, num_segments=P)  # (P, 3)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, -bp - WT_dc) * pt_mask[:, None]

        new_tcw = geo.se3_exp(dc_b) @ kf_tcw
        new_pts = pts + dp
        return new_tcw, new_pts

    def body(i, state):
        kf_tcw, pts, lam, cost = state
        new_tcw, new_pts = lm_step(kf_tcw, pts, lam)
        new_cost = robust_cost(new_tcw, new_pts)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        kf_tcw = jnp.where(accept, new_tcw, kf_tcw)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return kf_tcw, pts, lam, cost

    cost0 = robust_cost(kf_tcw, pts)
    kf_tcw, pts, _, cost = lax.fori_loop(
        0, num_iters, body, (kf_tcw, pts, 1e-4, cost0)
    )
    _, chi2 = all_residuals(kf_tcw, pts)
    chi2_th = jnp.where(obs_z_si > 0, 7.815, CHI2_MONO)  # 3-dof vs 2-dof
    edge_inlier = obs_valid & (chi2 <= chi2_th)
    return kf_tcw, pts, cost, edge_inlier
