"""Monocular two-view initialization — batched RANSAC.

Re-design of Initializer.cc (orb_object_slam/src/Initializer.cc:45
Initialize, :131 FindHomography, :181 FindFundamental, :474 ReconstructF,
:579 ReconstructH, :739 Triangulate): the reference scores 200 RANSAC
hypotheses sequentially in two threads (H and F); here ALL hypotheses for
BOTH models are solved and scored in one batched program — 200 8-point
SVDs are a (200, 9, 9) batch, symmetric-transfer scoring is a (200, N)
array, and model selection/reconstruction follows the same chi-square
gating and cheirality counting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import geometry as geo

SIGMA = 1.0
TH_H = 5.991   # chi-square 2dof (Initializer.cc CheckHomography)
TH_F = 3.841   # chi-square 1dof (CheckFundamental)
TH_SCORE = 5.991


def _normalize_pts(pts, valid):
    """Hartley normalization (Initializer.cc Normalize :~700): mean-center,
    mean-abs-deviation scale. pts (N, 2)."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / n
    d = jnp.where(valid[:, None], pts - mean, 0.0)
    mdev = jnp.sum(jnp.abs(d), axis=0) / n
    s = 1.0 / jnp.where(mdev > 1e-9, mdev, 1.0)
    pn = d * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return pn, T


def _solve_h_batch(p1, p2):
    """DLT homographies from 8-point samples: p1, p2 (S, 8, 2) -> (S, 3, 3)."""
    S = p1.shape[0]
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (S, 16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[:, -1].reshape(S, 3, 3)


def _solve_f_batch(p1, p2):
    """8-point fundamental matrices with rank-2 projection: (S, 3, 3)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )  # (S, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[:, -1].reshape(-1, 3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[:, 2].set(0.0)
    return u @ (s[..., None] * vt2)


def _score_h(H, H_inv, p1, p2, valid, sigma=SIGMA):
    """Symmetric transfer error score (CheckHomography, Initializer.cc:~230).
    H: (S, 3, 3); p1, p2: (N, 2). Returns (score (S,), inliers (S, N))."""
    ph1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)  # (N, 3)
    ph2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=1)

    def transfer(M, src_h, dst):
        q = src_h @ jnp.swapaxes(M, -1, -2)  # (S, N, 3)
        w = q[..., 2:3]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        uv = q[..., :2] / w
        return jnp.sum((uv - dst[None]) ** 2, axis=-1)  # (S, N)

    e12 = transfer(H, ph1[None], p2) / (sigma * sigma)
    e21 = transfer(H_inv, ph2[None], p1) / (sigma * sigma)
    ok = (e12 < TH_H) & (e21 < TH_H) & valid[None]
    sc = jnp.where(e12 < TH_H, TH_SCORE - e12, 0.0) + jnp.where(e21 < TH_H, TH_SCORE - e21, 0.0)
    return jnp.sum(jnp.where(valid[None], sc, 0.0), axis=1), ok


def _score_f(F, p1, p2, valid, sigma=SIGMA):
    """Epipolar distance score (CheckFundamental, Initializer.cc:~330)."""
    ph1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=1)
    ph2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=1)
    l2 = ph1[None] @ jnp.swapaxes(F, -1, -2)  # (S, N, 3) lines in img2
    num2 = jnp.sum(l2 * ph2[None], axis=-1) ** 2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    e2 = num2 / jnp.where(den2 > 1e-12, den2, 1e-12) / (sigma * sigma)
    l1 = ph2[None] @ F  # lines in img1
    num1 = jnp.sum(l1 * ph1[None], axis=-1) ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    e1 = num1 / jnp.where(den1 > 1e-12, den1, 1e-12) / (sigma * sigma)
    ok = (e1 < TH_F) & (e2 < TH_F) & valid[None]
    sc = jnp.where(e1 < TH_F, TH_SCORE - e1, 0.0) + jnp.where(e2 < TH_F, TH_SCORE - e2, 0.0)
    return jnp.sum(jnp.where(valid[None], sc, 0.0), axis=1), ok


def triangulate(P1, P2, p1, p2):
    """Linear DLT triangulation (Initializer.cc:739-770).
    P1, P2: (3, 4) projection matrices; p1, p2: (N, 2). -> (N, 3).

    The reference takes the SVD null vector of the 4x4 DLT system; batched
    tiny SVDs are slow on TPU (iterative algorithm, no MXU use), so we
    solve the equivalent inhomogeneous system A[:, :3] X = -A[:, 3] (the
    w=1 gauge) by closed-form 3x3 normal equations — pure elementwise math.
    Identical for finite points; points near infinity (w ~ 0) are rejected
    downstream by the depth/parallax acceptance gates either way."""
    rows = jnp.stack(
        [
            p1[:, 0, None] * P1[2] - P1[0],
            p1[:, 1, None] * P1[2] - P1[1],
            p2[:, 0, None] * P2[2] - P2[0],
            p2[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N, 4, 4)
    rows = rows / (jnp.linalg.norm(rows, axis=2, keepdims=True) + 1e-12)
    M = rows[:, :, :3]
    b = -rows[:, :, 3]
    S = jnp.einsum("nij,nik->njk", M, M)
    y = jnp.einsum("nij,ni->nj", M, b)
    a, bb, c = S[:, 0, 0], S[:, 0, 1], S[:, 0, 2]
    d, e = S[:, 1, 1], S[:, 1, 2]
    f = S[:, 2, 2]
    A00 = d * f - e * e
    A01 = c * e - bb * f
    A02 = bb * e - c * d
    A11 = a * f - c * c
    A12 = bb * c - a * e
    A22 = a * d - bb * bb
    det = a * A00 + bb * A01 + c * A02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    X = jnp.stack(
        [
            A00 * y[:, 0] + A01 * y[:, 1] + A02 * y[:, 2],
            A01 * y[:, 0] + A11 * y[:, 1] + A12 * y[:, 2],
            A02 * y[:, 0] + A12 * y[:, 1] + A22 * y[:, 2],
        ],
        axis=1,
    ) / det[:, None]
    return X


def _cheirality(R, t, K, p1, p2, inlier, max_parallax_needed=1.0, sigma=SIGMA):
    """Count points in front of both cameras with finite depth & low reproj
    error (CheckRT, Initializer.cc:~790). Also returns the 50th-largest
    triangulation parallax (degrees) — the reference's acceptance metric."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    Rt = jnp.concatenate([R, t[:, None]], axis=1)
    P2 = K @ Rt
    X = triangulate(P1, P2, p1, p2)  # (N, 3) in cam1
    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]
    # reprojection errors
    uv1 = (X @ K.T)
    uv1 = uv1[:, :2] / jnp.where(jnp.abs(uv1[:, 2:3]) < 1e-12, 1e-12, uv1[:, 2:3])
    uv2 = (X2 @ K.T)
    uv2 = uv2[:, :2] / jnp.where(jnp.abs(uv2[:, 2:3]) < 1e-12, 1e-12, uv2[:, 2:3])
    e1 = jnp.sum((uv1 - p1) ** 2, axis=1)
    e2 = jnp.sum((uv2 - p2) ** 2, axis=1)
    s2 = sigma * sigma
    good = (
        inlier & (z1 > 0) & (z2 > 0) & (e1 < 4.0 * TH_H * s2) & (e2 < 4.0 * TH_H * s2)
        & jnp.isfinite(X).all(axis=1)
    )
    # per-point parallax (CheckRT's vCosParallax): angle between the two
    # viewing rays; the acceptance uses the 50th-LARGEST parallax so a few
    # lucky wide-angle points can't carry a low-parallax pair
    O2 = -(R.T @ t)  # camera-2 center in cam1 frame
    v2 = X - O2
    n1 = jnp.linalg.norm(X, axis=1)
    n2 = jnp.linalg.norm(v2, axis=1)
    cospar = jnp.sum(X * v2, axis=1) / jnp.maximum(n1 * n2, 1e-12)
    cos_sorted = jnp.sort(jnp.where(good, cospar, 1.0))  # ascending cos
    idx = jnp.clip(jnp.minimum(50, jnp.sum(good) - 1), 0, X.shape[0] - 1)
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    return jnp.sum(good), good, X, parallax_deg


def decompose_e(E):
    """E -> (R1, R2, t) (DecomposeE, Initializer.cc:913-940)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.linalg.norm(t)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t


@functools.partial(jax.jit, static_argnames=("n_ransac",))
def initialize_two_view(p1, p2, valid, K, sample_idx, n_ransac=200, sigma=1.0):
    """Full two-view init: H & F RANSAC, model selection, reconstruction.

    p1, p2: (N, 2) matched keypoints (frame1 -> frame2); valid: (N,) bool;
    sample_idx: (n_ransac, 8) int precomputed sample indices (host RNG, like
    the reference's DUtils::Random seeding).

    Returns dict: success, Tcw2 (4, 4) world->cam2 with cam1 = identity,
    points3d (N, 3), point_good (N,), used_H (bool).
    """
    p1n_all, T1 = _normalize_pts(p1, valid)
    p2n_all, T2 = _normalize_pts(p2, valid)

    s1 = p1n_all[sample_idx]  # (S, 8, 2)
    s2 = p2n_all[sample_idx]

    Hn = _solve_h_batch(s1, s2)
    H = jnp.linalg.inv(T2) @ Hn @ T1            # denormalize (x2 = H x1)
    Fn = _solve_f_batch(s1, s2)
    F = T2.T @ Fn @ T1

    score_h, inl_h = _score_h(H, jnp.linalg.inv(H), p1, p2, valid, sigma=sigma)
    score_f, inl_f = _score_f(F, p1, p2, valid, sigma=sigma)

    best_h = jnp.argmax(score_h)
    best_f = jnp.argmax(score_f)
    SH = score_h[best_h]
    SF = score_f[best_f]
    RH = SH / jnp.where(SH + SF > 0, SH + SF, 1.0)
    use_H = RH > 0.40  # Initializer.cc:120

    # --- reconstruct from F (E-decomposition, 4 hypotheses)
    Fbest = F[best_f]
    E = K.T @ Fbest @ K
    R1, R2, t = decompose_e(E)
    hyps_f = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    # --- reconstruct from H: full Faugeras 8-motion decomposition
    # (ReconstructH, Initializer.cc:579-737)
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H[best_h] @ K
    U, dvec, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s_det = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = dvec[0], dvec[1], dvec[2]

    eps_h = 1e-9
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + eps_h), 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + eps_h), 0.0, None))
    aux_stheta = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / ((d1 + d3) * d2 + eps_h)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2 + eps_h)
    aux_sphi = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)
    ) / (jnp.abs(d1 - d3) * d2 + eps_h)
    cphi = (d1 * d3 - d2 * d2) / (jnp.abs(d1 - d3) * d2 + eps_h)

    hyps_h = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # case d' = +d2
            stheta = e1 * e3 * aux_stheta
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            )
            Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-stheta)
            Rp = Rp.at[2, 0].set(stheta).at[2, 2].set(ctheta)
            tp = (d1 - d3) * jnp.array([e1 * aux1, 0.0, -e3 * aux3])
            Rh = s_det * U @ Rp @ Vt
            th = U @ tp
            th = th / jnp.where(jnp.linalg.norm(th) > 1e-9, jnp.linalg.norm(th), 1.0)
            hyps_h.append((Rh, th))
            # case d' = -d2
            sphi = e1 * e3 * aux_sphi
            Rp2 = jnp.zeros((3, 3))
            Rp2 = Rp2.at[0, 0].set(cphi).at[0, 2].set(sphi)
            Rp2 = Rp2.at[1, 1].set(-1.0)
            Rp2 = Rp2.at[2, 0].set(sphi).at[2, 2].set(-cphi)
            tp2 = (d1 + d3) * jnp.array([e1 * aux1, 0.0, e3 * aux3])
            Rh2 = s_det * U @ Rp2 @ Vt
            th2 = U @ tp2
            th2 = th2 / jnp.where(jnp.linalg.norm(th2) > 1e-9, jnp.linalg.norm(th2), 1.0)
            hyps_h.append((Rh2, th2))

    def eval_hyp(R, t, inl):
        # score cheirality on ALL matches, not only the model's inliers:
        # on a plane-dominated view the H inliers are the plane itself, and
        # BOTH branches of the two-fold homography ambiguity explain them —
        # only the OFF-PLANE minority (box, floor, side walls) can vote the
        # wrong branch down through the reprojection gate (measured: inlier-
        # only scoring picked t directions up to 83 deg off on the room
        # scene; all-match scoring resolves every pair to <4 deg)
        n, good, X, par = _cheirality(R, t, K, p1, p2, inl | valid,
                                      sigma=sigma)
        return n, good, X, par

    results = [eval_hyp(R, t, inl_f[best_f]) for R, t in hyps_f]
    counts_f = jnp.stack([r[0] for r in results])
    best_hyp_f = jnp.argmax(counts_f)
    goods_f = jnp.stack([r[1] for r in results])
    Xs_f = jnp.stack([r[2] for r in results])
    pars_f = jnp.stack([r[3] for r in results])
    Rs_f = jnp.stack([h[0] for h in hyps_f])
    ts_f = jnp.stack([h[1] for h in hyps_f])

    results_h = [eval_hyp(R, t, inl_h[best_h]) for R, t in hyps_h]
    counts_h = jnp.stack([r[0] for r in results_h])
    best_hyp_h = jnp.argmax(counts_h)
    goods_h = jnp.stack([r[1] for r in results_h])
    Xs_h = jnp.stack([r[2] for r in results_h])
    pars_h = jnp.stack([r[3] for r in results_h])
    Rs_h = jnp.stack([h[0] for h in hyps_h])
    ts_h = jnp.stack([h[1] for h in hyps_h])

    R_sel = jnp.where(use_H, Rs_h[best_hyp_h], Rs_f[best_hyp_f])
    t_sel = jnp.where(use_H, ts_h[best_hyp_h], ts_f[best_hyp_f])
    good_sel = jnp.where(use_H, goods_h[best_hyp_h], goods_f[best_hyp_f])
    X_sel = jnp.where(use_H, Xs_h[best_hyp_h], Xs_f[best_hyp_f])
    par_sel = jnp.where(use_H, pars_h[best_hyp_h], pars_f[best_hyp_f])
    n_good = jnp.sum(good_sel)

    # winner must clearly dominate (ReconstructF: nGood > 0.9*maxGood etc.)
    # AND carry real parallax (the reference's minParallax = 1 deg,
    # Initializer.cc:474/579 call sites; we demand 2.5 deg): a
    # low-parallax pair triangulates a WARPED map — the translation
    # direction is weakly constrained, so whole regions reconstruct at
    # the wrong relative scale (measured: a 1.15-deg init produced a map
    # whose camera translations ran at 0.7x of truth uniformly, a bias no
    # later BA can repair because it enters through the init pose, and it
    # compounds ~2 deg/frame of rotation drift on fixating orbits).
    # Waiting a few frames for baseline is the cure — the reference's
    # tracker retries initialization until a pair passes.
    n_inlier = jnp.where(use_H, jnp.sum(inl_h[best_h]), jnp.sum(inl_f[best_f]))
    # hypothesis-dominance gates (the part of ReconstructH/F the earlier
    # simplification dropped — and the measured cause of a 3.5-deg-wrong
    # init on a wall-dominated view): the planar homography has a TWO-FOLD
    # motion ambiguity whose wrong branch also passes cheirality on most
    # points, so H accepts only when the best hypothesis clearly beats the
    # runner-up (secondBestGood < 0.75*bestGood, Initializer.cc:717-737);
    # F accepts only when exactly ONE of the four (R,t) hypotheses explains
    # the scene (nsimilar == 1, Initializer.cc:552-576).
    second_h = jnp.sort(counts_h)[-2]
    dominant_h = second_h.astype(jnp.float32) < 0.75 * counts_h[best_hyp_h].astype(jnp.float32)
    nsim_f = jnp.sum(counts_f.astype(jnp.float32)
                     > 0.7 * counts_f[best_hyp_f].astype(jnp.float32))
    dominant = jnp.where(use_H, dominant_h, nsim_f == 1)
    success = ((n_good >= 30)
               & (n_good.astype(jnp.float32) > 0.5 * n_inlier.astype(jnp.float32))
               & (par_sel >= 2.5)
               & dominant)

    Tcw2 = geo.make_T(R_sel, t_sel)
    return {
        "success": success,
        "Tcw2": Tcw2,
        "points3d": X_sel,
        "point_good": good_sel,
        "used_H": use_H,
        "n_good": n_good,
    }


def make_sample_indices(n_matches_valid_mask, n_ransac=200, n_sample=8, seed=0):
    """Host-side RANSAC sample indices over valid matches (mirrors the
    reference's SetRandomSeed + per-iteration 8-point draws)."""
    rng = np.random.default_rng(seed)
    valid_idx = np.where(np.asarray(n_matches_valid_mask))[0]
    if len(valid_idx) < n_sample:
        return np.zeros((n_ransac, n_sample), dtype=np.int32)
    out = np.stack(
        [rng.choice(valid_idx, size=n_sample, replace=False) for _ in range(n_ransac)]
    )
    return out.astype(np.int32)
