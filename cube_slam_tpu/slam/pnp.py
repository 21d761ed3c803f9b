"""PnP relocalization — batched EPnP-RANSAC + robust refinement.

Re-design of PnPsolver (orb_object_slam/src/PnPsolver.cc:338-1068: EPnP
control points + beta Gauss-Newton, RANSAC driver :164): the relocalization
pose solver from 3D-2D matches. Every RANSAC hypothesis is a 4-point EPnP
solve — control-point barycentric lift, 12x12 null-space eigendecomposition,
the three beta approximations each polished by Gauss-Newton on the
inter-control-point distance system, Horn alignment — evaluated as ONE
batched XLA program over all hypotheses, scored in parallel, and the winner
re-solved on its full inlier set then polished by the robust pose LM
(graph/ba.pose_optimization). A 6-point DLT variant is kept as
`pnp_ransac_dlt` (it needs 1.5x larger minimal samples — EPnP's 4-point
sample is the reference's RANSAC minimal set, PnPsolver.cc:68-133 — and
fails on near-planar 6-tuples the EPnP null-space handles)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import ba
from ..utils import geometry as geo


def _dlt_batch(Xw, uv):
    """Batched DLT: Xw (S, 6, 3), uv (S, 6, 2) NORMALIZED camera coords
    (K already removed) -> (S, 3, 4) projection [R|t] up to scale."""
    S = Xw.shape[0]
    X = jnp.concatenate([Xw, jnp.ones((S, 6, 1))], axis=-1)  # (S, 6, 4)
    zeros = jnp.zeros_like(X)
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    r1 = jnp.concatenate([X, zeros, -u * X], axis=-1)  # (S, 6, 12)
    r2 = jnp.concatenate([zeros, X, -v * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (S, 12, 12)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[:, -1].reshape(S, 3, 4)
    # fix scale/sign: ||P[:, :3]'s rows|| ~ 1, det(R) > 0, points in front
    M = P[:, :, :3]
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)))
    P = P / jnp.where(scale > 1e-12, scale, 1e-12)[:, None, None]
    sign = jnp.sign(jnp.linalg.det(P[:, :, :3]))
    P = P * sign[:, None, None]
    # orthonormalize rotation (polar via SVD)
    U, _, Vt = jnp.linalg.svd(P[:, :, :3])
    R = U @ Vt
    t = P[:, :, 3]
    return R, t


@functools.partial(jax.jit, static_argnames=())
def pnp_ransac(pts_world, uv, valid, K, sample_idx, inlier_thresh_px=5.0):
    """pts_world (N, 3), uv (N, 2) pixels, sample_idx (S, 6).

    Returns (Tcw (4, 4), inlier (N,), n_inlier)."""
    Kinv = jnp.linalg.inv(K)
    uv_h = jnp.concatenate([uv, jnp.ones((uv.shape[0], 1))], axis=1)
    xn = (uv_h @ Kinv.T)[:, :2]  # normalized coords

    Xs = pts_world[sample_idx]          # (S, 6, 3)
    us = xn[sample_idx]                 # (S, 6, 2)
    R, t = _dlt_batch(Xs, us)

    pc = pts_world @ jnp.swapaxes(R, -1, -2) + t[:, None, :]  # (S, N, 3)
    z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-9, 1e-9, pc[..., 2:3])
    proj = (pc @ K.T)[..., :2] / z
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    inl = (err < inlier_thresh_px) & (pc[..., 2] > 0) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    Tcw0 = geo.make_T(R[best], t[best])
    sqrt_info = jnp.ones(uv.shape[0], dtype=jnp.float32)
    Tcw, inlier, n_in = ba.pose_optimization(
        Tcw0, K, pts_world, uv, sqrt_info, inl[best]
    )
    return Tcw, inlier, n_in


def make_pnp_samples(valid_mask, n_ransac=128, seed=0, k=4):
    rng = np.random.default_rng(seed)
    idx = np.where(np.asarray(valid_mask))[0]
    if len(idx) < k:
        return np.zeros((n_ransac, k), dtype=np.int32)
    return np.stack(
        [rng.choice(idx, size=k, replace=False) for _ in range(n_ransac)]
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# EPnP (PnPsolver.cc:338-1068, Lepetit et al.) — fully batched
# ---------------------------------------------------------------------------

# the 6 unordered control-point pairs and the 10 beta-product monomials
_PAIR_I = jnp.array([0, 0, 0, 1, 1, 2], dtype=jnp.int32)
_PAIR_J = jnp.array([1, 2, 3, 2, 3, 3], dtype=jnp.int32)
_PROD_K = jnp.array([0, 0, 1, 0, 1, 2, 0, 1, 2, 3], dtype=jnp.int32)
_PROD_L = jnp.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3], dtype=jnp.int32)


def _horn_rt(A, B, w):
    """Weighted rigid alignment B ~ R @ A + t (compute_R_and_t,
    PnPsolver.cc:836-886)."""
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.sum(A * w[:, None], axis=0) / sw
    cb = jnp.sum(B * w[:, None], axis=0) / sw
    H = ((A - ca) * w[:, None]).T @ (B - cb)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    R = Vt.T @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * d) @ U.T
    t = cb - R @ ca
    return R, t


def _beta_products(betas):
    return betas[_PROD_K] * betas[_PROD_L]


def _gauss_newton_betas(L, rho, betas, iters=5):
    """Refine betas on the distance system (gauss_newton,
    PnPsolver.cc:929-1023): r = rho - L @ products(betas)."""
    def step(b, _):
        prods = _beta_products(b)
        r = rho - L @ prods
        # J[:, m] = d(L @ prods)/d b_m
        dp = jnp.zeros((10, 4))
        dp = dp.at[jnp.arange(10), _PROD_K].add(betas_sel(b, _PROD_L))
        dp = dp.at[jnp.arange(10), _PROD_L].add(betas_sel(b, _PROD_K))
        J = L @ dp  # (6, 4)
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        db = jnp.linalg.solve(JtJ, J.T @ r)
        return b + db, None

    def betas_sel(b, idx):
        return b[idx]

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _epnp_case_betas(L, rho):
    """The reference's three closed-form beta seeds (find_betas_approx_1/2/3,
    PnPsolver.cc:680-772), each mapping a least-squares sub-solve of
    L @ products = rho back to beta space with sign fixes."""
    def lsq(cols):
        A = L[:, cols]
        AtA = A.T @ A + 1e-9 * jnp.eye(len(cols))
        return jnp.linalg.solve(AtA, A.T @ rho)

    # approx_1: [b11 b12 b13 b14]
    b = lsq([0, 1, 3, 6])
    b1 = jnp.sqrt(jnp.abs(b[0]))
    s = jnp.where(b[0] < 0, -1.0, 1.0)
    beta_a = jnp.stack([b1, s * b[1] / jnp.maximum(b1, 1e-9),
                        s * b[2] / jnp.maximum(b1, 1e-9),
                        s * b[3] / jnp.maximum(b1, 1e-9)])
    # approx_2: [b11 b12 b22]
    b = lsq([0, 1, 2])
    b1 = jnp.sqrt(jnp.abs(b[0]))
    b2 = jnp.sqrt(jnp.abs(b[2])) * jnp.where(b[1] < 0, -1.0, 1.0)
    beta_b = jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])
    beta_b = jnp.where(b[0] < 0, -beta_b, beta_b)
    # approx_3: [b11 b12 b22 b13 b23]
    b = lsq([0, 1, 2, 3, 4])
    b1 = jnp.sqrt(jnp.abs(b[0]))
    b2 = jnp.sqrt(jnp.abs(b[2])) * jnp.where(b[1] < 0, -1.0, 1.0)
    b3 = b[3] / jnp.maximum(b1, 1e-9)
    beta_c = jnp.stack([b1, b2, b3, jnp.zeros(())])
    beta_c = jnp.where(b[0] < 0, -beta_c, beta_c)
    return jnp.stack([beta_a, beta_b, beta_c])  # (3, 4)


def _epnp_rt(Xw, xn, w):
    """One EPnP solve: Xw (n, 3) world points, xn (n, 2) normalized image
    coords, w (n,) weights (0 rows are padding). Returns (R, t, ok)."""
    n = Xw.shape[0]
    sw = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(Xw * w[:, None], axis=0) / sw
    Ac = Xw - c0
    cov = (Ac * w[:, None]).T @ Ac / sw
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    # floor the spread so planar/collinear sets still give a full basis
    # (choose_control_points, PnPsolver.cc:352-380)
    sdev = jnp.sqrt(jnp.maximum(evals, 1e-8))
    cw = jnp.stack([
        c0,
        c0 + sdev[2] * evecs[:, 2],
        c0 + sdev[1] * evecs[:, 1],
        c0 + sdev[0] * evecs[:, 0],
    ])  # (4, 3)
    # barycentric coordinates (compute_barycentric_coordinates, :382-404)
    C = (cw[1:] - c0).T  # (3, 3)
    a123 = Ac @ jnp.linalg.inv(C).T  # (n, 3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, axis=1, keepdims=True),
                              a123], axis=1)  # (n, 4)

    # M matrix rows (fill_M, :406-427), normalized intrinsics (fu=fv=1,
    # uc=vc=0 because xn is pre-multiplied by K^-1)
    ones = jnp.ones(n)
    zer = jnp.zeros(n)
    gx = jnp.stack([ones, zer, -xn[:, 0]], axis=1)  # (n, 3)
    gy = jnp.stack([zer, ones, -xn[:, 1]], axis=1)
    sqw = jnp.sqrt(w)[:, None, None]
    Mx = (alphas[:, :, None] * gx[:, None, :] * sqw).reshape(n, 12)
    My = (alphas[:, :, None] * gy[:, None, :] * sqw).reshape(n, 12)
    MtM = Mx.T @ Mx + My.T @ My
    _, V = jnp.linalg.eigh(MtM)
    vs = V[:, :4].T.reshape(4, 4, 3)  # 4 null-space candidates (4 ctrl pts)

    # distance system L @ beta_products = rho (compute_L_6x10 / rho,
    # :890-927)
    dv = vs[:, _PAIR_I, :] - vs[:, _PAIR_J, :]      # (4, 6, 3)
    rho = jnp.sum((cw[_PAIR_I] - cw[_PAIR_J]) ** 2, axis=1)  # (6,)
    L = jnp.einsum("kpx,lpx->pkl", dv, dv)[:, _PROD_K, _PROD_L]  # (6, 10)
    sym = (_PROD_K != _PROD_L).astype(L.dtype)
    L = L * (1.0 + sym)[None, :]

    betas0 = _epnp_case_betas(L, rho)  # (3, 4)
    betas = jax.vmap(lambda b: _gauss_newton_betas(L, rho, b))(betas0)

    def case_rt(beta):
        cc = jnp.einsum("k,kpx->px", beta, vs)  # (4, 3) camera ctrl pts
        pc = alphas @ cc  # (n, 3)
        # depth sign fix (compute_ccs/solve_for_sign, :774-812)
        flip = jnp.sum(w * jnp.sign(pc[:, 2])) < 0
        pc = jnp.where(flip, -pc, pc)
        R, t = _horn_rt(Xw, pc, w)
        pc2 = Xw @ R.T + t
        z = jnp.where(jnp.abs(pc2[:, 2:3]) < 1e-9, 1e-9, pc2[:, 2:3])
        err = jnp.sum((pc2[:, :2] / z - xn) ** 2, axis=1)
        reproj = jnp.sum(err * w) / sw
        return R, t, reproj

    Rs, ts, errs = jax.vmap(case_rt)(betas)
    best = jnp.argmin(errs)
    return Rs[best], ts[best], jnp.isfinite(errs[best])


@functools.partial(jax.jit, static_argnames=())
def pnp_ransac(pts_world, uv, valid, K, sample_idx, inlier_thresh_px=5.0):
    """EPnP-RANSAC (PnPsolver::iterate, :164-252): pts_world (N, 3),
    uv (N, 2) pixels, sample_idx (S, k>=4) int.

    Every hypothesis is a full EPnP solve on its k-point sample; the best
    by inlier count is re-solved by EPnP on ALL its inliers (the
    reference's refine(), :254-293) and then polished by the robust pose
    LM. Returns (Tcw (4, 4), inlier (N,), n_inlier)."""
    Kinv = jnp.linalg.inv(K)
    uv_h = jnp.concatenate([uv, jnp.ones((uv.shape[0], 1))], axis=1)
    xn = (uv_h @ Kinv.T)[:, :2]

    Xs = pts_world[sample_idx]              # (S, k, 3)
    us = xn[sample_idx]                     # (S, k, 2)
    ws = jnp.ones(sample_idx.shape, dtype=pts_world.dtype)
    R, t, ok = jax.vmap(_epnp_rt)(Xs, us, ws)

    pc = pts_world @ jnp.swapaxes(R, -1, -2) + t[:, None, :]  # (S, N, 3)
    z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-9, 1e-9, pc[..., 2:3])
    proj = (pc @ K.T)[..., :2] / z
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    inl = (err < inlier_thresh_px) & (pc[..., 2] > 0) & valid[None]
    counts = jnp.sum(inl, axis=1) * ok.astype(jnp.int32)
    best = jnp.argmax(counts)

    # refine on the full inlier set (weights = mask; fixed shape)
    w_all = inl[best].astype(pts_world.dtype)
    R2, t2, ok2 = _epnp_rt(pts_world, xn, w_all)
    use2 = ok2 & (jnp.sum(w_all) >= 4)
    Tcw0 = geo.make_T(jnp.where(use2, R2, R[best]),
                      jnp.where(use2, t2, t[best]))
    sqrt_info = jnp.ones(uv.shape[0], dtype=jnp.float32)
    Tcw, inlier, n_in = ba.pose_optimization(
        Tcw0, K, pts_world, uv, sqrt_info, inl[best]
    )
    return Tcw, inlier, n_in


@functools.partial(jax.jit, static_argnames=())
def pnp_ransac_dlt(pts_world, uv, valid, K, sample_idx, inlier_thresh_px=5.0):
    """The previous 6-point DLT-RANSAC, kept for comparison/fallback."""
    Kinv = jnp.linalg.inv(K)
    uv_h = jnp.concatenate([uv, jnp.ones((uv.shape[0], 1))], axis=1)
    xn = (uv_h @ Kinv.T)[:, :2]

    Xs = pts_world[sample_idx]
    us = xn[sample_idx]
    R, t = _dlt_batch(Xs, us)

    pc = pts_world @ jnp.swapaxes(R, -1, -2) + t[:, None, :]
    z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-9, 1e-9, pc[..., 2:3])
    proj = (pc @ K.T)[..., :2] / z
    err = jnp.linalg.norm(proj - uv[None], axis=-1)
    inl = (err < inlier_thresh_px) & (pc[..., 2] > 0) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    Tcw0 = geo.make_T(R[best], t[best])
    sqrt_info = jnp.ones(uv.shape[0], dtype=jnp.float32)
    Tcw, inlier, n_in = ba.pose_optimization(
        Tcw0, K, pts_world, uv, sqrt_info, inl[best]
    )
    return Tcw, inlier, n_in
