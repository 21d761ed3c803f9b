"""Sim3 solvers: Horn closed-form similarity + batched RANSAC.

Re-design of Sim3Solver (orb_object_slam/src/Sim3Solver.cc:224 ComputeSim3,
:138 iterate): the loop-closing scale-aware alignment between two matched
3D point sets. The reference iterates RANSAC sequentially; here every
hypothesis (3-point minimal sample -> Horn) is solved and scored in one
batched program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def horn_sim3(p1, p2, weights=None, fix_scale=False):
    """Closed-form similarity aligning p1 -> p2 (Horn 1987, as in
    Sim3Solver::ComputeSim3). p1, p2: (..., N, 3).

    Returns (s, R (..., 3, 3), t): p2 ~ s R p1 + t."""
    if weights is None:
        weights = jnp.ones(p1.shape[:-1], dtype=p1.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2, keepdims=True)
    c1 = jnp.sum(p1 * w, axis=-2, keepdims=True) / wsum
    c2 = jnp.sum(p2 * w, axis=-2, keepdims=True) / wsum
    q1 = (p1 - c1) * jnp.sqrt(w)
    q2 = (p2 - c2) * jnp.sqrt(w)
    H = jnp.swapaxes(q1, -1, -2) @ q2  # (..., 3, 3) cross-covariance
    U, D, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    S = jnp.broadcast_to(jnp.eye(3), H.shape).copy()
    S = S.at[..., 2, 2].set(jnp.sign(det))
    R = jnp.swapaxes(Vt, -1, -2) @ S @ jnp.swapaxes(U, -1, -2)
    if fix_scale:
        s = jnp.ones(H.shape[:-2], dtype=p1.dtype)
    else:
        num = jnp.sum(D * jnp.concatenate(
            [jnp.ones_like(D[..., :2]), jnp.sign(det)[..., None]], axis=-1), axis=-1)
        den = jnp.sum(q1 * q1, axis=(-1, -2))
        s = num / jnp.where(den > 1e-12, den, 1e-12)
    t = c2[..., 0, :] - s[..., None] * (R @ c1[..., 0, :, None])[..., 0]
    return s, R, t


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def sim3_ransac(p1, p2, valid, sample_idx, inlier_thresh, fix_scale=False):
    """Batched Sim3 RANSAC between matched 3D point sets.

    p1, p2: (N, 3); sample_idx: (S, 3). Returns (s, R, t, inlier (N,),
    n_inlier) refined by Horn on the best hypothesis's inliers."""
    s1 = p1[sample_idx]  # (S, 3, 3)
    s2 = p2[sample_idx]
    s, R, t = horn_sim3(s1, s2, fix_scale=fix_scale)  # batched over S
    pred = s[:, None, None] * (p1 @ jnp.swapaxes(R, -1, -2)) + t[:, None, :]
    err = jnp.linalg.norm(pred - p2[None], axis=-1)  # (S, N)
    inl = (err < inlier_thresh) & valid[None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    s_f, R_f, t_f = horn_sim3(p1, p2, weights=w, fix_scale=fix_scale)
    pred_f = s_f * (p1 @ R_f.T) + t_f
    inlier = (jnp.linalg.norm(pred_f - p2, axis=-1) < inlier_thresh) & valid
    return s_f, R_f, t_f, inlier, jnp.sum(inlier)


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def sim3_ransac_px(p1, p2, uv1, uv2, Tcw1, Tcw2, K, valid, sample_idx,
                   max_err2_px=9.21 * 2.0, fix_scale=False):
    """Sim3 RANSAC scored by BOTH-WAY PIXEL reprojection, the reference's
    acceptance rule (Sim3Solver::CheckInliers, Sim3Solver.cc:~296-330:
    an inlier must reproject within chi2 in BOTH images).

    A 3D-distance consensus needs an absolute metres threshold — scene-
    dependent, and on drifted maps it blends structure carrying
    intermediate warps into the consensus, biasing the similarity's SCALE
    (measured: s=1.21 on a pure-SE3 drift). The pixel gate is scale-free
    and anchored to the actual observations.

    p1, p2: (N, 3) matched WORLD points of the two keyframes; uv1, uv2
    their pixel observations; Tcw1/Tcw2 the keyframes' world->camera poses.
    The returned Sim3 maps p1's world onto p2's world.
    Returns (s, R, t, inlier (N,), n_inlier)."""
    s1 = p1[sample_idx]
    s2 = p2[sample_idx]
    s, R, t = horn_sim3(s1, s2, fix_scale=fix_scale)  # (S,), (S,3,3), (S,3)

    def project(Tcw, pw):
        pc = pw @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-9, 1e-9, pc[..., 2:3])
        return (pc @ K.T)[..., :2] / z, pc[..., 2]

    def score(si, Ri, ti):
        # p1 -> p2's world -> image 2
        p12 = si * (p1 @ Ri.T) + ti
        uvh2, z2 = project(Tcw2, p12)
        e2 = jnp.sum((uvh2 - uv2) ** 2, axis=-1)
        # p2 -> p1's world -> image 1
        sinv, Rinv, tinv = sim3_inverse(si, Ri, ti)
        p21 = sinv * (p2 @ Rinv.T) + tinv
        uvh1, z1 = project(Tcw1, p21)
        e1 = jnp.sum((uvh1 - uv1) ** 2, axis=-1)
        return ((e1 < max_err2_px) & (e2 < max_err2_px)
                & (z1 > 0) & (z2 > 0) & valid)

    inl = jax.vmap(score)(s, R, t)           # (S, N)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    s_f, R_f, t_f = horn_sim3(p1, p2, weights=w, fix_scale=fix_scale)
    inlier = score(s_f, R_f, t_f)
    return s_f, R_f, t_f, inlier, jnp.sum(inlier)


@functools.partial(jax.jit, static_argnames=("fix_scale", "refine_iters"))
def sim3_ransac_trimmed(p1, p2, valid, sample_idx, fix_scale=False,
                        refine_iters=4, rel_floor=0.01, rel_ceil=0.05):
    """Least-trimmed-squares Sim3 RANSAC on matched 3D MAP positions.

    Why not pixel-scored (Sim3Solver::CheckInliers)? The reference's
    keyframe poses stay consistent with their old observations because its
    local BA keeps re-touching them; ours drop out of the bounded BA
    window, so a months-old keyframe's stored pose is a few px stale
    against the FINAL map — a pixel objective then prefers a wrong scale
    that splits the staleness (measured: s=1.21 on a pure-SE3 drift).
    The map positions themselves ARE the state the loop correction will
    transform, so aligning them directly is both unbiased and sufficient.

    Per-hypothesis Horn (3-pt minimal samples), scored by the SUM OF THE
    SMALLEST half of residuals (LTS — no metres threshold to tune), then
    iteratively re-fit on the current best-half (converges onto the
    self-consistent duplicate population). Inliers are reported against
    max(2.5 * h-th error, rel_floor * scene) capped at rel_ceil * scene so
    a garbage fit on a false loop cannot claim half the matches.

    Returns (s, R, t, inlier (N,), n_inlier)."""
    N = p1.shape[0]
    h = max(4, N // 2)
    BIG = jnp.float32(1e9)

    def errs(s, R, t):
        pred = s * (p1 @ R.T) + t
        e = jnp.linalg.norm(pred - p2, axis=-1)
        return jnp.where(valid, e, BIG)

    s1 = p1[sample_idx]
    s2 = p2[sample_idx]
    s, R, t = horn_sim3(s1, s2, fix_scale=fix_scale)  # batched over S
    pred = s[:, None, None] * (p1 @ jnp.swapaxes(R, -1, -2)) + t[:, None, :]
    err = jnp.linalg.norm(pred - p2[None], axis=-1)
    err = jnp.where(valid[None], err, BIG)
    trimmed_cost = jnp.sum(jnp.sort(err, axis=1)[:, :h], axis=1)
    best = jnp.argmin(trimmed_cost)

    def body(_, S):
        e = errs(*S)
        tau = jnp.sort(e)[h - 1]
        w = ((e <= tau) & valid).astype(jnp.float32)
        return horn_sim3(p1, p2, weights=w, fix_scale=fix_scale)

    S_f = jax.lax.fori_loop(
        0, refine_iters, body, (s[best], R[best], t[best]))
    s_f, R_f, t_f = S_f
    e = errs(s_f, R_f, t_f)
    scene = jnp.median(jnp.where(
        valid, jnp.linalg.norm(p2 - jnp.mean(p2, axis=0), axis=-1), 0.0))
    kth = jnp.sort(e)[h - 1]
    tau = jnp.clip(2.5 * kth, rel_floor * scene, rel_ceil * scene)
    inlier = (e < tau) & valid
    # final fit on the reported inliers
    s_f, R_f, t_f = horn_sim3(
        p1, p2, weights=inlier.astype(jnp.float32), fix_scale=fix_scale)
    e = errs(s_f, R_f, t_f)
    inlier = (e < tau) & valid
    return s_f, R_f, t_f, inlier, jnp.sum(inlier)


# ---------------------------------------------------------------------------
# Sim3 pose-graph pieces (OptimizeEssentialGraph, Optimizer.cc:2575)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_iters", "fix_scale"))
def optimize_sim3_relative(
    s0, R0, t0,          # initial Sim3: cam1-frame points -> cam2 frame
    pts1_cam, pts2_cam,  # (N, 3) matched map points in each camera frame
    uv1, uv2,            # (N, 2) their pixel observations in each image
    K, valid,
    num_iters: int = 10,
    fix_scale: bool = False,
    huber_px: float = 3.0,
):
    """Optimizer::OptimizeSim3 (Optimizer.cc:2838-3035): refine a relative
    Sim3 between two keyframes by reprojecting each one's matched map points
    into the OTHER image (both directions), robust kernel, inliers gated at
    chi2 9.21 (2 dof, 99%). Returns (s, R, t, inlier, n_inlier)."""
    from ..graph.lm import lm_optimize
    from ..utils import geometry as geo_mod

    def project(pc):
        z = jnp.where(jnp.abs(pc[:, 2:3]) < 1e-9, 1e-9, pc[:, 2:3])
        return (pc @ K.T)[:, :2] / z

    def residual(params):
        s, R, t = params
        # direction 1: cam1 points through Sim3 into image 2
        p12 = sim3_apply(s, R, t, pts1_cam)
        r1 = project(p12) - uv2
        # direction 2: cam2 points through the inverse into image 1
        si, Ri, ti = sim3_inverse(s, R, t)
        p21 = sim3_apply(si, Ri, ti, pts2_cam)
        r2 = project(p21) - uv1
        r = jnp.concatenate([r1, r2], axis=0)
        chi2 = jnp.sum(r * r, axis=-1)
        e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
        w = jnp.where(e <= huber_px, 1.0, jnp.sqrt(huber_px / e))
        v2 = jnp.concatenate([valid, valid])
        return (r * (jax.lax.stop_gradient(w) * v2)[:, None]).reshape(-1)

    def retract(params, dx):
        s, R, t = params
        ds = jnp.exp(dx[0]) if not fix_scale else 1.0
        return sim3_compose(ds * jnp.ones(()), geo_mod.so3_exp(dx[1:4]), dx[4:7], s, R, t)

    mask = jnp.ones((7,), dtype=bool)
    if fix_scale:
        mask = mask.at[0].set(False)
    res = lm_optimize(residual, retract, (s0, R0, t0), dim=7,
                      num_iters=num_iters, param_mask=mask)
    s, R, t = res.params
    p12 = sim3_apply(s, R, t, pts1_cam)
    e1 = jnp.sum((project(p12) - uv2) ** 2, axis=-1)
    si, Ri, ti = sim3_inverse(s, R, t)
    p21 = sim3_apply(si, Ri, ti, pts2_cam)
    e2 = jnp.sum((project(p21) - uv1) ** 2, axis=-1)
    inlier = valid & (e1 < 9.21) & (e2 < 9.21)
    return s, R, t, inlier, jnp.sum(inlier)


def sim3_apply(s, R, t, pts):
    """pts (..., N, 3); s (...,); R (..., 3, 3); t (..., 3)."""
    return s[..., None, None] * (pts @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def sim3_inverse(s, R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    return 1.0 / s, Rinv, -(Rinv @ t[..., None])[..., 0] / s[..., None]


def sim3_compose(s1, R1, t1, s2, R2, t2):
    """(s1,R1,t1) o (s2,R2,t2): apply 2 then 1. All broadcast-batched."""
    s1 = jnp.asarray(s1)
    return s1 * s2, R1 @ R2, s1[..., None] * (R1 @ t2[..., None])[..., 0] + t1
