"""PnP relocalization — batched DLT-RANSAC + robust refinement.

Re-design of PnPsolver (orb_object_slam/src/PnPsolver.cc: EPnP + RANSAC,
:164 iterate): the relocalization pose solver from 3D-2D matches. Here
every RANSAC hypothesis is a 6-point DLT projection-matrix fit solved in
one batched SVD, decomposed to (R, t), scored in parallel, and the winner
is polished by the robust pose LM (graph/ba.pose_optimization).
"""

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


def make_pnp_samples(valid_mask, n_ransac=128, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.where(np.asarray(valid_mask))[0]
    if len(idx) < 6:
        return np.zeros((n_ransac, 6), dtype=np.int32)
    return np.stack(
        [rng.choice(idx, size=6, replace=False) for _ in range(n_ransac)]
    ).astype(np.int32)
