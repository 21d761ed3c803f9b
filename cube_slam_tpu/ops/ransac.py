"""Batched RANSAC primitives.

Replaces the reference's PCL SACSegmentation plane fit used for monocular
ground-scale recovery (Tracking.cc:2537-2550) and provides the generic
pattern (all hypotheses scored in parallel) shared with the initializer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("prefer_farthest",))
def fit_plane_ransac(points, valid, sample_idx, inlier_thresh,
                     expected_normal=None, min_normal_cos=0.0,
                     prefer_farthest=False):
    """Plane RANSAC: points (N, 3), valid (N,), sample_idx (S, 3) int.

    Returns (plane (4,) [n, d] with |n|=1 and n·p + d = 0, inlier_mask (N,),
    n_inliers). Hypotheses from 3-point samples, scored by point-plane
    distance, best refined by least squares on its inliers (PCA plane).

    expected_normal/min_normal_cos: optional hypothesis gate — candidate
    planes whose normal deviates from the expectation are rejected BEFORE
    scoring (the ground-plane fit must not lock onto walls even when wall
    points dominate the candidate set; PCL SACSegmentation offers the same
    via setAxis/setEpsAngle).

    prefer_farthest: among hypotheses within 50% of the best inlier count
    (after the normal gate), pick the plane FARTHEST from the origin
    (|d| max). For a camera-frame ground fit the floor is the farthest
    normal-aligned plane below the camera — object TOP faces share the
    floor's normal and can out-vote it when a tabletop/box dominates the
    lower image, and a plane through them under-reports camera height.
    """
    p0 = points[sample_idx[:, 0]]  # (S, 3)
    p1 = points[sample_idx[:, 1]]
    p2 = points[sample_idx[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n, axis=1, keepdims=True)
    n = n / jnp.where(norm > 1e-12, norm, 1.0)
    d = -jnp.sum(n * p0, axis=1)  # (S,)

    dist = jnp.abs(points @ n.T + d[None, :])  # (N, S)
    inl = (dist < inlier_thresh) & valid[:, None]
    counts = jnp.sum(inl, axis=0)
    if expected_normal is not None:
        exp_n = jnp.asarray(expected_normal, dtype=n.dtype)
        exp_n = exp_n / jnp.maximum(jnp.linalg.norm(exp_n), 1e-12)
        gate = jnp.abs(n @ exp_n) >= min_normal_cos
        counts = jnp.where(gate, counts, -1)
    if prefer_farthest:
        ok = counts >= jnp.maximum(jnp.max(counts), 1) // 2
        best = jnp.argmax(jnp.where(ok & (counts > 0), jnp.abs(d), -1.0))
    else:
        best = jnp.argmax(counts)
    inlier = inl[:, best]

    # refine: PCA plane over inliers
    w = inlier.astype(jnp.float32)[:, None]
    nw = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w, axis=0) / nw
    cen = (points - mean) * w
    cov = cen.T @ cen / nw
    _, _, vt = jnp.linalg.svd(cov)
    n_ref = vt[-1]
    n_ref = n_ref / jnp.where(jnp.linalg.norm(n_ref) > 1e-12, jnp.linalg.norm(n_ref), 1.0)
    d_ref = -jnp.dot(n_ref, mean)
    dist_ref = jnp.abs(points @ n_ref + d_ref)
    inlier_ref = (dist_ref < inlier_thresh) & valid
    plane = jnp.concatenate([n_ref, d_ref[None]])
    return plane, inlier_ref, jnp.sum(inlier_ref)


def make_triplet_indices(valid_mask, n_hyp=256, seed=0):
    """Host-side 3-point sample indices over valid rows."""
    rng = np.random.default_rng(seed)
    idx = np.where(np.asarray(valid_mask))[0]
    if len(idx) < 3:
        return np.zeros((n_hyp, 3), dtype=np.int32)
    return np.stack(
        [rng.choice(idx, size=3, replace=False) for _ in range(n_hyp)]
    ).astype(np.int32)
