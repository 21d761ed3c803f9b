"""Descriptor matching — Hamming distances as dense batched ops.

Replaces ORBmatcher's per-feature loops (orb_object_slam/src/ORBmatcher.cc:
DescriptorDistance popcount :1905, SearchByProjection :50/:1373,
SearchForInitialization :429, rotation-histogram consistency :50-160) with
whole-set (N, M) distance matrices: XOR + lax.population_count, masked by
search windows, then mutual-best / ratio / rotation-histogram filters as
array reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

TH_LOW = 50      # ORBmatcher.cc:46 TH_LOW
TH_HIGH = 100    # ORBmatcher.cc:45 TH_HIGH
HISTO_LENGTH = 30  # rotation histogram bins (ORBmatcher.cc:47)
BIG = 10_000


@jax.jit
def hamming_matrix(desc_a, desc_b, valid_a=None, valid_b=None):
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances.

    Invalid rows/cols get distance BIG."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    d = jnp.sum(lax.population_count(x), axis=-1).astype(jnp.int32)
    if valid_a is not None:
        d = jnp.where(valid_a[:, None], d, BIG)
    if valid_b is not None:
        d = jnp.where(valid_b[None, :], d, BIG)
    return d


@functools.partial(jax.jit, static_argnames=("mutual",))
def match_mutual_ratio(dist, max_dist=TH_LOW, ratio=0.9, mutual=True):
    """Best match per row with Lowe ratio vs second best + optional mutual
    check (SearchForInitialization semantics, ORBmatcher.cc:429-540).

    dist: (N, M). Returns (match_idx (N,) int32 — M index or -1, match_dist).
    """
    N, M = dist.shape
    best_idx = jnp.argmin(dist, axis=1)
    best = jnp.min(dist, axis=1)
    second = jnp.min(
        jnp.where(jax.nn.one_hot(best_idx, M, dtype=bool), BIG, dist), axis=1
    )
    ok = (best <= max_dist) & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        best_col = jnp.argmin(dist, axis=0)  # (M,)
        ok = ok & (best_col[best_idx] == jnp.arange(N))
    return jnp.where(ok, best_idx, -1), best


@functools.partial(jax.jit, static_argnames=("n_keep",))
def rotation_consistency(angles_a, angles_b, match_idx, n_keep=3):
    """Keep matches whose angle difference falls in the top-n_keep histogram
    bins (ComputeThreeMaxima, ORBmatcher.cc:1870-1903)."""
    matched = match_idx >= 0
    rot = angles_a - angles_b[jnp.clip(match_idx, 0, None)]
    deg = jnp.degrees(rot)
    deg = jnp.where(deg < 0, deg + 360.0, deg)
    bins = jnp.clip((deg * HISTO_LENGTH / 360.0).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    counts = jnp.zeros((HISTO_LENGTH,), dtype=jnp.int32).at[bins].add(
        matched.astype(jnp.int32)
    )
    top_vals, top_bins = lax.top_k(counts, n_keep)
    # reference drops bins 2/3 when much smaller than bin 1 (<0.1x)
    keep_bin2 = top_vals[1].astype(jnp.float32) > 0.1 * top_vals[0].astype(jnp.float32)
    keep_bin3 = top_vals[2].astype(jnp.float32) > 0.1 * top_vals[0].astype(jnp.float32)
    in_top = (bins == top_bins[0]) \
        | ((bins == top_bins[1]) & keep_bin2) \
        | ((bins == top_bins[2]) & keep_bin3)
    return jnp.where(matched & in_top, match_idx, -1)


@jax.jit
def window_mask(xy_a, xy_b, radius, level_a=None, level_b=None, level_slack=1):
    """(N, M) bool: candidate b within a square search window of a's
    position (SearchByProjection windowing), optionally same-ish level."""
    dx = jnp.abs(xy_a[:, None, 0] - xy_b[None, :, 0])
    dy = jnp.abs(xy_a[:, None, 1] - xy_b[None, :, 1])
    r = radius if jnp.ndim(radius) == 0 else radius[:, None]
    m = (dx < r) & (dy < r)
    if level_a is not None and level_b is not None:
        dl = jnp.abs(level_a[:, None] - level_b[None, :])
        m = m & (dl <= level_slack)
    return m


@jax.jit
def search_by_projection(proj_xy, proj_valid, desc_map, level_map,
                         kp_xy, kp_desc, kp_level, kp_valid,
                         radius=15.0, max_dist=TH_HIGH, ratio=0.9):
    """Project map points and match to frame keypoints inside a window
    (SearchByProjection, ORBmatcher.cc:1373-1521 last-frame variant).

    proj_xy: (P, 2) projected map points; returns (match (P,) kp index or
    -1, dist)."""
    d = hamming_matrix(desc_map, kp_desc, proj_valid, kp_valid)
    wm = window_mask(proj_xy, kp_xy, radius, level_map, kp_level)
    d = jnp.where(wm, d, BIG)
    return match_mutual_ratio(d, max_dist=max_dist, ratio=ratio, mutual=False)
