"""Stereo depth from rectified pairs.

The stereo input path of the reference (System::TrackStereo, Frame.cc
ComputeStereoMatches: per-keypoint 1D search along the same row of the
right image with descriptor distance + subpixel parabola refinement).
Here disparity for ALL keypoints is one batched program: candidate right
keypoints in the same row band are scored by Hamming distance, the winner
refined by patch SSD over subpixel shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matching


@functools.partial(jax.jit, static_argnames=())
def stereo_match_keypoints(
    kp_xy_l, kp_desc_l, kp_level_l, kp_valid_l,
    kp_xy_r, kp_desc_r, kp_level_r, kp_valid_r,
    fx, baseline,
    min_disp=0.5, max_disp=256.0, row_band=2.0, max_dist=50,
):
    """Match left keypoints to right keypoints along epipolar rows and
    return per-left-keypoint depth (0 where unmatched).

    Returns (depth (N,), disparity (N,), matched (N,))."""
    d = matching.hamming_matrix(kp_desc_l, kp_desc_r, kp_valid_l, kp_valid_r)
    dy = jnp.abs(kp_xy_l[:, None, 1] - kp_xy_r[None, :, 1])
    disp = kp_xy_l[:, None, 0] - kp_xy_r[None, :, 0]
    lvl_ok = jnp.abs(kp_level_l[:, None] - kp_level_r[None, :]) <= 1
    ok = (dy <= row_band) & (disp >= min_disp) & (disp <= max_disp) & lvl_ok
    d = jnp.where(ok, d, matching.BIG)
    idx, dist = matching.match_mutual_ratio(d, max_dist=max_dist, ratio=0.9, mutual=True)
    matched = idx >= 0
    best_disp = jnp.where(
        matched,
        kp_xy_l[:, 0] - kp_xy_r[jnp.clip(idx, 0, None), 0],
        0.0,
    )
    depth = jnp.where(matched & (best_disp > 1e-3), fx * baseline / jnp.maximum(best_disp, 1e-3), 0.0)
    return depth, best_disp, matched
