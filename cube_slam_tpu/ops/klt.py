"""Pyramidal Lucas-Kanade optical flow + Harris corners.

Replaces cv::calcOpticalFlowPyrLK and cv::goodFeaturesToTrack as used for
dynamic-object point tracking (ORBmatcher::SearchByTracking[Harris],
ORBmatcher.cc:1524-1722; Harris corner spawning, Tracking.cc:2258-2338).
All keypoints iterate in lockstep: each LK iteration is one batched gather
+ 2x2 solve over the whole point set, levels walk coarse-to-fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import image as im_ops

WIN = 10  # half window (21 x 21 like OpenCV default)


def _scharr(img):
    """OpenCV LK uses Scharr-like derivatives; Sobel is adequate here."""
    return im_ops.sobel(img)


def _gather_patch(img, cx, cy, half):
    """Bilinear patch (2h+1, 2h+1) around float center (cx, cy)."""
    H, W = img.shape
    off = jnp.arange(-half, half + 1, dtype=jnp.float32)
    xs = cx + off[None, :]
    ys = cy + off[:, None]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) + v10 * (1 - fx) * fy + v11 * fx * fy


def _lk_level(img0, img1, gx0, gy0, pts0, guess, iters=10):
    """One pyramid level of LK for all points: pts0 (N, 2) in this level's
    coords; guess (N, 2) current flow estimate. Returns refined flow."""

    def one(p0, g):
        patch0 = _gather_patch(img0, p0[0], p0[1], WIN)
        ix = _gather_patch(gx0, p0[0], p0[1], WIN)
        iy = _gather_patch(gy0, p0[0], p0[1], WIN)
        a11 = jnp.sum(ix * ix)
        a12 = jnp.sum(ix * iy)
        a22 = jnp.sum(iy * iy)
        det = a11 * a22 - a12 * a12
        det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)

        def body(i, g):
            patch1 = _gather_patch(img1, p0[0] + g[0], p0[1] + g[1], WIN)
            it = patch1 - patch0
            b1 = jnp.sum(it * ix)
            b2 = jnp.sum(it * iy)
            dx = (a22 * b1 - a12 * b2) / det
            dy = (a11 * b2 - a12 * b1) / det
            return g - jnp.stack([dx, dy])

        return lax.fori_loop(0, iters, body, g)

    return jax.vmap(one)(pts0, guess)


def pyr_lk(img0, img1, pts0, valid, n_levels=3, iters=10, max_err=25.0,
           init_flow=None):
    """Track pts0 (N, 2) from img0 to img1 through an n_levels pyramid.

    init_flow (N, 2) seeds the coarse level (the reference seeds KLT from
    predicted object motion, ORBmatcher::SearchByTracking) — essential when
    the true motion exceeds the pyramid capture range or the texture
    aliases. Returns (pts1 (N, 2), status (N,) bool)."""
    img0 = jnp.asarray(img0, dtype=jnp.float32)
    img1 = jnp.asarray(img1, dtype=jnp.float32)
    pyr0 = [img0]
    pyr1 = [img1]
    for _ in range(n_levels - 1):
        pyr0.append(im_ops.pyr_down(pyr0[-1]))
        pyr1.append(im_ops.pyr_down(pyr1[-1]))

    N = pts0.shape[0]
    if init_flow is None:
        flow = jnp.zeros((N, 2), dtype=jnp.float32)
    else:
        flow = jnp.asarray(init_flow, dtype=jnp.float32) / (2.0 ** (n_levels - 1))
    for lvl in range(n_levels - 1, -1, -1):
        s = 2.0**lvl
        g0x, g0y = _scharr(pyr0[lvl])
        flow = _lk_level(pyr0[lvl], pyr1[lvl], g0x, g0y, pts0 / s, flow, iters=iters)
        if lvl > 0:
            flow = flow * 2.0

    pts1 = pts0 + flow * 1.0
    H, W = img0.shape

    def check(p0, p1):
        patch0 = _gather_patch(img0, p0[0], p0[1], 3)
        patch1 = _gather_patch(img1, p1[0], p1[1], 3)
        err = jnp.mean(jnp.abs(patch1 - patch0))
        inb = (p1[0] >= WIN) & (p1[0] < W - WIN) & (p1[1] >= WIN) & (p1[1] < H - WIN)
        return (err < max_err) & inb

    status = jax.vmap(check)(pts0, pts1) & valid
    return pts1, status


@functools.partial(jax.jit, static_argnames=("max_corners", "k", "quality", "min_dist"))
def harris_corners(img, max_corners=256, k=0.04, quality=0.01, min_dist=8,
                   mask=None):
    """goodFeaturesToTrack-style Harris corners: structure tensor + response
    + grid-based minimum-distance suppression + top-k."""
    img = jnp.asarray(img, dtype=jnp.float32)
    gx, gy = _scharr(img)
    gxx = im_ops.gaussian_blur(gx * gx, sigma=1.5, radius=2)
    gyy = im_ops.gaussian_blur(gy * gy, sigma=1.5, radius=2)
    gxy = im_ops.gaussian_blur(gx * gy, sigma=1.5, radius=2)
    resp = gxx * gyy - gxy * gxy - k * (gxx + gyy) ** 2
    if mask is not None:
        resp = jnp.where(mask, resp, -1e9)
    # threshold relative to max response
    resp = jnp.where(resp > quality * jnp.max(resp), resp, -1e9)
    # min-distance: strongest per (min_dist x min_dist) cell
    H, W = img.shape
    cell_r = (jnp.arange(H)[:, None] // min_dist)
    cell_c = (jnp.arange(W)[None, :] // min_dist)
    n_cc = (W + min_dist - 1) // min_dist
    cid = (cell_r * n_cc + cell_c).reshape(-1)
    n_cells = ((H + min_dist - 1) // min_dist) * n_cc
    flat = resp.reshape(-1)
    best = jax.ops.segment_max(flat, cid, num_segments=n_cells)
    iswin = flat >= jnp.where(best[cid] > -1e9, best[cid], 1e9)
    score = jnp.where(iswin, flat, -1e9)
    top_s, top_i = lax.top_k(score, max_corners)
    xy = jnp.stack([(top_i % W).astype(jnp.float32), (top_i // W).astype(jnp.float32)], axis=-1)
    return xy, top_s > -1e8