"""Image kernels: Sobel, Canny edge detection, crops.

TPU-native replacements for the OpenCV kernels the reference calls in its
detector hot path (detect_3d_cuboid/src/box_proposal_detail.cpp:195-199:
cv::Canny(gray(bbox), 80, 200) then cv::distanceTransform). Everything is
fixed-shape, mask-aware, and jit/vmap friendly: a whole batch of bbox crops
runs as one XLA program.

Canny follows OpenCV semantics: 3x3 Sobel with replicate border, L1 gradient
magnitude against the thresholds, 4-sector non-maximum suppression, and
8-connected hysteresis (realized as a dilation fixpoint under lax.while_loop).
The reference notes its own Canny differs from matlab's
(detect_3d_cuboid/README.md:3), so exact bit-parity is not required — but the
semantics match OpenCV's algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=jnp.float32)
_SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype=jnp.float32)


def _conv3x3_replicate(img, kernel):
    """3x3 correlation with replicate border on (H, W) f32."""
    padded = jnp.pad(img, 1, mode="edge")
    out = jnp.zeros_like(img)
    H, W = img.shape
    for dy in range(3):
        for dx in range(3):
            out = out + kernel[dy, dx] * lax.dynamic_slice(padded, (dy, dx), (H, W))
    return out


def sobel(img):
    """(H, W) f32 -> (dx, dy) gradients, OpenCV 3x3 Sobel, replicate border."""
    return _conv3x3_replicate(img, _SOBEL_X), _conv3x3_replicate(img, _SOBEL_Y)


def _shift(img, dy, dx, fill=0.0):
    """Shift with constant fill; shifted[y, x] = img[y+dy, x+dx]."""
    H, W = img.shape
    padded = jnp.pad(img, 1, mode="constant", constant_values=fill)
    return lax.dynamic_slice(padded, (1 + dy, 1 + dx), (H, W))


_TG22 = 0.4142135623730951  # tan(22.5 deg)


def canny_nms(img, low=80.0, high=200.0, valid_mask=None):
    """Sobel + L1 magnitude + 4-sector non-max suppression.

    Returns (strong, weak) bool maps (weak includes strong). Split from the
    hysteresis stage so a frame's NMS can be shared across many bbox crops
    (the reference recomputes Canny per crop,
    box_proposal_detail.cpp:195-199; hysteresis is re-run per crop region).
    """
    dx, dy = sobel(img)
    if valid_mask is not None:
        # replicate-border semantics inside the valid region: kill gradients
        # computed from any padding pixel (erode the mask by 1).
        m = valid_mask
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                m = m & _shift(valid_mask, sy, sx, fill=False).astype(bool)
        dx = jnp.where(m, dx, 0.0)
        dy = jnp.where(m, dy, 0.0)
    mag = jnp.abs(dx) + jnp.abs(dy)

    adx = jnp.abs(dx)
    ady = jnp.abs(dy)
    # sector selection (OpenCV canny integer arithmetic equivalent)
    horiz = ady < _TG22 * adx  # gradient ~ horizontal -> compare x neighbors
    vert = ady > (adx / _TG22)  # gradient ~ vertical -> compare y neighbors
    diag_sign = jnp.sign(dx) * jnp.sign(dy)  # >0: 135 deg, <0: 45 deg

    m_l = _shift(mag, 0, -1)
    m_r = _shift(mag, 0, 1)
    m_u = _shift(mag, -1, 0)
    m_d = _shift(mag, 1, 0)
    m_ul = _shift(mag, -1, -1)
    m_dr = _shift(mag, 1, 1)
    m_ur = _shift(mag, -1, 1)
    m_dl = _shift(mag, 1, -1)

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    keep_d135 = (mag > m_ul) & (mag >= m_dr)
    keep_d45 = (mag > m_ur) & (mag >= m_dl)
    keep_diag = jnp.where(diag_sign > 0, keep_d135, keep_d45)
    keep = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_diag))

    strong = keep & (mag > high)
    weak = keep & (mag > low)
    return strong, weak


def canny_hysteresis(strong, weak, max_iters=512):
    """8-connected hysteresis: grow strong edges through weak pixels to a
    fixpoint (lax.while_loop; trip count bounded by the longest weak chain)."""

    def dilate8(x):
        out = x
        for sy in (-1, 0, 1):
            for sx in (-1, 0, 1):
                if sy == 0 and sx == 0:
                    continue
                out = out | _shift(x, sy, sx, fill=False).astype(bool)
        return out

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        edges, _, it = state
        grown = weak & dilate8(edges) | edges
        return grown, jnp.any(grown != edges), it + 1

    edges, _, _ = lax.while_loop(cond, body, (strong, jnp.asarray(True), 0))
    return edges


def canny(img, low=80.0, high=200.0, valid_mask=None, max_hysteresis_iters=512):
    """OpenCV-style Canny on (H, W) f32 grayscale -> (H, W) bool edge map.

    L1 gradient magnitude (OpenCV default L2gradient=false), 4-sector NMS,
    8-connected hysteresis grown to a fixpoint.
    """
    strong, weak = canny_nms(img, low=low, high=high, valid_mask=valid_mask)
    return canny_hysteresis(strong, weak, max_iters=max_hysteresis_iters)


def extract_crop(img, y0, x0, crop_h, crop_w):
    """Dynamic fixed-size crop with clamping; returns (crop, valid_mask).

    (y0, x0) is clamped so the window stays inside the image; valid_mask is
    all-True then (clamping, not padding). For crops larger than the image
    the window starts at 0 and the mask marks the in-image region.
    """
    H, W = img.shape
    y0 = jnp.clip(y0, 0, max(H - crop_h, 0))
    x0 = jnp.clip(x0, 0, max(W - crop_w, 0))
    if crop_h <= H and crop_w <= W:
        crop = lax.dynamic_slice(img, (y0, x0), (crop_h, crop_w))
        return crop, jnp.ones((crop_h, crop_w), dtype=bool)
    padded = jnp.zeros((max(H, crop_h), max(W, crop_w)), dtype=img.dtype)
    padded = lax.dynamic_update_slice(padded, img, (0, 0))
    crop = lax.dynamic_slice(padded, (y0, x0), (crop_h, crop_w))
    yy = jnp.arange(crop_h)[:, None] + y0
    xx = jnp.arange(crop_w)[None, :] + x0
    return crop, (yy < H) & (xx < W)


def gaussian_kernel1d(sigma, radius):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur(img, sigma, radius=None):
    """Separable Gaussian blur, replicate border, (H, W) or (..., H, W)."""
    if radius is None:
        radius = int(3.0 * float(sigma) + 0.5)
    k = gaussian_kernel1d(sigma, radius)

    def blur2d(im):
        p = jnp.pad(im, ((radius, radius), (0, 0)), mode="edge")
        im = sum(k[i] * lax.dynamic_slice(p, (i, 0), im.shape) for i in range(2 * radius + 1))
        p = jnp.pad(im, ((0, 0), (radius, radius)), mode="edge")
        im = sum(k[i] * lax.dynamic_slice(p, (0, i), im.shape) for i in range(2 * radius + 1))
        return im

    if img.ndim == 2:
        return blur2d(img)
    flat = img.reshape((-1,) + img.shape[-2:])
    return jax.vmap(blur2d)(flat).reshape(img.shape)


def pyr_down(img):
    """OpenCV pyrDown-style: 5x5 Gaussian blur then 2x decimation."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=jnp.float32) / 16.0

    def sep(im):
        p = jnp.pad(im, ((2, 2), (0, 0)), mode="edge")
        im = sum(k[i] * lax.dynamic_slice(p, (i, 0), im.shape) for i in range(5))
        p = jnp.pad(im, ((0, 0), (2, 2)), mode="edge")
        im = sum(k[i] * lax.dynamic_slice(p, (0, i), im.shape) for i in range(5))
        return im

    return sep(img)[::2, ::2]
