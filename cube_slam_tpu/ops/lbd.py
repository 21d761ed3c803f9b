"""Line Band Descriptors (LBD) + binary line matching.

Re-design of line_lbd's BinaryDescriptor (line_lbd/libs/binary_descriptor.cpp:
1146+ computeLBD: 9 bands x (mean, std) of rectified gradient projections,
binarized by 32-byte pairwise comparisons, matched with multi-index hashing)
for SPMD hardware:

* every line's support region is sampled on a fixed (bands x rows x cols)
  grid by one batched bilinear gather,
* image gradients are rotated into the line frame (dL along, dO orthogonal)
  and rectified into (dL+, dL-, dO+, dO-),
* band statistics (mean + std over the band rows, Gaussian-weighted across
  bands) form the 72-d float descriptor; L2-normalized,
* binarization uses a seeded deterministic pair-comparison table (the
  reference's combinations[32][2] is an arbitrary constant; our descriptors
  only match each other), giving 256-bit codes,
* matching is the whole-set XOR/popcount Hamming matrix (ops/matching.py)
  — the dense TPU replacement for the Mihasher inverted tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import image as im_ops
from . import matching

N_BANDS = 9
BAND_ROWS = 7          # rows per band across the line
N_SAMPLES = 32         # samples along the line


def _bilinear(img, x, y):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _make_binary_pairs(seed=7, n_bits=256, dim=72):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, dim, n_bits)
    b = rng.integers(0, dim, n_bits)
    clash = a == b
    b = np.where(clash, (b + 1) % dim, b)
    return a.astype(np.int32), b.astype(np.int32)


_PAIR_A, _PAIR_B = _make_binary_pairs()


@functools.partial(jax.jit, static_argnames=())
def lbd_descriptors(img, lines, valid):
    """img (H, W) f32; lines (N, 4) [x1 y1 x2 y2]; valid (N,).

    Returns (float_desc (N, 72), binary_desc (N, 8) uint32)."""
    gx, gy = im_ops.sobel(img)
    total_rows = N_BANDS * BAND_ROWS

    # Gaussian weight across rows (global, sigma = half region) as in LBD
    rr = jnp.arange(total_rows, dtype=jnp.float32) - (total_rows - 1) / 2.0
    g_global = jnp.exp(-(rr**2) / (2.0 * (total_rows / 2.0) ** 2))

    def one(line):
        p1 = line[:2]
        p2 = line[2:]
        d = p2 - p1
        length = jnp.maximum(jnp.linalg.norm(d), 1e-6)
        dl = d / length  # along-line unit
        dn = jnp.stack([-dl[1], dl[0]])  # orthogonal

        s = jnp.linspace(0.0, 1.0, N_SAMPLES)
        centers = p1[None, :] + s[:, None] * d[None, :]  # (S, 2)
        offs = (jnp.arange(total_rows, dtype=jnp.float32) - (total_rows - 1) / 2.0)
        pts = centers[None, :, :] + offs[:, None, None] * dn[None, None, :]  # (R, S, 2)

        gxs = _bilinear(gx, pts[..., 0], pts[..., 1])  # (R, S)
        gys = _bilinear(gy, pts[..., 0], pts[..., 1])
        gL = gxs * dl[0] + gys * dl[1]
        gO = gxs * dn[0] + gys * dn[1]
        feats = jnp.stack(
            [jnp.maximum(gL, 0), jnp.maximum(-gL, 0),
             jnp.maximum(gO, 0), jnp.maximum(-gO, 0)], axis=-1
        )  # (R, S, 4)
        feats = feats * g_global[:, None, None]

        # band statistics: per band, mean and std over (rows-in-band x samples)
        bands = feats.reshape(N_BANDS, BAND_ROWS, N_SAMPLES, 4)
        mean = jnp.mean(bands, axis=(1, 2))          # (9, 4)
        std = jnp.std(bands, axis=(1, 2))            # (9, 4)
        desc = jnp.concatenate([mean, std], axis=-1).reshape(-1)  # (72,)
        norm = jnp.linalg.norm(desc)
        return desc / jnp.where(norm > 1e-9, norm, 1.0)

    fdesc = jax.vmap(one)(lines)  # (N, 72)
    fdesc = jnp.where(valid[:, None], fdesc, 0.0)

    # binarize: 256 pairwise comparisons -> (N, 8) uint32
    a = jnp.asarray(_PAIR_A)
    b = jnp.asarray(_PAIR_B)
    bits = (fdesc[:, a] > fdesc[:, b]).astype(jnp.uint32)  # (N, 256)
    words = bits.reshape(-1, 8, 32) << jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bdesc = jnp.sum(words, axis=-1).astype(jnp.uint32)
    return fdesc, jnp.where(valid[:, None], bdesc, 0)


def describe_lines_pyramid(img, n_octaves=2, detector="lsd", max_lines=128,
                           **detect_kwargs):
    """Detect + describe lines over a Gaussian octave pyramid — the
    LSDDetector octave loop + per-octave computeLBD_
    (line_lbd_allclass.cpp:282-337, binary_descriptor.cpp:2379,
    LSDDetector.cpp:55-73). Descriptors are computed on each OCTAVE image
    with octave-local coordinates; endpoints are reported in BASE pixels.

    Returns dict: lines (n_octaves*max_lines, 4) base px, octave (n,) i32,
    valid (n,) bool, fdesc (n, 72), bdesc (n, 8) uint32. The merged
    descriptor set feeds match_lines directly (cross-octave matching, as
    the reference's matchLBD over all KeyLines).
    """
    from . import lsd as lsd_ops

    pyr = lsd_ops.detect_lines_pyramid(
        img, n_octaves=n_octaves, detector=detector, max_lines=max_lines,
        **detect_kwargs)
    fds, bds = [], []
    for o, im in enumerate(pyr["octave_images"]):
        sl = slice(o * max_lines, (o + 1) * max_lines)
        fd, bd = lbd_descriptors(im, pyr["lines_octave"][sl], pyr["valid"][sl])
        fds.append(fd)
        bds.append(bd)
    return {
        "lines": pyr["lines_base"],
        "octave": pyr["octave"],
        "valid": pyr["valid"],
        "fdesc": jnp.concatenate(fds, axis=0),
        "bdesc": jnp.concatenate(bds, axis=0),
    }


def match_lines(desc1, valid1, desc2, valid2, max_dist=80, ratio=0.9):
    """Binary line matching (BinaryDescriptorMatcher analog): dense Hamming
    + mutual/ratio filtering. Returns (match (N1,) idx or -1, dist)."""
    d = matching.hamming_matrix(desc1, desc2, valid1, valid2)
    return matching.match_mutual_ratio(d, max_dist=max_dist, ratio=ratio, mutual=True)
