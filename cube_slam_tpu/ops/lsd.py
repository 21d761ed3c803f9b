"""Line-segment detection — TPU-native equivalent of LSD.

The reference bundles von Gioi's LSD (line_lbd/libs/lsd.cpp:440 `flsd`:
pseudo-ordered region growing + rectangle refinement + NFA validation) and
wraps it in `line_lbd_detect::detect_raw_lines`
(line_lbd/class/line_lbd_allclass.cpp:125-189). Region growing is
inherently sequential, so this module re-designs the algorithm for SPMD
hardware while keeping the same contract (image -> [x1 y1 x2 y2] segments
with length filtering):

1. 2x2 gradients and level-line angles exactly as LSD (lsd.cpp gradient
   definition: gx = (I[y,x+1]+I[y+1,x+1]-I[y,x]-I[y+1,x])/2 etc.),
2. support-region extraction as ANGLE-CONSTRAINED CONNECTED COMPONENTS:
   iterative min-label propagation over 8-neighbors whose level-line angles
   agree within the LSD tolerance (22.5 deg) — a parallel fixpoint instead
   of seed-ordered growth,
3. per-component weighted PCA (segment_sum moment accumulation) for line
   direction, endpoints from extreme projections onto the principal axis,
4. density/length/aspect filters standing in for LSD's NFA test.

Output is a fixed-capacity (max_lines, 4) array + validity mask, sorted by
length descending.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import image as im_ops

_ANGLE_TOL = jnp.deg2rad(22.5)


def _lsd_gradients(img):
    """LSD 2x2 gradients (lsd.cpp: grad computed on 2x2 cell at (x, y))."""
    H, W = img.shape
    ip = jnp.pad(img, ((0, 1), (0, 1)), mode="edge")
    a = ip[:H, :W]        # I[y, x]
    b = ip[:H, 1 : W + 1]  # I[y, x+1]
    c = ip[1 : H + 1, :W]  # I[y+1, x]
    d = ip[1 : H + 1, 1 : W + 1]
    gx = (b + d - a - c) * 0.5
    gy = (c + d - a - b) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level-line angle (perpendicular to gradient), as in LSD
    angle = jnp.arctan2(gx, -gy)
    return gx, gy, mag, angle


def _angle_close(a1, a2, tol=_ANGLE_TOL):
    d = jnp.abs(a1 - a2)
    d = jnp.minimum(d, 2 * jnp.pi - d)
    # level-line angles are mod pi equivalent for undirected lines, but LSD
    # region growing compares mod 2pi; keep LSD behavior.
    return d < tol


def _propagate_labels(labels, angle, active, num_iters):
    """Iterated min-label propagation across angle-compatible 8-neighbors.

    Each active pixel takes the min label among itself and compatible active
    neighbors; log-time convergence via pointer-jumping-style doubling is
    approximated by a fixed number of sweeps (num_iters) — segments are thin
    and elongated, so label distance shrinks quickly along the segment.
    """
    H, W = labels.shape

    def shift(x, dy, dx, fill):
        return lax.dynamic_slice(
            jnp.pad(x, 1, mode="constant", constant_values=fill),
            (1 + dy, 1 + dx), (H, W),
        )

    BIGL = jnp.int32(H * W + 1)

    def body(_, lab):
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nl = shift(lab, dy, dx, BIGL)
                na = shift(angle, dy, dx, 1e9)
                nact = shift(active.astype(jnp.int32), dy, dx, 0).astype(bool)
                ok = nact & _angle_close(angle, na)
                best = jnp.where(ok & (nl < best), nl, best)
        # label doubling: jump to the label of your current representative
        rep = best.reshape(-1)[jnp.clip(best.reshape(-1), 0, H * W - 1)].reshape(H, W)
        best = jnp.minimum(best, jnp.where(best < BIGL, rep, BIGL))
        return jnp.where(active, best, BIGL)

    return lax.fori_loop(0, num_iters, body, labels)


def _fit_lines_from_support(
    active,
    angle,
    mag,
    min_pixels,
    min_length,
    min_density,
    max_width_ratio,
    max_lines,
    num_prop_iters,
    max_abs_width=None,
):
    """Shared SPMD core: support mask + per-pixel angle/weight ->
    (lines (max_lines, 4), valid). Angle-constrained connected components,
    weighted-PCA line fit, geometric filters, top-k by length."""
    H, W = active.shape
    N = H * W

    init_labels = jnp.where(
        active, jnp.arange(N, dtype=jnp.int32).reshape(H, W), jnp.int32(N + 1)
    )
    labels = _propagate_labels(init_labels, angle, active, num_prop_iters)

    flat_lab = jnp.where(active.reshape(-1), labels.reshape(-1), N)  # N = trash bin
    xs = (jnp.arange(N, dtype=jnp.float32) % W).reshape(-1)
    ys = jnp.floor(jnp.arange(N, dtype=jnp.float32) / W).reshape(-1)
    w = jnp.where(active.reshape(-1), mag.reshape(-1), 0.0)

    seg = functools.partial(jax.ops.segment_sum, num_segments=N + 1)
    s_w = seg(w, flat_lab)
    s_x = seg(w * xs, flat_lab)
    s_y = seg(w * ys, flat_lab)
    s_xx = seg(w * xs * xs, flat_lab)
    s_yy = seg(w * ys * ys, flat_lab)
    s_xy = seg(w * xs * ys, flat_lab)
    s_n = seg(active.reshape(-1).astype(jnp.float32), flat_lab)

    s_w_safe = jnp.where(s_w > 0, s_w, 1.0)
    cx = s_x / s_w_safe
    cy = s_y / s_w_safe
    vxx = s_xx / s_w_safe - cx * cx
    vyy = s_yy / s_w_safe - cy * cy
    vxy = s_xy / s_w_safe - cx * cy

    # principal axis of the 2x2 covariance (closed form)
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    disc = jnp.sqrt(jnp.clip(tr * tr / 4.0 - det, 0.0, None))
    lam1 = tr / 2.0 + disc  # major
    lam2 = tr / 2.0 - disc  # minor
    # eigvec for lam1 (vxy ~ 0: axis-aligned — pick the larger variance axis)
    ex = jnp.where(jnp.abs(vxy) > 1e-9, lam1 - vyy, jnp.where(vxx >= vyy, 1.0, 0.0))
    ey = jnp.where(jnp.abs(vxy) > 1e-9, vxy, jnp.where(vxx >= vyy, 0.0, 1.0))
    en = jnp.sqrt(ex * ex + ey * ey)
    ex = ex / jnp.where(en > 1e-9, en, 1.0)
    ey = ey / jnp.where(en > 1e-9, en, 1.0)

    # endpoint extents: min/max projection of member pixels onto the axis
    proj = (xs - cx[flat_lab]) * ex[flat_lab] + (ys - cy[flat_lab]) * ey[flat_lab]
    proj_act = jnp.where(active.reshape(-1), proj, 0.0)
    s_min = jax.ops.segment_min(
        jnp.where(active.reshape(-1), proj, 1e9), flat_lab, num_segments=N + 1
    )
    s_max = jax.ops.segment_max(
        jnp.where(active.reshape(-1), proj, -1e9), flat_lab, num_segments=N + 1
    )

    length = s_max - s_min
    width = jnp.sqrt(jnp.clip(lam2, 0.0, None)) * 3.46  # ~full width (2*sqrt(3)*std)
    density = s_n / jnp.maximum(length * jnp.maximum(width, 1.0), 1.0)

    good = (
        (s_n >= min_pixels)
        & (length >= min_length)
        & (width <= jnp.maximum(max_width_ratio * length, 3.0))
        & (density >= min_density)
    )
    if max_abs_width is not None:
        # EDLine-style straightness bound: member pixels must stay within a
        # fixed orthogonal distance of the fitted line (lineFitErrThreshold)
        good = good & (width <= max_abs_width)
    good = good.at[N:].set(False)  # trash bins

    x1 = cx + s_min * ex
    y1 = cy + s_min * ey
    x2 = cx + s_max * ex
    y2 = cy + s_max * ey
    # left-to-right convention
    flipme = x2 < x1
    x1n = jnp.where(flipme, x2, x1)
    y1n = jnp.where(flipme, y2, y1)
    x2n = jnp.where(flipme, x1, x2)
    y2n = jnp.where(flipme, y1, y2)

    score = jnp.where(good, length, -1.0)
    top_score, top_idx = lax.top_k(score, max_lines)
    lines = jnp.stack(
        [x1n[top_idx], y1n[top_idx], x2n[top_idx], y2n[top_idx]], axis=-1
    )
    valid = top_score > 0
    lines = jnp.where(valid[:, None], lines, 0.0)
    return lines, valid


@functools.partial(jax.jit, static_argnames=("max_lines", "num_prop_iters"))
def detect_lines(
    img,
    mag_threshold=5.22,
    min_pixels=20,
    min_length=15.0,
    min_density=0.5,
    max_width_ratio=0.25,
    max_lines=128,
    num_prop_iters=32,
):
    """LSD flavor: (H, W) f32 grayscale -> (lines (max_lines, 4), valid).

    Support = pixels with gradient magnitude above LSD's rho
    (~5.22 for q=2: 2 / sin(tol) * q/255-quantization). Lines sorted by
    length descending, [x1 y1 x2 y2] with x1 <= x2
    (align_left_right_edges convention).
    """
    gx, gy, mag, angle = _lsd_gradients(img)
    active = mag > mag_threshold
    return _fit_lines_from_support(
        active, angle, mag, min_pixels, min_length, min_density,
        max_width_ratio, max_lines, num_prop_iters)


@functools.partial(jax.jit, static_argnames=("max_lines", "num_prop_iters"))
def detect_edlines(
    img,
    grad_threshold=30.0,
    min_pixels=12,
    min_length=15.0,
    max_fit_width=2.5,
    max_lines=128,
    num_prop_iters=32,
):
    """EDLine flavor (binary_descriptor.cpp:792-818 EDLineDetector).

    EDLine walks 1-px edge chains drawn from gradient anchors and fits
    segments with a bounded fit error. SPMD re-design: the NMS-thinned
    edge map (ops/image.canny_nms — the same anchor/peak criterion) is the
    support set; angle-constrained components group chain pixels; the PCA
    fit's minor-axis width bound enforces EDLine's lineFitErrThreshold.
    Thin supports make the density/width-ratio filters of LSD moot, so the
    straightness bound (max_fit_width, px) is the selective filter.
    """
    strong, _weak = im_ops.canny_nms(img, low=grad_threshold, high=grad_threshold)
    _gx, _gy, mag, angle = _lsd_gradients(img)
    active = strong & (mag > 1e-3)
    return _fit_lines_from_support(
        active, angle, mag, min_pixels, min_length, 0.0, 1e9,
        max_lines, num_prop_iters, max_abs_width=max_fit_width)


def detect_lines_pyramid(
    img,
    n_octaves=2,
    detector="lsd",
    max_lines=128,
    min_length=15.0,
    **kwargs,
):
    """Octave-pyramid detection (LSDDetector.cpp:55-73 + the per-octave
    loop of line_lbd_allclass.cpp:282-337): Gaussian pyrDown per octave,
    detect on each octave image, rescale endpoints to base-image pixels.

    Returns dict with:
      lines_base (n_octaves*max_lines, 4) — endpoints in BASE pixels,
      lines_octave (same shape)           — endpoints in octave pixels,
      octave (n,) int32, valid (n,) bool,
      octave_images: list of the n_octaves pyramid images (for per-octave
      descriptor computation, the reference's computeLBD_(octaveImages)).
    """
    detect = {"lsd": detect_lines, "edline": detect_edlines}[detector]
    imgs = [jnp.asarray(img, dtype=jnp.float32)]
    for _ in range(n_octaves - 1):
        imgs.append(im_ops.pyr_down(imgs[-1]))

    all_lines_base, all_lines_oct, all_oct, all_valid = [], [], [], []
    for o, im in enumerate(imgs):
        # same metric length threshold across octaves (octave pixels are
        # 2^o base pixels)
        ln, va = detect(im, min_length=min_length / (2.0**o),
                        max_lines=max_lines, **kwargs)
        all_lines_oct.append(ln)
        all_lines_base.append(ln * (2.0**o))
        all_oct.append(jnp.full((max_lines,), o, dtype=jnp.int32))
        all_valid.append(va)
    return {
        "lines_base": jnp.concatenate(all_lines_base, axis=0),
        "lines_octave": jnp.concatenate(all_lines_oct, axis=0),
        "octave": jnp.concatenate(all_oct, axis=0),
        "valid": jnp.concatenate(all_valid, axis=0),
        "octave_images": imgs,
    }
