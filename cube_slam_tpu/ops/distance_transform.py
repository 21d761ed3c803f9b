"""Distance transforms of edge maps.

Replaces cv::distanceTransform(255 - canny, CV_DIST_L2, 3)
(detect_3d_cuboid/src/box_proposal_detail.cpp:199). Two variants:

* `edt_l2` — exact Euclidean distance transform, fully parallel: an exact
  1D vertical pass (two lax.scan sweeps) followed by a row-wise min-plus
  reduction over columns, blocked to bound memory. This is the default: it
  is *more* accurate than the reference's 3x3 chamfer approximation and maps
  cleanly onto the VPU.
* `chamfer_l2_3x3` — OpenCV's 3x3 chamfer approximation (a=0.955, b=1.3693)
  as two raster scans, for parity experiments against the C++ outputs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_INF = 1e9
# OpenCV DIST_L2 / DIST_MASK_3 weights (opencv modules/imgproc/src/distransform.cpp)
_CHAMFER_A = 0.955
_CHAMFER_B = 1.3693


def _vertical_dist(edge_mask):
    """Exact per-column vertical distance to the nearest edge pixel.

    (H, W) bool -> (H, W) f32: d[i, x] = min_j |i - j| over edge[j, x].
    Two sequential sweeps over rows (lax.scan of W-wide vectors).
    """
    start = jnp.where(edge_mask, 0.0, _INF)

    def fwd(carry, row):
        d = jnp.minimum(row, carry + 1.0)
        return d, d

    _, down = lax.scan(fwd, jnp.full(edge_mask.shape[1], _INF), start)
    _, up = lax.scan(fwd, jnp.full(edge_mask.shape[1], _INF), start, reverse=True)
    return jnp.minimum(down, up)


def edt_l2(edge_mask, row_block=8):
    """Exact L2 EDT: (H, W) bool edge mask -> (H, W) f32 distances.

    Pass 2 evaluates D[i,x] = min_u sqrt(g[i,u]^2 + (x-u)^2) as a blocked
    (row_block, W, W) min-reduction — O(H W^2) parallel work, which the VPU
    eats; no data-dependent control flow.
    """
    H, W = edge_mask.shape
    g = _vertical_dist(edge_mask)  # (H, W)
    g2 = g * g
    xx = jnp.arange(W, dtype=jnp.float32)
    sq = (xx[:, None] - xx[None, :]) ** 2  # (W_out, W_src)

    pad = (-H) % row_block
    g2p = jnp.pad(g2, ((0, pad), (0, 0)), constant_values=_INF)
    blocks = g2p.reshape(-1, row_block, W)

    def per_block(b):
        # b: (row_block, W_src) -> (row_block, W_out)
        return jnp.min(b[:, None, :] + sq[None, :, :], axis=-1)

    out = lax.map(per_block, blocks).reshape(-1, W)[:H]
    return jnp.sqrt(jnp.minimum(out, _INF))


def chamfer_l2_3x3(edge_mask):
    """OpenCV 3x3 chamfer DT (approximate L2): two raster scans.

    Row-sequential via lax.scan; the in-row left-to-right/right-to-left
    propagation is realized with an inner associative scan (the recurrence
    r[j] = min(v[j], r[j-1] + a) is a min-plus running reduction).
    """
    H, W = edge_mask.shape
    start = jnp.where(edge_mask, 0.0, _INF)
    ramp = _CHAMFER_A * jnp.arange(W, dtype=jnp.float32)

    def lr_pass(v):
        # r[j] = min_{k<=j} (v[k] + a (j-k)) = a j + cummin(v - a k)
        return ramp + lax.cummin(v - ramp)

    def rl_pass(v):
        return lr_pass(v[::-1])[::-1]

    def row_relax(prev_row, cur):
        # relax from the previous row (vertical + diagonals), then in-row
        up = prev_row + _CHAMFER_A
        ul = jnp.concatenate([jnp.array([_INF]), prev_row[:-1] + _CHAMFER_B])
        ur = jnp.concatenate([prev_row[1:] + _CHAMFER_B, jnp.array([_INF])])
        cur = jnp.minimum(jnp.minimum(cur, up), jnp.minimum(ul, ur))
        cur = lr_pass(cur)
        return cur, cur

    _, fwd = lax.scan(row_relax, jnp.full(W, _INF), start)

    def row_relax_rev(prev_row, cur):
        down = prev_row + _CHAMFER_A
        dl = jnp.concatenate([jnp.array([_INF]), prev_row[:-1] + _CHAMFER_B])
        dr = jnp.concatenate([prev_row[1:] + _CHAMFER_B, jnp.array([_INF])])
        cur = jnp.minimum(jnp.minimum(cur, down), jnp.minimum(dl, dr))
        cur = rl_pass(cur)
        return cur, cur

    _, bwd = lax.scan(row_relax_rev, jnp.full(W, _INF), fwd, reverse=True)
    return jnp.minimum(bwd, _INF)
