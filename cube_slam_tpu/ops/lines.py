"""Line-segment preprocessing.

Host-side (numpy) exact-parity ports of the reference's sequential edge
bookkeeping (detect_3d_cuboid/src/object_3d_util.cpp:147-376): aligning
endpoints left-to-right, filtering to a box, and the greedy iterative
merge of broken collinear segments. These run once per (frame, bbox) as part
of input preparation — like the data loader, they live on the host; the
per-proposal line math (VP support, angle scoring) runs on device inside the
detector lattice kernel (models/detector.py).

The greedy merge is order-dependent (the C++ restarts the pair scan after
every merge), so a faithful implementation is inherently sequential — a
masked/batched variant would change results. Kept in numpy for exactness.
"""

from __future__ import annotations

import numpy as np


def align_left_right_edges(lines):
    """Ensure x1 <= x2 for every segment (object_3d_util.cpp:147-158).

    lines: (N, 4) [x1 y1 x2 y2]; returns a new array.
    """
    lines = np.array(lines, dtype=np.float64, copy=True)
    if lines.size == 0:
        return lines.reshape(0, 4)
    flip = lines[:, 2] < lines[:, 0]
    lines[flip] = lines[flip][:, [2, 3, 0, 1]]
    return lines


def filter_inside_box(lines, left_top, right_bottom):
    """Keep segments with BOTH endpoints inside [left_top, right_bottom]
    (box_proposal_detail.cpp:165-174)."""
    if lines.size == 0:
        return lines.reshape(0, 4)
    lt = np.asarray(left_top)
    rb = np.asarray(right_bottom)

    def inside(pts):
        return (
            (lt[0] <= pts[:, 0]) & (pts[:, 0] <= rb[0]) & (lt[1] <= pts[:, 1]) & (pts[:, 1] <= rb[1])
        )

    keep = inside(lines[:, 0:2]) & inside(lines[:, 2:4])
    return lines[keep]


def merge_break_lines(lines, pre_merge_dist_thre=20.0, pre_merge_angle_thre_deg=5.0,
                      edge_length_threshold=30.0):
    """Greedy merge of broken collinear segments (semantics of
    object_3d_util.cpp:300-376). Dispatches to the native C++ runtime
    (runtime/merge_lines.cpp, ~100x faster than the Python loop) and falls
    back to the pure-Python implementation below when no toolchain exists.
    """
    lines = np.asarray(lines, dtype=np.float64)
    if lines.size == 0:
        return lines.reshape(0, 4)
    from .. import runtime as native_rt

    out = native_rt.merge_break_lines_native(
        lines, pre_merge_dist_thre, pre_merge_angle_thre_deg, edge_length_threshold
    )
    if out is not None:
        return out
    return merge_break_lines_py(
        lines, pre_merge_dist_thre, pre_merge_angle_thre_deg, edge_length_threshold
    )


def merge_break_lines_py(lines, pre_merge_dist_thre=20.0, pre_merge_angle_thre_deg=5.0,
                         edge_length_threshold=30.0):
    """Pure-Python exact-parity greedy merge (reference implementation).

    Repeatedly scans pairs (seg1 < seg2) in index order; the first pair that
    is (angle-close, endpoint-close, merged-angle-still-close) is merged into
    seg1 (union of extreme endpoints by x), seg2 removed, and the scan
    restarts. Stops after 500 iterations or when no pair merges. Finally
    drops segments shorter than edge_length_threshold.
    """
    work = np.array(lines, dtype=np.float64, copy=True)
    n = work.shape[0]
    angle_thre = np.deg2rad(pre_merge_angle_thre_deg)
    counter = 0
    merged_any = True
    while merged_any and counter < 500:
        counter += 1
        merged_any = False
        vec = work[:n, 2:4] - work[:n, 0:2]
        angles = np.arctan2(vec[:, 1], vec[:, 0])
        for s1 in range(n - 1):
            for s2 in range(s1 + 1, n):
                diff = abs(angles[s1] - angles[s2])
                angle_diff = min(diff, np.pi - diff)
                if angle_diff >= angle_thre:
                    continue
                d12 = np.linalg.norm(work[s1, 2:4] - work[s2, 0:2])
                d21 = np.linalg.norm(work[s2, 2:4] - work[s1, 0:2])
                if d12 >= pre_merge_dist_thre and d21 >= pre_merge_dist_thre:
                    continue
                start = work[s1, 0:2] if work[s1, 0] < work[s2, 0] else work[s2, 0:2]
                end = work[s1, 2:4] if work[s1, 2] > work[s2, 2] else work[s2, 2:4]
                merged_angle = np.arctan2(end[1] - start[1], end[0] - start[0])
                t = abs(angles[s1] - merged_angle)
                if min(t, np.pi - t) >= angle_thre:
                    continue
                work[s1, 0:2] = start
                work[s1, 2:4] = end
                # fast_RemoveRow: move last active row into s2's slot
                work[s2] = work[n - 1]
                n -= 1
                merged_any = True
                break
            if merged_any:
                break
    out = work[:n]
    if edge_length_threshold > 0:
        lens = np.linalg.norm(out[:, 2:4] - out[:, 0:2], axis=1)
        out = out[lens > edge_length_threshold]
    return out


def line_angles_midpoints(lines):
    """Per-segment angle (atan2 dy,dx in [-pi/2, pi/2] for aligned edges) and
    midpoint (box_proposal_detail.cpp:185-191)."""
    if lines.size == 0:
        return np.zeros((0,)), np.zeros((0, 2))
    vec = lines[:, 2:4] - lines[:, 0:2]
    angles = np.arctan2(vec[:, 1], vec[:, 0])
    mids = (lines[:, 0:2] + lines[:, 2:4]) / 2.0
    return angles, mids
