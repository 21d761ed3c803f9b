import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.ops import lsd
from cube_slam_tpu.utils import io


def test_rectangle_edges():
    img = np.zeros((120, 160), dtype=np.float32)
    img[30:90, 40:130] = 200.0
    lines, valid = lsd.detect_lines(jnp.asarray(img), max_lines=32)
    L = np.asarray(lines)[np.asarray(valid)]
    assert len(L) == 4
    # two horizontal at y~29/89, two vertical at x~39/129
    horiz = L[np.abs(L[:, 1] - L[:, 3]) < 2]
    vert = L[np.abs(L[:, 0] - L[:, 2]) < 2]
    assert len(horiz) == 2 and len(vert) == 2
    assert sorted(np.round(h[1]) for h in horiz) == [29, 89]
    assert sorted(np.round(v[0]) for v in vert) == [39, 129]
    # x1 <= x2 convention
    assert (L[:, 0] <= L[:, 2]).all()


def test_diagonal_line():
    img = np.zeros((96, 96), dtype=np.float32)
    for i in range(70):
        img[10 + i, 10 + i : 96] = 150.0  # diagonal step edge
    lines, valid = lsd.detect_lines(jnp.asarray(img), max_lines=16)
    L = np.asarray(lines)[np.asarray(valid)]
    assert len(L) >= 1
    # longest line is the 45-degree diagonal
    lens = np.hypot(L[:, 2] - L[:, 0], L[:, 3] - L[:, 1])
    d = L[np.argmax(lens)]
    ang = np.degrees(np.arctan2(d[3] - d[1], d[2] - d[0]))
    assert abs(abs(ang) - 45.0) < 6.0


def test_fixture_recall_vs_reference_lsd():
    """Our detector must recover the majority of the offline LSD segments
    bundled with the reference fixture (detect_3d_cuboid/data/edge_detection)."""
    fx = io.load_detect3d_fixture()
    lines, valid = lsd.detect_lines(
        jnp.asarray(fx["gray"]), min_length=15.0, max_lines=256, min_pixels=15
    )
    L = np.asarray(lines)[np.asarray(valid)]
    off = fx["edges"]

    def seg_dist(a, b):
        return min(
            np.hypot(*(a[:2] - b[:2])) + np.hypot(*(a[2:] - b[2:])),
            np.hypot(*(a[:2] - b[2:])) + np.hypot(*(a[2:] - b[:2])),
        )

    matched = sum(1 for e in off if min(seg_dist(e, l) for l in L) < 30)
    recall = matched / len(off)
    assert recall > 0.6, f"recall vs reference LSD too low: {recall:.3f}"
