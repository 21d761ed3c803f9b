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


def test_edlines_rectangle():
    """EDLine flavor (NMS edge chains + straightness bound) finds the same
    rectangle edges as LSD."""
    img = np.zeros((120, 160), dtype=np.float32)
    img[30:90, 40:130] = 200.0
    lines, valid = lsd.detect_edlines(jnp.asarray(img), max_lines=32)
    L = np.asarray(lines)[np.asarray(valid)]
    assert len(L) >= 4
    horiz = L[np.abs(L[:, 1] - L[:, 3]) < 2]
    vert = L[np.abs(L[:, 0] - L[:, 2]) < 2]
    assert len(horiz) >= 2 and len(vert) >= 2
    ys = sorted(set(int(round(h[1])) for h in horiz))
    xs = sorted(set(int(round(v[0])) for v in vert))
    assert any(abs(y - 29) <= 1 for y in ys) and any(abs(y - 89) <= 1 for y in ys)
    assert any(abs(x - 39) <= 2 for x in xs) and any(abs(x - 129) <= 2 for x in xs)


def test_edlines_rejects_curves():
    """The straightness bound must reject a circle that LSD-style density
    filters alone might chop into 'lines'."""
    yy, xx = np.mgrid[0:128, 0:128]
    r = np.hypot(xx - 64, yy - 64)
    img = np.where(r < 40, 200.0, 0.0).astype(np.float32)
    lines, valid = lsd.detect_edlines(
        jnp.asarray(img), max_lines=32, min_length=30.0, max_fit_width=1.5)
    L = np.asarray(lines)[np.asarray(valid)]
    # no long straight segment should survive on a circle of radius 40
    lens = np.hypot(L[:, 2] - L[:, 0], L[:, 3] - L[:, 1]) if len(L) else []
    assert len(L) == 0 or max(lens) < 45.0


def test_pyramid_octaves_and_recall():
    """Octave pyramid: per-octave detection, base-pixel rescaling, and at
    least the single-scale lines recovered on the bundled fixture."""
    fx = io.load_detect3d_fixture()
    pyr = lsd.detect_lines_pyramid(
        jnp.asarray(fx["gray"]), n_octaves=2, max_lines=256, min_pixels=15,
        min_length=15.0)
    valid = np.asarray(pyr["valid"])
    octave = np.asarray(pyr["octave"])
    Lb = np.asarray(pyr["lines_base"])
    assert valid[octave == 0].sum() > 0 and valid[octave == 1].sum() > 0
    # octave-1 endpoints live in base pixels: must span beyond the half-res
    H, W = fx["gray"].shape
    o1 = Lb[(octave == 1) & valid]
    assert (o1[:, [0, 2]] < W).all() and (o1[:, [1, 3]] < H).all()
    assert o1[:, [0, 2]].max() > W / 2  # rescaling actually happened

    single, sv = lsd.detect_lines(
        jnp.asarray(fx["gray"]), min_length=15.0, max_lines=256, min_pixels=15)
    n_single = int(np.asarray(sv).sum())
    n_pyr_base = int(valid[octave == 0].sum())
    assert n_pyr_base == n_single  # octave 0 == single scale

    # coarse octave adds structures the fine scale fragments or misses:
    # every octave-1 line has NO close octave-0 twin OR merges >1 of them
    def seg_dist(a, b):
        return min(
            np.hypot(*(a[:2] - b[:2])) + np.hypot(*(a[2:] - b[2:])),
            np.hypot(*(a[:2] - b[2:])) + np.hypot(*(a[2:] - b[:2])),
        )
    L0 = Lb[(octave == 0) & valid]
    novel = sum(1 for e in o1 if min(seg_dist(e, l) for l in L0) > 20)
    assert novel >= 1, "coarse octave contributed nothing"


def test_describe_pyramid_cross_octave_match():
    """Multi-octave LBD: descriptors from the pyramid of one image match
    the pyramid of a shifted copy (cross-octave matching contract)."""
    from cube_slam_tpu.ops import lbd

    fx = io.load_detect3d_fixture()
    img = fx["gray"][:240, :320]
    d1 = lbd.describe_lines_pyramid(jnp.asarray(img), n_octaves=2,
                                    max_lines=64, min_pixels=15)
    img2 = np.roll(np.asarray(img), shift=(2, 3), axis=(0, 1))
    d2 = lbd.describe_lines_pyramid(jnp.asarray(img2), n_octaves=2,
                                    max_lines=64, min_pixels=15)
    m, dist = lbd.match_lines(d1["bdesc"], d1["valid"], d2["bdesc"], d2["valid"])
    m = np.asarray(m)
    v1 = np.asarray(d1["valid"])
    L1 = np.asarray(d1["lines"])
    L2 = np.asarray(d2["lines"])
    matched = np.where((m >= 0) & v1)[0]
    assert len(matched) >= 8
    # matched pairs must be geometrically consistent with the (3, 2) shift
    good = 0
    for i in matched:
        a, b = L1[i], L2[m[i]]
        mid_a = (a[:2] + a[2:]) / 2
        mid_b = (b[:2] + b[2:]) / 2
        if np.linalg.norm(mid_b - mid_a - np.array([3.0, 2.0])) < 12.0:
            good += 1
    assert good / len(matched) > 0.6
