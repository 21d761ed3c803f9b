import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.ops import matching, orb
from cube_slam_tpu.utils import io


def _squares(h=96, w=128, sq=8, pitch=24):
    """Isolated bright squares: their corners are L-junctions, which FAST-9
    fires on (unlike checkerboard X-corners, which it famously rejects)."""
    img = np.full((h, w), 20.0, dtype=np.float32)
    for y0 in range(8, h - sq - 8, pitch):
        for x0 in range(8, w - sq - 8, pitch):
            img[y0 : y0 + sq, x0 : x0 + sq] = 200.0
    return img


def test_fast_finds_square_corners():
    img = _squares()
    hit, score = orb.fast_score(jnp.asarray(img), 20.0)
    hit = np.asarray(hit)
    assert hit.sum() > 10
    assert not hit[4, 4]  # flat background
    ys, xs = np.where(hit)
    # all hits near square corners (grid pitch 24, square size 8)
    ry = np.minimum((ys - 8) % 24, 24 - (ys - 8) % 24)
    rx = np.minimum((xs - 8) % 24, 24 - (xs - 8) % 24)
    assert ((ry <= 9) & (rx <= 9)).all()


def test_detect_level_spatial_distribution():
    img = _squares(128, 128)
    xy, score, valid = orb.detect_level(jnp.asarray(img), max_kp=64, border=8)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 20
    # spread: keypoints span most of the interior
    assert xy[:, 0].max() - xy[:, 0].min() > 60
    assert xy[:, 1].max() - xy[:, 1].min() > 60


def test_orientation_rotation_equivariance():
    """Rotating a patch rotates its intensity-centroid angle accordingly."""
    img = np.zeros((64, 64), dtype=np.float32)
    img[28:37, 33:48] = 200.0  # bright bar centered at y=32, +x side of (32, 32)
    a0 = float(orb.ic_angle(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]), jnp.asarray([True]))[0])
    img_rot = np.zeros((64, 64), dtype=np.float32)
    img_rot[33:48, 28:37] = 200.0  # same bar rotated 90 deg (+y side)
    a1 = float(orb.ic_angle(jnp.asarray(img_rot), jnp.asarray([[32.0, 32.0]]), jnp.asarray([True]))[0])
    assert abs(a0) < 0.05
    assert abs(a1 - np.pi / 2) < 0.05


def test_orb_end_to_end_matches_shifted_image():
    """Extract ORB on the fixture image and a 3px-shifted copy; matching
    with rotation consistency must link mostly-correct correspondences."""
    fx = io.load_detect3d_fixture()
    gray = fx["gray"][:256, :320]
    cfg = orb.OrbPyramidConfig(n_features=300, n_levels=4)
    f0 = orb.extract_orb(gray, cfg)
    shifted = np.roll(np.asarray(gray), (3, 3), axis=(0, 1))
    f1 = orb.extract_orb(shifted, cfg)

    d = matching.hamming_matrix(f0["desc"], f1["desc"], f0["valid"], f1["valid"])
    idx, dist = matching.match_mutual_ratio(d, max_dist=60, ratio=0.9)
    idx = matching.rotation_consistency(f0["angle"], f1["angle"], idx)
    idx = np.asarray(idx)
    xy0 = np.asarray(f0["xy"])
    xy1 = np.asarray(f1["xy"])
    matched = idx >= 0
    assert matched.sum() >= 30, f"too few matches: {matched.sum()}"
    d_xy = xy1[idx[matched]] - xy0[matched]
    err = np.abs(d_xy - np.array([3.0, 3.0]))
    inlier = (err < 2.0).all(axis=1)
    assert inlier.mean() > 0.7, f"inlier rate {inlier.mean():.2f}"


def test_hamming_matrix_basic():
    a = jnp.asarray([[0, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
    b = jnp.asarray(
        [[0] * 8, [1] * 8, [0xFFFFFFFF] * 8], dtype=jnp.uint32
    )
    d = np.asarray(matching.hamming_matrix(a, b))
    np.testing.assert_array_equal(d[0], [0, 8, 256])
