import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.ops import lbd, lsd
from cube_slam_tpu.utils import io


def test_lbd_matches_lines_across_shift():
    """Detect lines + LBD on the fixture image and a shifted copy; matched
    lines must correspond to the same physical segments."""
    fx = io.load_detect3d_fixture()
    gray = fx["gray"][:256, :384]
    shift = 4
    gray2 = np.roll(gray, (shift, shift), axis=(0, 1))

    l1, v1 = lsd.detect_lines(jnp.asarray(gray), min_length=20.0, max_lines=64)
    l2, v2 = lsd.detect_lines(jnp.asarray(gray2), min_length=20.0, max_lines=64)
    _, d1 = lbd.lbd_descriptors(jnp.asarray(gray), l1, v1)
    _, d2 = lbd.lbd_descriptors(jnp.asarray(gray2), l2, v2)
    m, dist = lbd.match_lines(d1, v1, d2, v2)
    m = np.asarray(m)
    L1 = np.asarray(l1)
    L2 = np.asarray(l2)
    matched = m >= 0
    assert matched.sum() >= 10, f"too few line matches: {matched.sum()}"
    # matched line midpoints should differ by ~the shift
    mid1 = (L1[matched, :2] + L1[matched, 2:]) / 2
    mid2 = (L2[m[matched], :2] + L2[m[matched], 2:]) / 2
    err = np.linalg.norm(mid2 - mid1 - shift, axis=1)
    assert np.median(err) < 5.0, f"median midpoint error {np.median(err)}"


def test_lbd_descriptor_shape_and_masking():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (64, 96)).astype(np.float32))
    lines = jnp.asarray([[10.0, 10.0, 50.0, 12.0], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.asarray([True, False])
    f, b = lbd.lbd_descriptors(img, lines, valid)
    assert f.shape == (2, 72) and b.shape == (2, 8)
    assert float(jnp.abs(f[1]).max()) == 0.0
    assert int(b[1].max()) == 0
    np.testing.assert_allclose(float(jnp.linalg.norm(f[0])), 1.0, atol=1e-5)
