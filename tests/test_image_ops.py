import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from cube_slam_tpu.ops import distance_transform as dt
from cube_slam_tpu.ops import image as im_ops


def test_sobel_gradient_direction():
    img = jnp.asarray(np.tile(np.arange(32, dtype=np.float32) * 10, (16, 1)))
    dx, dy = im_ops.sobel(img)
    # horizontal ramp: dx = 8 * step (OpenCV 3x3 sobel weight sum), dy = 0
    np.testing.assert_allclose(np.asarray(dx)[4:-4, 4:-4], 80.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy)[4:-4, 4:-4], 0.0, atol=1e-4)


def test_canny_finds_step_edge():
    img = np.zeros((32, 64), dtype=np.float32)
    img[:, 32:] = 200.0
    edges = np.asarray(im_ops.canny(jnp.asarray(img), 80.0, 200.0))
    # edge localized near column 31/32, one pixel wide after NMS
    cols = np.where(edges.any(axis=0))[0]
    assert len(cols) >= 1
    assert set(cols) <= {30, 31, 32}
    assert edges.sum() >= 28  # nearly every row fires


def test_canny_hysteresis_connects_weak():
    # weak bridge between two strong ends is kept; isolated weak dropped
    img = np.zeros((16, 48), dtype=np.float32)
    strong = np.zeros((16, 48), dtype=bool)
    weak = np.zeros((16, 48), dtype=bool)
    strong[8, 10] = True
    weak[8, 10:20] = True  # chain touching strong
    weak[8, 30:35] = True  # isolated weak island
    out = np.asarray(im_ops.canny_hysteresis(jnp.asarray(strong), jnp.asarray(weak)))
    assert out[8, 10:20].all()
    assert not out[8, 30:35].any()


def test_edt_exact_vs_scipy():
    rng = np.random.default_rng(0)
    mask = rng.random((40, 56)) < 0.03
    mask[0, 0] = True  # ensure nonempty
    ours = np.asarray(dt.edt_l2(jnp.asarray(mask)))
    ref = ndi.distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_chamfer_close_to_exact():
    rng = np.random.default_rng(1)
    mask = rng.random((32, 32)) < 0.05
    mask[5, 5] = True
    cham = np.asarray(dt.chamfer_l2_3x3(jnp.asarray(mask)))
    exact = ndi.distance_transform_edt(~mask)
    # OpenCV 3x3 chamfer is within ~8% of exact L2
    err = np.abs(cham - exact) / np.maximum(exact, 1.0)
    assert err.max() < 0.12
    np.testing.assert_allclose(cham[mask], 0.0, atol=1e-6)


def test_extract_crop_clamps():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    crop, mask = im_ops.extract_crop(img, jnp.asarray(8), jnp.asarray(8), 4, 4)
    assert crop.shape == (4, 4)
    assert bool(mask.all())
    np.testing.assert_allclose(np.asarray(crop)[0, 0], 66.0)  # clamped to (6, 6)
