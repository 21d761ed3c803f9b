import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.ops import klt
from cube_slam_tpu.utils import io


def test_pyr_lk_tracks_shift():
    fx = io.load_detect3d_fixture()
    img0 = fx["gray"][100:300, 100:400]
    shift = (6.0, 4.0)  # (dx, dy)
    img1 = np.roll(np.roll(img0, int(shift[1]), axis=0), int(shift[0]), axis=1)
    xy, valid = klt.harris_corners(jnp.asarray(img0), max_corners=64)
    xy = np.asarray(xy)[np.asarray(valid)]
    # keep interior corners so the rolled border doesn't pollute
    keep = (xy[:, 0] > 30) & (xy[:, 0] < 260) & (xy[:, 1] > 30) & (xy[:, 1] < 170)
    xy = xy[keep][:32]
    pts1, status = klt.pyr_lk(img0, img1, jnp.asarray(xy, dtype=jnp.float32),
                              jnp.ones(len(xy), dtype=bool))
    pts1 = np.asarray(pts1)
    status = np.asarray(status)
    assert status.sum() >= 0.6 * len(xy)
    flow = pts1[status] - xy[status]
    err = np.abs(flow - np.array(shift))
    assert np.median(err[:, 0]) < 0.5 and np.median(err[:, 1]) < 0.5, flow[:5]


def test_harris_on_squares():
    img = np.full((96, 96), 20.0, dtype=np.float32)
    img[30:50, 30:50] = 200.0
    xy, valid = klt.harris_corners(jnp.asarray(img), max_corners=16, min_dist=5)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 4
    # the four square corners are found
    corners = np.array([[30, 30], [30, 49], [49, 30], [49, 49]], dtype=np.float32)
    for c in corners:
        d = np.linalg.norm(xy - c, axis=1).min()
        assert d < 4.0, (c, xy)
