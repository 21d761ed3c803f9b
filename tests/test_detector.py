import jax.numpy as jnp
import numpy as np
import pytest

from cube_slam_tpu.models import detector as det_mod
from cube_slam_tpu.utils import io


def numpy_fuse_normalize(dist_error, angle_error, weight_vp_angle=0.8):
    """Direct port of fuse_normalize_scores_v2 (object_3d_util.cpp:495-565)
    used as an oracle for the masked JAX version."""
    n = len(dist_error)
    if n > 4:
        bn = int(round(float(n) / 3.0 * 2.0))
        dist_sorted = np.argsort(dist_error, kind="stable")
        angle_sorted = np.argsort(angle_error, kind="stable")
        dist_keep = sorted(dist_sorted[: bn - 1])
        if angle_error[angle_sorted[bn - 1]] > angle_error[angle_sorted[bn - 2]]:
            angle_keep = sorted(angle_sorted[: bn - 1])
            keep = sorted(set(dist_keep) & set(angle_keep))
        else:
            keep = dist_keep
    else:
        keep = list(range(n))
    d = dist_error[keep]
    a = angle_error[keep]
    if len(keep) > 1:
        nd = (d - d.min()) / (d.max() - d.min())
        if a.max() - a.min() > 0:
            na = (a - a.min()) / (a.max() - a.min())
        else:
            na = a
        comb = (nd + weight_vp_angle * na) / (1 + weight_vp_angle)
    else:
        comb = (d + weight_vp_angle * a) / (1 + weight_vp_angle)
    return keep, comb


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuse_normalize_matches_cpp_oracle(seed):
    rng = np.random.default_rng(seed)
    n_valid = int(rng.integers(5, 40))
    pad = 64
    dist = rng.uniform(0, 10, size=pad).astype(np.float32)
    angle = rng.uniform(0, 2, size=pad).astype(np.float32)
    valid = np.zeros(pad, dtype=bool)
    valid[:n_valid] = True

    scores, keep = det_mod.fuse_normalize_scores(
        jnp.asarray(dist), jnp.asarray(angle), jnp.asarray(valid)
    )
    scores = np.asarray(scores)
    keep = np.asarray(keep)

    keep_ref, comb_ref = numpy_fuse_normalize(dist[:n_valid], angle[:n_valid])
    assert sorted(np.where(keep)[0].tolist()) == keep_ref
    np.testing.assert_allclose(scores[keep_ref], comb_ref, atol=1e-5)


def test_fuse_normalize_small_n():
    dist = jnp.asarray([1.0, 2.0, 3.0, 100.0], dtype=jnp.float32)
    angle = jnp.asarray([0.1, 0.2, 0.3, 100.0], dtype=jnp.float32)
    valid = jnp.asarray([True, True, True, False])
    scores, keep = det_mod.fuse_normalize_scores(dist, angle, valid)
    # n <= 4: everything valid kept
    assert np.asarray(keep).tolist() == [True, True, True, False]


def test_corner_chain_with_camera_derived_vps():
    """VPs derived from the fixture camera pose (getVanishingPoints,
    object_3d_util.cpp:602-607) must yield a valid corner chain for some
    (yaw, top-point, config) — exercising the chain math without images."""
    fx = io.load_detect3d_fixture()
    K = jnp.asarray(fx["K"], dtype=jnp.float32)
    R = jnp.asarray(fx["Twc"][:3, :3], dtype=jnp.float32)
    KinvR = K @ R.T
    from cube_slam_tpu.utils import geometry as geo

    _, _, cam_yaw = geo.rot_to_euler_zyx(R)
    bbox = fx["bbox"][0]
    left, top, w, h = bbox
    bx = {
        "left_x": jnp.float32(left),
        "top_y": jnp.float32(top),
        "right_x": jnp.float32(left + w),
        "down_y_expan": jnp.float32(top + h),
        "expan_lt": jnp.asarray([left - 10, top - 10], dtype=jnp.float32),
        "expan_rb": jnp.asarray([left + w + 10, top + h + 10], dtype=jnp.float32),
    }

    def vps_of(yaw):
        dirs = jnp.stack(
            [
                jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.float32(0)]),
                jnp.stack([-jnp.sin(yaw), jnp.cos(yaw), jnp.float32(0)]),
                jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32),
            ]
        )
        vs = dirs @ KinvR.T
        return vs[:, :2] / vs[:, 2:3]

    n_valid = 0
    for dyaw in np.linspace(-np.pi / 4, np.pi / 4, 8):
        yaw = cam_yaw - jnp.pi / 2 + jnp.float32(dyaw)
        vps = vps_of(yaw)
        for tx in np.linspace(left + 20, left + w - 20, 6):
            corner1 = jnp.asarray([tx, top], dtype=jnp.float32)
            for cfg in (1, 2):
                corners, valid, vp1_pos = det_mod.corner_chain(
                    vps[0], vps[1], vps[2], corner1, cfg, bx
                )
                if bool(valid):
                    n_valid += 1
                    c = np.asarray(corners)
                    assert np.isfinite(c).all()
                    assert int(vp1_pos) in (1, 2)
    assert n_valid > 5  # plenty of geometrically consistent samples exist


def test_detector_fixture_regression():
    """End-to-end on the bundled single-frame fixture
    (detect_3d_cuboid/src/main.cpp demo inputs). Values recorded from this
    implementation serve as regression anchors; plausibility constraints
    (cuboid inside bbox, on the ground, positive scale) guard correctness."""
    fx = io.load_detect3d_fixture()
    det = det_mod.CuboidDetector()
    det.set_calibration(fx["K"])
    res = det.detect_cuboid(fx["gray"], fx["Twc"], fx["bbox"], fx["edges"])
    assert len(res) == 1 and len(res[0]) >= 1
    p = res[0][0]
    assert (p.scale > 0).all()
    # bottom at z=0 ground: pos z equals half height
    np.testing.assert_allclose(p.pos[2], p.scale[2], atol=1e-4)
    # 2D corners near the detected bbox
    bx = fx["bbox"][0]
    assert p.box_corners_2d[0].min() >= bx[0] - 25
    assert p.box_corners_2d[0].max() <= bx[0] + bx[2] + 25
    # regression anchors (recorded 2026-08-16 from this implementation)
    np.testing.assert_allclose(p.pos, [-0.256, 1.755, 0.463], atol=0.03)
    np.testing.assert_allclose(p.scale, [0.239, 0.238, 0.463], atol=0.03)
    np.testing.assert_allclose(p.rotY, -2.251, atol=0.05)
