"""Sharded LM over the 8-device virtual CPU mesh must match the
single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.models import cuboid as cb
from cube_slam_tpu.parallel.mesh import make_mesh
from cube_slam_tpu.slam.object_slam import optimize_graph, optimize_graph_sharded
from cube_slam_tpu.utils import geometry as geo

from test_graph import _circular_sequence


def _graph_inputs(n=8, F=8):
    poses, meas, cube_world = _circular_sequence(n=n)
    tcw_true = np.stack([np.linalg.inv(p) for p in poses]).astype(np.float32)
    rng = np.random.default_rng(1)
    tcw_init = tcw_true.copy()
    for f in range(1, n):
        tcw_init[f] = (
            np.asarray(geo.se3_exp(jnp.asarray(0.05 * rng.normal(size=6), dtype=jnp.float32)))
            @ tcw_init[f]
        )
    meas_pose = np.stack([m[0] for m in meas])
    meas_scale = np.stack([m[1] for m in meas])
    quality = np.full(n, 0.8, dtype=np.float32)
    has = np.ones(n, dtype=bool)
    odom = np.stack(
        [np.eye(4, dtype=np.float32)]
        + [tcw_true[f] @ np.linalg.inv(tcw_true[f - 1]) for f in range(1, n)]
    )
    cube_init = cb.exp_update(
        cube_world, jnp.asarray(0.05 * rng.normal(size=9), dtype=jnp.float32)
    )
    return (
        jnp.asarray(tcw_init), cube_init.pose, cube_init.scale,
        jnp.asarray(meas_pose), jnp.asarray(meas_scale), jnp.asarray(quality),
        jnp.asarray(has), jnp.asarray(odom), jnp.asarray(n),
    )


def test_sharded_ba_matches_single_device():
    """Edge-sharded camera+point+object BA (the flagship multi-chip step
    run by __graft_entry__.dryrun_multichip) must match local_ba_objects."""
    from cube_slam_tpu.graph import object_ba
    from cube_slam_tpu.parallel.sharded_ba import sharded_local_ba
    from test_object_ba import _object_scene, K

    cube, pts, tcw, (okf, opt, ouv), boxes = _object_scene(seed=5)
    rng = np.random.default_rng(7)
    n_kf, n_pt = len(tcw), len(pts)

    tcw0 = tcw.copy()
    for i in range(2, n_kf):
        tcw0[i] = np.asarray(
            geo.se3_exp(jnp.asarray(0.02 * rng.normal(size=6), dtype=jnp.float32))
        ) @ tcw0[i]
    pts0 = pts + 0.02 * rng.normal(size=pts.shape).astype(np.float32)
    cube0 = cb.exp_update(cube, jnp.asarray(
        np.concatenate([0.05 * rng.normal(size=6), 0.05 * rng.normal(size=3)]),
        dtype=jnp.float32))

    def pad_to(x, mult, fill=0):
        n = x.shape[0]
        p = (-n) % mult
        if p == 0:
            return x
        pad_width = [(0, p)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width, constant_values=fill)

    E = len(okf)
    obs_kf = pad_to(np.asarray(okf, np.int32), 8)
    obs_pt = pad_to(np.asarray(opt, np.int32), 8)
    obs_uv = pad_to(np.asarray(ouv, np.float32), 8)
    obs_si = pad_to(np.ones(E, np.float32), 8)
    obs_valid = pad_to(np.ones(E, bool), 8)

    B = len(tcw)
    box_kf = pad_to(np.arange(B, dtype=np.int32), 8)
    box_obj = pad_to(np.zeros(B, np.int32), 8)
    box_meas = pad_to(np.asarray(boxes, np.float32), 8)
    box_si = pad_to(np.full(B, 0.1, np.float32), 8)
    box_valid = pad_to(np.ones(B, bool), 8)

    po_obj = np.zeros(n_pt, np.int32)
    po_pt = np.arange(n_pt, dtype=np.int32)
    po_si = np.full(n_pt, 2.0, np.float32)
    po_valid = np.ones(n_pt, bool)

    args = (
        jnp.asarray(tcw0), jnp.asarray(pts0), jnp.asarray(np.asarray(cube0.pose)[None]),
        jnp.asarray(np.asarray(cube0.scale)[None]), jnp.asarray(K),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.asarray(obs_si), jnp.asarray(obs_valid),
        jnp.asarray(box_kf), jnp.asarray(box_obj), jnp.asarray(box_meas),
        jnp.asarray(box_si), jnp.asarray(box_valid),
        jnp.asarray(po_obj), jnp.asarray(po_pt), jnp.asarray(po_si),
        jnp.asarray(po_valid),
        jnp.asarray([True, True, False, False]), jnp.ones(n_pt, dtype=bool),
        jnp.asarray([True]), jnp.asarray([False]),
    )
    single = object_ba.local_ba_objects(*args, num_iters=8)
    mesh = make_mesh(8)
    sharded = sharded_local_ba(mesh, *args, num_iters=8)

    np.testing.assert_allclose(float(single[4]), float(sharded[4]), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(single[0]), np.asarray(sharded[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(single[1]), np.asarray(sharded[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(single[2]), np.asarray(sharded[2]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(single[3]), np.asarray(sharded[3]), atol=1e-4)


def test_sharded_matches_single_device_and_converges():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    args = _graph_inputs(n=8, F=8)
    tcw1, cp1, cs1, chi1 = optimize_graph(*args, num_iters=10, max_frames=8)

    mesh = make_mesh(8)
    tcw2, cp2, cs2, chi2 = optimize_graph_sharded(mesh, *args, num_iters=10)

    np.testing.assert_allclose(float(chi1), float(chi2), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tcw1), np.asarray(tcw2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cp1), np.asarray(cp2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs1), np.asarray(cs2), atol=1e-4)
    assert float(chi2) < 1e-2  # converged on the exact-odometry problem


def test_sharded_detector_matches_single_device():
    """Data-parallel cuboid detection: the per-bbox batch sharded over the
    8-device mesh must produce the same top-k proposals as one device
    (embarrassingly parallel over objects — zero-communication GSPMD)."""
    import numpy as np

    from cube_slam_tpu.models.detector import CuboidDetector, detect_lattice_batch
    from cube_slam_tpu.parallel import mesh as mesh_mod
    from cube_slam_tpu.parallel.sharded_detector import detect_lattice_sharded
    from cube_slam_tpu.utils import io

    fx = io.load_detect3d_fixture()
    det = CuboidDetector()
    det.set_calibration(fx["K"])
    # 6 copies of the fixture bbox: NB=6 pads to 8 on the mesh (pad rows
    # must yield no proposals)
    bboxes = np.repeat(fx["bbox"], 6, axis=0)
    kernel_args, _ = det.prepare_batch(fx["gray"], fx["Twc"], bboxes, fx["edges"])

    _res, _idx, scores_1, valid_1, packed_1 = detect_lattice_batch(**kernel_args)

    m = mesh_mod.make_mesh(8, axis_name="obj")
    _res8, _idx8, scores_8, valid_8, packed_8 = detect_lattice_sharded(m, kernel_args)

    assert scores_8.shape == scores_1.shape
    np.testing.assert_array_equal(np.asarray(valid_8), np.asarray(valid_1))
    np.testing.assert_allclose(np.asarray(scores_8), np.asarray(scores_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(packed_8), np.asarray(packed_1),
                               rtol=1e-4, atol=1e-4)
