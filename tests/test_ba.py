import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.graph import ba
from cube_slam_tpu.utils import geometry as geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def _scene(n_kf=4, n_pt=60, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, n_pt), rng.uniform(-1.5, 1.5, n_pt), rng.uniform(5, 10, n_pt)],
        axis=1,
    ).astype(np.float32)
    tcw = []
    for i in range(n_kf):
        xi = np.concatenate([0.05 * rng.normal(size=3), [0.4 * i, 0.02 * i, 0.0]])
        tcw.append(np.asarray(geo.se3_exp(jnp.asarray(xi, dtype=jnp.float32))))
    tcw = np.stack(tcw)
    obs_kf, obs_pt, obs_uv = [], [], []
    for i in range(n_kf):
        Xc = pts @ tcw[i][:3, :3].T + tcw[i][:3, 3]
        uv = Xc @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        for j in range(n_pt):
            if 0 <= uv[j, 0] < 640 and 0 <= uv[j, 1] < 480 and Xc[j, 2] > 0:
                obs_kf.append(i)
                obs_pt.append(j)
                obs_uv.append(uv[j])
    return tcw, pts, np.asarray(obs_kf), np.asarray(obs_pt), np.stack(obs_uv)


def test_pose_optimization_recovers_pose():
    tcw, pts, okf, opt, ouv = _scene(n_kf=1)
    sel = okf == 0
    uv = ouv[sel].astype(np.float32)
    pw = pts[opt[sel]]
    rng = np.random.default_rng(1)
    T0 = np.asarray(
        geo.se3_exp(jnp.asarray(0.1 * rng.normal(size=6), dtype=jnp.float32))
    ) @ tcw[0]
    # add some gross outliers
    uv_noisy = uv.copy()
    uv_noisy[:5] += 80.0
    T, inlier, n_in = ba.pose_optimization(
        jnp.asarray(T0), jnp.asarray(K), jnp.asarray(pw), jnp.asarray(uv_noisy),
        jnp.ones(len(uv), dtype=jnp.float32), jnp.ones(len(uv), dtype=bool),
    )
    err = np.asarray(geo.se3_log(jnp.asarray(np.linalg.inv(tcw[0])) @ T))
    assert np.linalg.norm(err) < 5e-3, f"pose error {np.linalg.norm(err)}"
    inlier = np.asarray(inlier)
    assert not inlier[:5].any()  # outliers rejected
    assert inlier[5:].mean() > 0.95


def test_local_ba_converges_from_noisy_init():
    tcw_true, pts_true, okf, opt, ouv = _scene()
    rng = np.random.default_rng(2)
    n_kf, n_pt = len(tcw_true), len(pts_true)
    tcw0 = tcw_true.copy()
    for i in range(2, n_kf):  # KF 0 and 1 stay true (they are the fixed gauge)
        xi = 0.03 * rng.normal(size=6).astype(np.float32)
        tcw0[i] = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ tcw0[i]
    pts0 = pts_true + 0.08 * rng.normal(size=pts_true.shape).astype(np.float32)

    E = len(okf)
    out_tcw, out_pts, cost, inl = ba.local_ba_points(
        jnp.asarray(tcw0), jnp.asarray(pts0), jnp.asarray(K),
        jnp.asarray(okf, dtype=jnp.int32), jnp.asarray(opt, dtype=jnp.int32),
        jnp.asarray(ouv, dtype=jnp.float32), jnp.ones(E, dtype=jnp.float32),
        jnp.ones(E, dtype=bool),
        # two fixed KFs anchor the mono gauge INCLUDING scale
        jnp.asarray([True, True] + [False] * (n_kf - 2)),
        jnp.ones(n_pt, dtype=bool),
        num_iters=15,
    )
    out_tcw = np.asarray(out_tcw)
    pose_errs = [
        np.linalg.norm(np.asarray(geo.se3_log(jnp.asarray(np.linalg.inv(tcw_true[i]) @ out_tcw[i]))))
        for i in range(n_kf)
    ]
    assert max(pose_errs) < 0.02, f"pose errors {pose_errs}"
    pt_err = np.linalg.norm(np.asarray(out_pts) - pts_true, axis=1)
    assert np.median(pt_err) < 0.02, f"median point error {np.median(pt_err)}"
    assert float(cost) < 1.0


def test_local_ba_masks_padding():
    """Padded (invalid) points/edges/KFs must not corrupt the solution."""
    tcw_true, pts_true, okf, opt, ouv = _scene(n_kf=3, n_pt=40)
    n_kf, n_pt = 4, 64  # pad
    E_pad = len(okf) + 32
    tcw0 = np.concatenate([tcw_true, np.eye(4, dtype=np.float32)[None]])
    pts0 = np.concatenate([pts_true, np.zeros((n_pt - 40, 3), dtype=np.float32)])
    okf_p = np.concatenate([okf, np.zeros(32, dtype=np.int64)])
    opt_p = np.concatenate([opt, np.full(32, 50, dtype=np.int64)])
    ouv_p = np.concatenate([ouv, np.zeros((32, 2))])
    valid = np.concatenate([np.ones(len(okf), bool), np.zeros(32, bool)])

    out_tcw, out_pts, cost, inl = ba.local_ba_points(
        jnp.asarray(tcw0), jnp.asarray(pts0.astype(np.float32)), jnp.asarray(K),
        jnp.asarray(okf_p, dtype=jnp.int32), jnp.asarray(opt_p, dtype=jnp.int32),
        jnp.asarray(ouv_p, dtype=jnp.float32), jnp.ones(E_pad, dtype=jnp.float32),
        jnp.asarray(valid),
        jnp.asarray([True, False, False, False]),
        jnp.asarray([True] * 40 + [False] * (n_pt - 40)),
        num_iters=8,
    )
    assert np.isfinite(np.asarray(out_tcw)).all()
    assert np.isfinite(np.asarray(out_pts)).all()
    # true observations still explain the solution
    assert float(cost) < 1.0


def test_schur_sparse_pairs_match_dense():
    """The edge-pair (sparse) reduced-camera assembly must produce the
    same solution as the dense (Kf, P) W-grid path — same math, different
    memory/compute shape (ba.py make_schur_pairs)."""
    import jax.numpy as jnp

    from cube_slam_tpu.graph import ba

    rng = np.random.default_rng(7)
    n_kf, n_pt, n_edge = 5, 60, 240
    Kc = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    pts = rng.uniform(-2, 2, size=(n_pt, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    kf_tcw = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    for i in range(n_kf):
        kf_tcw[i, :3, 3] = [0.15 * i, 0.02 * i, 0.0]
    obs_kf = rng.integers(0, n_kf, size=n_edge).astype(np.int32)
    obs_pt = rng.integers(0, n_pt, size=n_edge).astype(np.int32)
    pc = np.einsum("eij,ej->ei", kf_tcw[obs_kf, :3, :3], pts[obs_pt]) \
        + kf_tcw[obs_kf, :3, 3]
    uv = pc @ Kc.T
    obs_uv = (uv[:, :2] / uv[:, 2:3]
              + rng.normal(0, 0.4, size=(n_edge, 2))).astype(np.float32)
    si = np.ones(n_edge, np.float32)
    valid = np.ones(n_edge, bool)
    valid[::17] = False
    kf_fixed = np.zeros(n_kf, bool)
    # fix TWO cameras: with one, the monocular scale gauge is free and the
    # two assembly paths can drift to different equal-cost similarity
    # representatives once f32 noise flips an LM accept decision
    kf_fixed[:2] = True
    pt_valid = np.ones(n_pt, bool)
    pts_noisy = pts + rng.normal(0, 0.05, size=pts.shape).astype(np.float32)

    args = (jnp.asarray(kf_tcw), jnp.asarray(pts_noisy), jnp.asarray(Kc),
            jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
            jnp.asarray(si), jnp.asarray(valid), jnp.asarray(kf_fixed),
            jnp.asarray(pt_valid))
    e1, e2 = ba.make_schur_pairs(obs_pt, valid)

    # one LM step is BIT-IDENTICAL (same normal equations, same solve)
    tcw_d1, pts_d1, _, _ = ba.local_ba_points(*args, num_iters=1)
    tcw_s1, pts_s1, _, _ = ba.local_ba_points(
        *args, pair_e1=jnp.asarray(e1), pair_e2=jnp.asarray(e2), num_iters=1)
    np.testing.assert_array_equal(np.array(tcw_s1), np.array(tcw_d1))
    np.testing.assert_array_equal(np.array(pts_s1), np.array(pts_d1))

    # over several iterations f32 summation-order noise can flip an LM
    # accept decision — the solutions stay equivalent in COST
    tcw_d, pts_d, cost_d, inl_d = ba.local_ba_points(*args, num_iters=6)
    tcw_s, pts_s, cost_s, inl_s = ba.local_ba_points(
        *args, pair_e1=jnp.asarray(e1), pair_e2=jnp.asarray(e2),
        num_iters=6)
    np.testing.assert_allclose(float(cost_s), float(cost_d), rtol=1e-2)
    np.testing.assert_allclose(np.array(tcw_s), np.array(tcw_d), atol=2e-2)
    assert (np.array(inl_s) == np.array(inl_d)).mean() > 0.98
