import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.slam import loop_closing as lc
from cube_slam_tpu.slam import pnp, sim3
from cube_slam_tpu.utils import geometry as geo
from cube_slam_tpu.utils import np_geometry as np_geo

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def test_horn_sim3_exact():
    rng = np.random.default_rng(0)
    p1 = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray([0.2, -0.4, 0.6], dtype=jnp.float32)))
    s, t = 1.7, np.array([0.5, -1.0, 2.0], dtype=np.float32)
    p2 = s * p1 @ R.T + t
    s_e, R_e, t_e = sim3.horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
    np.testing.assert_allclose(float(s_e), s, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)


def test_sim3_ransac_with_outliers():
    rng = np.random.default_rng(1)
    p1 = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray([0.1, 0.3, -0.2], dtype=jnp.float32)))
    s, t = 0.8, np.array([1.0, 0.2, -0.5], dtype=np.float32)
    p2 = s * p1 @ R.T + t
    p2[:15] += rng.uniform(1, 3, (15, 3))  # gross outliers
    samples = np.stack([rng.choice(60, 3, replace=False) for _ in range(128)]).astype(np.int32)
    s_e, R_e, t_e, inlier, n_in = sim3.sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(60, dtype=bool),
        jnp.asarray(samples), jnp.float32(0.1),
    )
    assert int(n_in) >= 40
    inl = np.asarray(inlier)
    assert not inl[:15].any()
    np.testing.assert_allclose(float(s_e), s, rtol=1e-3)


def test_pnp_ransac():
    rng = np.random.default_rng(2)
    X = np.stack([rng.uniform(-2, 2, 80), rng.uniform(-1.5, 1.5, 80),
                  rng.uniform(4, 9, 80)], axis=1).astype(np.float32)
    Tcw = np.asarray(geo.se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.3, 0.1, -0.4],
                                             dtype=jnp.float32)))
    Xc = X @ np.asarray(Tcw)[:3, :3].T + np.asarray(Tcw)[:3, 3]
    uv = Xc @ K.T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    uv_noisy = uv.copy()
    uv_noisy[:10] += 60.0  # outliers
    samples = pnp.make_pnp_samples(np.ones(80, bool), n_ransac=128, seed=3)
    T_e, inlier, n_in = pnp.pnp_ransac(
        jnp.asarray(X), jnp.asarray(uv_noisy), jnp.ones(80, dtype=bool),
        jnp.asarray(K), jnp.asarray(samples),
    )
    err = np.linalg.norm(np.asarray(geo.se3_log(jnp.asarray(np.linalg.inv(np.asarray(Tcw))) @ T_e)))
    assert err < 1e-2, f"pose error {err}"
    assert int(n_in) >= 65
    assert not np.asarray(inlier)[:10].any()


def test_signature_similarity_discriminates():
    rng = np.random.default_rng(3)
    desc_a = rng.integers(0, 2**32, (100, 8), dtype=np.uint32)
    valid = np.ones(100, dtype=bool)
    # same place: small perturbation of descriptors; different: fresh random
    desc_a2 = desc_a.copy()
    flip = rng.integers(0, 2**32, (100, 8), dtype=np.uint32) & rng.integers(0, 2, (100, 8)).astype(np.uint32)
    desc_a2 = desc_a2 ^ flip
    desc_b = rng.integers(0, 2**32, (100, 8), dtype=np.uint32)
    sig_a = lc.keyframe_signature(desc_a, valid)
    sig_a2 = lc.keyframe_signature(desc_a2, valid)
    sig_b = lc.keyframe_signature(desc_b, valid)
    sim_same = lc.signature_similarity(sig_a, sig_a2[None])[0]
    sim_diff = lc.signature_similarity(sig_a, sig_b[None])[0]
    assert sim_same > sim_diff


def test_sim3_pose_graph_closes_loop():
    """Drifted circular trajectory + one strong loop edge: the pose graph
    must pull the last keyframe back onto the first."""
    n = 12
    step = np.asarray(geo.se3_exp(jnp.asarray(
        [0.0, 0.0, 2 * np.pi / n, 0.5, 0.0, 0.0], dtype=jnp.float32)))
    # true poses: closed loop
    T = np.eye(4, dtype=np.float32)
    true_tcw = []
    for i in range(n):
        true_tcw.append(T.copy())
        T = np.asarray(step) @ T
    # drifted: add small bias each step so the loop does not close
    drift = np.asarray(geo.se3_exp(jnp.asarray(
        [0.0, 0.0, 0.015, 0.02, 0.0, 0.0], dtype=jnp.float32)))
    T = np.eye(4, dtype=np.float32)
    est_tcw = []
    for i in range(n):
        est_tcw.append(T.copy())
        T = (np.asarray(drift) @ np.asarray(step)) @ T

    K_ = n
    s = np.ones(K_, dtype=np.float32)
    R = np.stack([t[:3, :3] for t in est_tcw])
    t_arr = np.stack([t[:3, 3] for t in est_tcw])

    ei, ej, es, eR, et, ew = [], [], [], [], [], []
    for i in range(n - 1):
        # relative measurement from the DRIFTED estimates (odometry edges)
        rel = est_tcw[i] @ np.linalg.inv(est_tcw[i + 1])
        ei.append(i); ej.append(i + 1)
        es.append(1.0); eR.append(rel[:3, :3]); et.append(rel[:3, 3]); ew.append(1.0)
    # loop edge: true relative pose between KF 0 and KF n-1
    rel_true = true_tcw[0] @ np.linalg.inv(true_tcw[n - 1])
    ei.append(0); ej.append(n - 1)
    es.append(1.0); eR.append(rel_true[:3, :3]); et.append(rel_true[:3, 3]); ew.append(10.0)

    fixed = np.zeros(K_, dtype=bool)
    fixed[0] = True
    out = lc.optimize_sim3_pose_graph(
        jnp.asarray(s), jnp.asarray(R), jnp.asarray(t_arr),
        jnp.asarray(np.asarray(ei, dtype=np.int32)),
        jnp.asarray(np.asarray(ej, dtype=np.int32)),
        jnp.asarray(np.asarray(es, dtype=np.float32)),
        jnp.asarray(np.stack(eR).astype(np.float32)),
        jnp.asarray(np.stack(et).astype(np.float32)),
        jnp.ones(n, dtype=bool), jnp.asarray(np.asarray(ew, dtype=np.float32)),
        jnp.asarray(fixed), jnp.ones(K_, dtype=bool),
        num_iters=30, n_kf=K_,
    )
    s2, R2, t2 = (np.asarray(x) for x in out)
    # the last keyframe's pose must now respect the loop measurement
    last = np.eye(4)
    last[:3, :3] = R2[n - 1]
    last[:3, 3] = t2[n - 1] / s2[n - 1]
    gap = rel_true @ last @ np.linalg.inv(est_tcw[0])
    gap_err = np.linalg.norm(np.asarray(geo.se3_log(jnp.asarray(gap.astype(np.float32)))))
    # before optimization the drifted gap is large
    gap0 = rel_true @ est_tcw[n - 1] @ np.linalg.inv(est_tcw[0])
    gap0_err = np.linalg.norm(np.asarray(geo.se3_log(jnp.asarray(gap0.astype(np.float32)))))
    assert gap_err < 0.25 * gap0_err, f"loop not closed: {gap_err} vs {gap0_err}"


def test_optimize_sim3_relative():
    """OptimizeSim3 analog: refine a perturbed relative Sim3 using two-way
    reprojections of matched points."""
    rng = np.random.default_rng(5)
    n = 60
    pts1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                     rng.uniform(3, 8, n)], axis=1).astype(np.float32)
    s_true = 1.3
    R_true = np.asarray(geo.so3_exp(jnp.asarray([0.05, -0.2, 0.1], dtype=jnp.float32)))
    t_true = np.array([0.4, -0.1, 0.6], dtype=np.float32)
    pts2 = (s_true * pts1 @ R_true.T + t_true).astype(np.float32)

    def project(pc):
        uv = pc @ K.T
        return uv[:, :2] / uv[:, 2:3]

    uv1 = project(pts1).astype(np.float32)
    uv2 = project(pts2).astype(np.float32)

    s0 = jnp.asarray(1.0)
    R0 = jnp.asarray(R_true @ np.asarray(
        geo.so3_exp(jnp.asarray([0.03, 0.02, -0.04], dtype=jnp.float32))))
    t0 = jnp.asarray(t_true + np.array([0.1, -0.05, 0.08], dtype=np.float32))
    s, R, t, inlier, n_in = sim3.optimize_sim3_relative(
        s0, R0, t0, jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(K),
        jnp.ones(n, dtype=bool), num_iters=15,
    )
    assert int(n_in) > 0.9 * n
    np.testing.assert_allclose(float(s), s_true, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-3)


def test_relocalization_covisibility_accumulated_scoring():
    """KeyFrameDatabase.cc:196-260 parity: on a map with REPEATED structure
    a single aliased keyframe can out-score the true place, but its
    covisibility group cannot — accumulated scoring must pick the member
    of the strongest group, where single-signature ranking fails."""
    from cube_slam_tpu.slam.loop_closing import (LoopDetector,
                                                 keyframe_signature,
                                                 signature_similarity)

    rng = np.random.default_rng(3)
    n_kp = 64

    def descs(base=None, flip_frac=0.0):
        if base is None:
            return rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
        n_flip = 3 if flip_frac == 0 else 1  # AND of n random words ~ flip%
        f = rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
        for _ in range(n_flip - 1):
            f &= rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
        return base ^ f

    valid = np.ones(n_kp, dtype=bool)
    # the TRUE place: two covisible keyframes 0 and 1, both moderately
    # similar to the query (~12% bits flipped)
    place = descs()
    d0 = descs(place)
    d1 = descs(place)
    # the ALIAS: keyframe 5, repeated structure closer to the query in raw
    # similarity (~6% flipped) but with NO covisible support
    query_desc = descs(place)
    alias = query_desc ^ (rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
                         & rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
                         & rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)
                         & rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32))

    det = LoopDetector()
    det.add(0, d0, valid)
    det.add(1, d1, valid)
    det.add(5, alias, valid)
    sig = keyframe_signature(query_desc, valid)

    db = np.stack([det.signatures[i] for i in (0, 1, 5)])
    sims = signature_similarity(sig, db)
    assert sims[2] > sims[0] and sims[2] > sims[1], sims  # alias wins singly

    # single-signature ranking: the alias comes first (the failure mode)
    single = det.detect_relocalization(sig)
    assert single[0] == 5, single

    # accumulated over covisibility groups: the true place's group wins
    covis = {0: [1], 1: [0], 5: []}
    grouped = det.detect_relocalization(sig, covis_groups=lambda k: covis[k])
    assert grouped[0] in (0, 1), grouped
