import jax.numpy as jnp
import numpy as np

from cube_slam_tpu.slam import initializer as ini
from cube_slam_tpu.utils import geometry as geo


K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def _project(X, R, t):
    Xc = X @ R.T + t
    uv = Xc @ K.T
    return uv[:, :2] / uv[:, 2:3], Xc[:, 2]


def _make_two_view(planar=False, n=120, seed=3):
    rng = np.random.default_rng(seed)
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 6.0)], axis=1
        )
    else:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)], axis=1
        )
    R = np.asarray(geo.so3_exp(jnp.asarray([0.02, -0.15, 0.03], dtype=jnp.float32)))
    t = np.array([0.6, 0.05, 0.1], dtype=np.float32)
    p1, z1 = _project(X, np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
    p2, z2 = _project(X, R, t)
    return X, R, t, p1.astype(np.float32), p2.astype(np.float32)


def _run(planar):
    X, R, t, p1, p2 = _make_two_view(planar)
    n = len(p1)
    valid = np.ones(n, dtype=bool)
    samples = ini.make_sample_indices(valid, n_ransac=200, seed=1)
    out = ini.initialize_two_view(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid), jnp.asarray(K),
        jnp.asarray(samples),
    )
    assert bool(out["success"]), f"init failed (planar={planar}), n_good={out['n_good']}"
    Tcw2 = np.asarray(out["Tcw2"])
    R_est, t_est = Tcw2[:3, :3], Tcw2[:3, 3]
    # rotation must match
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_est @ R.T) - 1) / 2, -1, 1))
    )
    assert ang < 1.0, f"rotation error {ang:.2f} deg"
    # translation up to scale
    cos = abs(t_est @ t) / (np.linalg.norm(t_est) * np.linalg.norm(t))
    assert cos > 0.995, f"translation direction cos {cos:.4f}"
    # triangulated structure matches up to the global scale
    good = np.asarray(out["point_good"])
    assert good.sum() > 0.8 * n
    Xe = np.asarray(out["points3d"])[good]
    scale = np.median(Xe[:, 2] / X[good][:, 2])
    err = np.linalg.norm(Xe / scale - X[good], axis=1)
    assert np.median(err) < 0.05
    return bool(out["used_H"])


def test_general_scene_uses_F():
    used_H = _run(planar=False)
    assert not used_H


def test_planar_scene_uses_H():
    used_H = _run(planar=True)
    assert used_H


def test_triangulate_exact():
    X = np.array([[0.5, -0.3, 5.0], [1.0, 0.8, 7.0]], dtype=np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray([0.0, -0.1, 0.0], dtype=jnp.float32)))
    t = np.array([0.5, 0.0, 0.0], dtype=np.float32)
    p1, _ = _project(X, np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
    p2, _ = _project(X, R, t)
    P1 = jnp.asarray(K @ np.hstack([np.eye(3), np.zeros((3, 1))]), dtype=jnp.float32)
    P2 = jnp.asarray(K @ np.hstack([R, t[:, None]]), dtype=jnp.float32)
    Xe = np.asarray(ini.triangulate(P1, P2, jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(Xe, X, atol=1e-2)
