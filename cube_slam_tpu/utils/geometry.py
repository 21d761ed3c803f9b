"""Batched Lie-group / rotation utilities (SO3, SE3, quaternions, Euler).

TPU-native parity layer for the reference's L0 math utilities
(reference: detect_3d_cuboid/src/matrix_utils.cpp:17-92 for euler/quat
conversions, Thirdparty/g2o/g2o/types/se3quat.h for SE3 exp/log).

Conventions
-----------
* Rotations are 3x3 matrices; quaternions are [w, x, y, z].
* Euler angles follow the reference's zyx convention:
  R = Rz(yaw) @ Ry(pitch) @ Rx(roll)   (matrix_utils.cpp:75-89).
* SE3 tangent vectors are [omega(3), upsilon(3)] — rotation first, matching
  g2o::SE3Quat::exp ordering so that factor residuals are comparable.
* All functions broadcast over arbitrary leading batch dimensions.
* Default dtype float32; numerically sensitive branches use Taylor-series
  fallbacks near singular angles so f32 stays stable under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so3 hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_coeffs_exp(theta2, dtype):
    """(a, b, c) = sin t / t, (1-cos t)/t^2, (1 - a)/t^2 with series
    fallbacks. JVP-safe: the unselected branch is evaluated at a benign
    point (theta2 -> 1) so no NaN/inf leaks through jnp.where gradients."""
    # threshold 1e-6 (theta < 1e-3): below this, f32 evaluation of
    # (1 - cos t)/t^2 catastrophically cancels to 0 — the series branch is
    # exact to ~1e-13 there
    small = theta2 < 1e-6
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)  # safe denominator
    ts = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ts)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - jnp.sin(ts) / ts) / t2s)
    return a, b, c


def so3_exp(w):
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation.
    JVP-safe at w=0 (series branches with safe denominators)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _safe_coeffs_exp(theta2, w.dtype)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R):
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Via quaternion: w = 2 atan2(|qv|, qw) qv/|qv|, with a series fallback for
    small |qv|. Smooth (JVP-safe) at theta=0 — unlike the arccos(trace)
    formulation whose gradient blows up at the identity — and correct up to
    theta=pi (sign from the quaternion extraction)."""
    q = rot_to_quat(R)
    qw = q[..., 0]
    qv = q[..., 1:]
    n2 = jnp.sum(qv * qv, axis=-1)
    small = n2 < 1e-12
    n2s = jnp.where(small, jnp.ones_like(n2), n2)
    n = jnp.sqrt(n2s)
    # angle/|qv| factor: 2 atan2(|qv|, qw)/|qv|; series 2/qw (1 - n2/(3 qw^2))
    qw_safe = jnp.where(jnp.abs(qw) < _EPS, _EPS, qw)
    factor = jnp.where(
        small,
        2.0 / qw_safe - 2.0 * n2 / (3.0 * qw_safe**3),
        2.0 * jnp.arctan2(n, qw) / n,
    )
    return factor[..., None] * qv


def se3_exp(xi):
    """se3 tangent [omega, upsilon] (..., 6) -> (..., 4, 4) transform.

    Matches g2o::SE3Quat::exp ordering (rotation part first). JVP-safe at 0.
    """
    w = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _safe_coeffs_exp(theta2, xi.dtype)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * WW
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = (V @ v[..., None])[..., 0]
    return make_T(R, t)


def se3_log(T):
    """(..., 4, 4) transform -> se3 tangent [omega, upsilon] (..., 6).
    JVP-safe at the identity."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-6  # see _safe_coeffs_exp: f32 1-cos cancellation
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    ts = jnp.sqrt(t2s)
    a = jnp.sin(ts) / ts
    b = (1.0 - jnp.cos(ts)) / t2s
    # V^{-1} = I - W/2 + coef W^2, coef = (1 - a/(2b))/t^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - a / (2.0 * b)) / t2s)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * WW
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def make_T(R, t):
    """Assemble (..., 4, 4) homogeneous transform from (...,3,3) R, (...,3) t."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inv_T(T):
    """Inverse of (..., 4, 4) rigid transform (exploits R^T structure)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


# ---------------------------------------------------------------------------
# Quaternions ([w, x, y, z])
# ---------------------------------------------------------------------------

def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_to_rot(q):
    """Unit quaternion [w,x,y,z] (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion [w,x,y,z] (..., 4).

    Branch-free Shepperd-style method (selects the numerically best of the
    four candidate forms via where-masks, jit/vmap friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.clip(x, _EPS, None))

    # four candidates
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Euler zyx (reference convention, matrix_utils.cpp:17-92)
# ---------------------------------------------------------------------------

def euler_zyx_to_quat(roll, pitch, yaw):
    """zyx euler -> quaternion [w,x,y,z] (matrix_utils.cpp:17-31)."""
    sy, cy = jnp.sin(yaw * 0.5), jnp.cos(yaw * 0.5)
    sp, cp = jnp.sin(pitch * 0.5), jnp.cos(pitch * 0.5)
    sr, cr = jnp.sin(roll * 0.5), jnp.cos(roll * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler_zyx(q):
    """Quaternion [w,x,y,z] -> (roll, pitch, yaw) (matrix_utils.cpp:35-46)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx * qx + qy * qy))
    pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    return roll, pitch, yaw


def euler_zyx_to_rot(roll, pitch, yaw):
    """zyx euler -> rotation matrix: Rz(yaw)Ry(pitch)Rx(roll)
    (matrix_utils.cpp:74-89)."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy], axis=-1),
            jnp.stack([cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy], axis=-1),
            jnp.stack([-sp, sr * cp, cr * cp], axis=-1),
        ],
        axis=-2,
    )


def rot_to_euler_zyx(R):
    """Rotation matrix -> (roll, pitch, yaw) (matrix_utils.cpp:50-70)."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def rotz(yaw):
    """Yaw-only rotation about z: (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zeros], axis=-1),
            jnp.stack([s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Homogeneous coordinates (matrix_utils.cpp:93-196)
# ---------------------------------------------------------------------------

def to_homo(pts):
    """(..., N, D) -> (..., N, D+1) append ones (row-of-points layout)."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def from_homo(pts):
    """(..., N, D+1) -> (..., N, D) divide by last coordinate."""
    w = pts[..., -1:]
    w = jnp.where(jnp.abs(w) < _EPS, jnp.where(w < 0, -_EPS, _EPS), w)
    return pts[..., :-1] / w


def normalize_to_pi(angle):
    """Wrap angle to (-pi/2, pi/2] by multiples of pi
    (matrix_utils.cpp:326-339: used for undirected line angles)."""
    two = jnp.pi
    a = jnp.mod(angle + jnp.pi / 2, two)
    a = jnp.where(a <= 0, a + two, a)
    return a - jnp.pi / 2


def angle_diff_undirected(a, b):
    """min(|a-b|, pi-|a-b|): difference between undirected line angles."""
    d = jnp.abs(a - b)
    return jnp.minimum(d, jnp.pi - d)
