"""Cuboid landmark type — batched, functional.

TPU-native re-design of g2o::cuboid
(reference: object_slam/include/object_slam/g2o_Object.h:23-191 and
orb_object_slam/include/g2o_Object.h:29-224).

A cuboid is a pytree of arrays instead of a class holding an SE3Quat:

    pose:  (..., 4, 4) object-to-world rigid transform
    scale: (..., 3)    half extents [length, width, height]

Every operation broadcasts over leading batch dims, so a whole map of
objects (or a lattice of proposal hypotheses) is one array program. Where
g2o calls virtual computeError per edge, here the same math runs as a single
vmapped residual evaluation feeding the LM solver (graph/factors.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import geometry as geo


class Cuboid(NamedTuple):
    """Batched cuboid state. pose: (..., 4, 4); scale: (..., 3) half-extents."""

    pose: jnp.ndarray
    scale: jnp.ndarray

    @property
    def batch_shape(self):
        return self.scale.shape[:-1]


def from_minimal_vector(v):
    """[x y z roll pitch yaw l w h] (..., 9) -> Cuboid
    (g2o_Object.h:36-41)."""
    R = geo.euler_zyx_to_rot(v[..., 3], v[..., 4], v[..., 5])
    return Cuboid(pose=geo.make_T(R, v[..., :3]), scale=v[..., 6:9])


def to_minimal_vector(c: Cuboid):
    """Cuboid -> [x y z roll pitch yaw l w h] (g2o_Object.h:136-142)."""
    roll, pitch, yaw = geo.rot_to_euler_zyx(c.pose[..., :3, :3])
    return jnp.concatenate(
        [c.pose[..., :3, 3], jnp.stack([roll, pitch, yaw], axis=-1), c.scale], axis=-1
    )


def exp_update(c: Cuboid, update9):
    """Right-multiplicative tangent update (g2o_Object.h:57-63):
    pose' = pose * exp(update[:6]); scale' = scale + update[6:9].

    Scale is floored at 1 cm: the additive update can otherwise step
    through zero when bbox edges alone (depth-ambiguous) drive the
    optimization, and a negative half-extent silently flips the cuboid
    inside out."""
    return Cuboid(
        pose=c.pose @ geo.se3_exp(update9[..., :6]),
        scale=jnp.maximum(c.scale + update9[..., 6:9], 0.01),
    )


def transform_from(c: Cuboid, Twc):
    """Local (camera-frame) cuboid -> world cuboid, Twc camera-to-world
    (g2o_Object.h:118-124)."""
    return Cuboid(pose=Twc @ c.pose, scale=c.scale)


def transform_to(c: Cuboid, Twc):
    """World cuboid -> camera-frame cuboid (g2o_Object.h:127-133)."""
    return Cuboid(pose=geo.inv_T(Twc) @ c.pose, scale=c.scale)


def cube_log_error(c: Cuboid, other: Cuboid):
    """9-vector error [se3_log(other.pose^-1 * c.pose), c.scale - other.scale]
    (g2o_Object.h:66-73)."""
    pose_diff = geo.inv_T(other.pose) @ c.pose
    return jnp.concatenate([geo.se3_log(pose_diff), c.scale - other.scale], axis=-1)


_ROT_ANGLES = jnp.array([-1.0, 0.0, 1.0, 2.0]) * (jnp.pi / 2.0)
_SWAP_LW = jnp.array([True, False, True, False])  # +-90 deg swaps length/width


def rotate_cuboid(c: Cuboid, yaw_angle, swap_lw):
    """Re-represent the same cuboid with the front face rotated about body z
    (g2o_Object.h:105-115). swap_lw must be True for +-90 degree yaws."""
    rot = geo.make_T(geo.rotz(yaw_angle), jnp.zeros(3, dtype=c.pose.dtype))
    scale = jnp.where(
        swap_lw,
        jnp.stack([c.scale[..., 1], c.scale[..., 0], c.scale[..., 2]], axis=-1),
        c.scale,
    )
    return Cuboid(pose=c.pose @ rot, scale=scale)


def min_log_error(c: Cuboid, other: Cuboid):
    """Error minimized over the 4 yaw re-representations of `other`
    (g2o_Object.h:76-102). Fully batched: evaluates all four rotations and
    selects by norm — no data-dependent control flow."""
    errs = []
    norms = []
    for i in range(4):
        rotated = rotate_cuboid(other, _ROT_ANGLES[i], _SWAP_LW[i])
        e = cube_log_error(c, rotated)
        errs.append(e)
        norms.append(jnp.linalg.norm(e, axis=-1))
    errs = jnp.stack(errs, axis=-2)  # (..., 4, 9)
    norms = jnp.stack(norms, axis=-1)  # (..., 4)
    best = jnp.argmin(norms, axis=-1)
    return jnp.take_along_axis(errs, best[..., None, None].repeat(9, axis=-1), axis=-2)[..., 0, :]


_CORNERS_BODY = jnp.array(
    # 3x8 unit-corner table (g2o_Object.h:164-168); columns are corners
    [
        [1, 1, -1, -1, 1, 1, -1, -1],
        [1, -1, -1, 1, 1, -1, -1, 1],
        [-1, -1, -1, -1, 1, 1, 1, 1],
    ],
    dtype=jnp.float32,
)


def corners_3d(c: Cuboid):
    """8 world-frame corners (..., 8, 3) (g2o_Object.h:162-171)."""
    R = c.pose[..., :3, :3]
    t = c.pose[..., :3, 3]
    scaled = _CORNERS_BODY.T * c.scale[..., None, :]  # (..., 8, 3)
    return scaled @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def project_onto_image_rect(c: Cuboid, Tcw, K):
    """Project 8 corners and take the bounding rect [x1 y1 x2 y2]
    (g2o_Object.h:174-181). Tcw: world-to-camera (..., 4, 4); K (3, 3)."""
    pts_w = corners_3d(c)  # (..., 8, 3)
    pts_c = geo.transform_points(Tcw, pts_w)
    uv = pts_c @ jnp.swapaxes(K, -1, -2)
    uv = uv[..., :2] / uv[..., 2:3]
    topleft = jnp.min(uv, axis=-2)
    bottomright = jnp.max(uv, axis=-2)
    return jnp.concatenate([topleft, bottomright], axis=-1)


def project_onto_image_bbox(c: Cuboid, Tcw, K):
    """[center_x center_y width height] projected bbox (g2o_Object.h:184-190)."""
    rect = project_onto_image_rect(c, Tcw, K)
    center = (rect[..., 2:4] + rect[..., 0:2]) * 0.5
    wh = rect[..., 2:4] - rect[..., 0:2]
    return jnp.concatenate([center, wh], axis=-1)


def point_boundary_error(c: Cuboid, points_world, max_outside_margin_ratio=1.0):
    """Truncated hinge distance of world points to the cuboid surface along
    each body axis (orb g2o_Object.cpp:280-298): transform points into the
    object frame, penalize |p| exceeding the half-extent, clipped at
    margin*scale. points_world: (..., N, 3) -> (..., N, 3) error."""
    local = geo.transform_points(geo.inv_T(c.pose), points_world)
    outside = jnp.abs(local) - c.scale[..., None, :]
    hinge = jnp.clip(outside, 0.0, None)
    return jnp.minimum(hinge, max_outside_margin_ratio * c.scale[..., None, :])
