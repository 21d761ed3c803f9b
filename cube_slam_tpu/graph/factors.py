"""Factor (edge) residual families for the cuboid SLAM graphs.

Each reference g2o edge type (object_slam/include/object_slam/g2o_Object.h,
orb_object_slam g2o_Object.h/cpp, vendored types_six_dof_expmap.h) becomes a
batched whitened-residual function over padded arrays: residuals for ALL
edges of a family are computed in one vmapped evaluation, masked entries
contribute zeros. Information matrices are diagonal in the reference, so
whitening is elementwise multiplication by sqrt-information.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import cuboid as cb
from ..utils import geometry as geo


def se3_cuboid_error(cuboid_obj: cb.Cuboid, Tcw, meas: cb.Cuboid, sqrt_info, mask):
    """EdgeSE3Cuboid (object_slam g2o_Object.h:230-256): 9-DoF error between
    the global cuboid and the measurement lifted by the camera pose.

    Tcw: (..., 4, 4) world-to-camera; meas: camera-frame cuboid batch;
    sqrt_info: (..., 9) or scalar; mask: (...,). Returns (..., 9)."""
    Twc = geo.inv_T(Tcw)
    esti_global = cb.transform_from(meas, Twc)
    err = cb.min_log_error(cuboid_obj, esti_global)
    return err * sqrt_info * mask[..., None]


def se3_odometry_error(T1cw, T2cw, meas_12, sqrt_info, mask):
    """EdgeSE3Expmap (types_six_dof_expmap.h:90-99):
    error = log(C * T1 * T2^-1), C = measured 1->2 motion (Tcw convention)."""
    err = geo.se3_log(meas_12 @ T1cw @ geo.inv_T(T2cw))
    return err * sqrt_info * mask[..., None]


def se3_cuboid_proj_error(cuboid_obj: cb.Cuboid, Tcw, K, bbox_meas, sqrt_info, mask):
    """EdgeSE3CuboidProj (object_slam g2o_Object.h:259-288): projected bbox
    [cx cy w h] minus detected bbox. Returns (..., 4)."""
    rect = cb.project_onto_image_bbox(cuboid_obj, Tcw, K)
    return (rect - bbox_meas) * sqrt_info * mask[..., None]


def point_reproj_error(Tcw, K, pts_world, uv_meas, sqrt_info, mask):
    """Monocular point reprojection (g2o EdgeSE3ProjectXYZ,
    types_six_dof_expmap.h): project world points and subtract pixel
    measurements. pts_world: (..., 3); uv_meas: (..., 2)."""
    pc = geo.transform_points(Tcw, pts_world[..., None, :])[..., 0, :]
    z = jnp.where(jnp.abs(pc[..., 2:3]) < 1e-9, 1e-9, pc[..., 2:3])
    uv = (pc @ jnp.swapaxes(K, -1, -2))[..., :2] / z
    return (uv - uv_meas) * sqrt_info * mask[..., None]


def point_cuboid_error(cuboid_obj: cb.Cuboid, pts_world, sqrt_info, mask,
                       max_outside_margin_ratio=1.0):
    """EdgePointCuboidOnlyObject (orb g2o_Object.cpp:300-354): truncated
    hinge of owned map points outside the cuboid. pts_world (..., N, 3) ->
    (..., N, 3)."""
    err = cb.point_boundary_error(cuboid_obj, pts_world, max_outside_margin_ratio)
    return err * sqrt_info * mask[..., None]


def object_motion_error(cub_t: cb.Cuboid, cub_t1: cb.Cuboid, velocity, dt, sqrt_info, mask):
    """EdgeObjectMotion (orb g2o_Object.cpp:241-278): planar bicycle model.

    velocity: (..., 2) = [linear v, steering angle gamma]; wheelbase 2.71 m.
    Predicts cuboid pose at t+1 from pose at t and returns the [x, y, yaw]
    gap to the estimated t+1 pose."""
    wheelbase = 2.71
    v, gamma = velocity[..., 0], velocity[..., 1]
    t_pose = cub_t.pose
    roll, pitch, yaw = geo.rot_to_euler_zyx(t_pose[..., :3, :3])
    dyaw = v / wheelbase * jnp.tan(gamma) * dt
    new_yaw = yaw + dyaw
    dx = v * dt * jnp.cos(yaw)
    dy = v * dt * jnp.sin(yaw)
    pred_xy = t_pose[..., :2, 3] + jnp.stack([dx, dy], axis=-1)

    _, _, yaw1 = geo.rot_to_euler_zyx(cub_t1.pose[..., :3, :3])
    xy1 = cub_t1.pose[..., :2, 3]
    yaw_err = geo.normalize_to_pi(yaw1 - new_yaw)
    err = jnp.concatenate([xy1 - pred_xy, yaw_err[..., None]], axis=-1)
    return err * sqrt_info * mask[..., None]


def quality_to_sqrt_info(meas_quality, scale=2.0):
    """Demo edge information: inv_sigma = scale * quality on all 9 dims
    (main_obj.cpp:539-542); whitening multiplies by inv_sigma (sqrt of the
    diagonal info inv_sigma^2)."""
    return scale * meas_quality
