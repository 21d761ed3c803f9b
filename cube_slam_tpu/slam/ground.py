"""Monocular ground-plane scale recovery.

Re-design of the ground-height rescaling machinery in Tracking.cc:2433-2663:
every few keyframes, fit a plane (batched RANSAC, ops/ransac.py — replacing
PCL SACSegmentation, Tracking.cc:2537-2550) to map points seen in the lower
middle of the image, accept it if its normal is close to the expected
camera-frame ground normal and the camera height is plausible, low-pass the
height estimate, and rescale the map (points + keyframe translations +
velocity) about an anchor keyframe (Tracking.cc:2588-2651).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import ransac
from ..utils import np_geometry as np_geo


@dataclass
class GroundConfig:
    nominal_height: float = 1.7          # KITTI camera height (m)
    every_kfs: int = 10                  # ground_everyKFs
    min_points: int = 20
    inlier_thresh: float = 0.05          # plane distance (scaled units)
    max_normal_angle_deg: float = 10.0
    height_filter_alpha: float = 0.6     # new-weight in the low-pass
    region_lower_frac: float = 1.0 / 3.0 # lower third of the image
    region_mid_frac: float = 0.5         # middle half of columns
    n_hypotheses: int = 256


class GroundScaleEstimator:
    def __init__(self, cfg: GroundConfig | None = None):
        self.cfg = cfg or GroundConfig()
        self.filtered_height = None
        self.kf_counter = 0

    def candidate_points(self, map_state, kf_id, img_wh):
        """Map points observed by kf_id whose keypoints lie in the lower
        middle of the image and that aren't object-owned
        (Tracking.cc:2439-2449)."""
        cfg = self.cfg
        m = map_state
        kp_xy = m.kf_kp_xy[kf_id]
        mp = m.kf_kp_mp[kf_id]
        w, h = img_wh
        sel = (
            (mp >= 0)
            & (kp_xy[:, 1] > h * (1.0 - cfg.region_lower_frac))
            & (kp_xy[:, 0] > w * (0.5 - cfg.region_mid_frac / 2))
            & (kp_xy[:, 0] < w * (0.5 + cfg.region_mid_frac / 2))
        )
        ids = mp[sel]
        ids = ids[m.mp_valid[ids]]
        if hasattr(m, "mp_best_obj"):
            ids = ids[m.mp_best_obj[ids] < 0]
        return ids

    def try_recover(self, map_state, kf_id, img_wh, cam_ground_normal=(0.0, -1.0, 0.0),
                    seed=0):
        """Attempt a scale estimate at this keyframe. Returns scale factor
        (to MULTIPLY map translations by) or None."""
        cfg = self.cfg
        self.kf_counter += 1
        if self.kf_counter % cfg.every_kfs != 0:
            return None
        ids = self.candidate_points(map_state, kf_id, img_wh)
        if len(ids) < cfg.min_points:
            return None
        m = map_state
        Tcw = m.kf_tcw[kf_id]
        pts_cam = m.mp_pos[ids] @ Tcw[:3, :3].T + Tcw[:3, 3]

        N = 256
        pts = np.zeros((N, 3), dtype=np.float32)
        valid = np.zeros(N, dtype=bool)
        take = min(len(ids), N)
        pts[:take] = pts_cam[:take]
        valid[:take] = True
        samples = ransac.make_triplet_indices(valid, n_hyp=cfg.n_hypotheses, seed=seed)
        # gate plane hypotheses to near-ground normals so the fit cannot
        # lock onto walls when they dominate the candidate region
        plane, inlier, n_in = ransac.fit_plane_ransac(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(samples),
            jnp.float32(cfg.inlier_thresh),
            expected_normal=jnp.asarray(cam_ground_normal, dtype=jnp.float32),
            min_normal_cos=jnp.float32(np.cos(np.deg2rad(cfg.max_normal_angle_deg))),
        )
        plane = np.array(plane)
        n_in = int(n_in)
        if n_in < cfg.min_points // 2:
            return None
        normal = plane[:3]
        expected = np.asarray(cam_ground_normal, dtype=np.float64)
        cosang = abs(float(normal @ expected)) / (np.linalg.norm(normal) * np.linalg.norm(expected))
        if cosang < np.cos(np.deg2rad(cfg.max_normal_angle_deg)):
            return None
        height = abs(float(plane[3]))  # camera distance to plane
        if height < 1e-6:
            return None

        # low-pass the height (Tracking.cc:2608-2612)
        if self.filtered_height is None:
            self.filtered_height = height
        else:
            a = cfg.height_filter_alpha
            self.filtered_height = a * height + (1 - a) * self.filtered_height
        return cfg.nominal_height / self.filtered_height

    @staticmethod
    def apply_scale(map_state, anchor_kf, scale):
        """Rescale the map about the anchor keyframe's camera center
        (Tracking.cc:2614-2651): map points and keyframe translations move;
        rotations unchanged."""
        m = map_state
        anchor_center = np_geo.inv_T(m.kf_tcw[anchor_kf])[:3, 3]
        ids = m.mp_ids()
        m.mp_pos[ids] = (m.mp_pos[ids] - anchor_center) * scale + anchor_center
        for k in m.kf_ids():
            Twc = np_geo.inv_T(m.kf_tcw[k])
            Twc[:3, 3] = (Twc[:3, 3] - anchor_center) * scale + anchor_center
            m.kf_tcw[k] = np_geo.inv_T(Twc).astype(np.float32)
        m.mp_min_dist[ids] *= scale
        m.mp_max_dist[ids] *= scale
