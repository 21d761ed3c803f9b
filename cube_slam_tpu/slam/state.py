"""SLAM map state — fixed-capacity arrays instead of pointer graphs.

The reference's Map/KeyFrame/MapPoint classes (orb_object_slam/src/{Map,
KeyFrame,MapPoint}.cc) are mutex-guarded pointer webs. Here the map is a
set of preallocated numpy arrays on the host (the bookkeeping side) whose
slices are shipped to jitted kernels per step; device code never sees
dynamic sizes. Associations are integer id arrays (-1 = none), mirroring
the reference's mvpMapPoints / mObservations.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class MapState:
    """Host-side map store (numpy). Capacities are hard bounds; slots are
    recycled via valid masks (MapPoint::SetBadFlag analog)."""

    max_kf: int = 128
    max_mp: int = 16384
    n_kp: int = 512  # keypoints per keyframe (padded)

    def __post_init__(self):
        K, P, N = self.max_kf, self.max_mp, self.n_kp
        self.kf_tcw = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        self.kf_valid = np.zeros(K, dtype=bool)
        self.kf_frame_id = np.full(K, -1, dtype=np.int64)
        self.kf_kp_xy = np.zeros((K, N, 2), dtype=np.float32)
        self.kf_kp_level = np.zeros((K, N), dtype=np.int32)
        self.kf_kp_angle = np.zeros((K, N), dtype=np.float32)
        self.kf_kp_desc = np.zeros((K, N, 8), dtype=np.uint32)
        self.kf_kp_valid = np.zeros((K, N), dtype=bool)
        self.kf_kp_mp = np.full((K, N), -1, dtype=np.int32)
        # depth measurement per keypoint (RGBD/stereo paths; 0 = none)
        self.kf_kp_depth = np.zeros((K, N), dtype=np.float32)

        self.mp_pos = np.zeros((P, 3), dtype=np.float32)
        self.mp_valid = np.zeros(P, dtype=bool)
        self.mp_desc = np.zeros((P, 8), dtype=np.uint32)
        self.mp_normal = np.zeros((P, 3), dtype=np.float32)
        self.mp_min_dist = np.zeros(P, dtype=np.float32)
        self.mp_max_dist = np.full(P, 1e9, dtype=np.float32)
        self.mp_level = np.zeros(P, dtype=np.int32)  # reference octave
        self.mp_nobs = np.zeros(P, dtype=np.int32)
        self.mp_visible = np.zeros(P, dtype=np.int32)  # TrackLocalMap counters
        self.mp_found = np.zeros(P, dtype=np.int32)
        self.mp_first_kf = np.full(P, -1, dtype=np.int32)
        # object association votes (MapPoint.h:125-141): best object per point
        self.mp_best_obj = np.full(P, -1, dtype=np.int32)

    # -- slot management ---------------------------------------------------
    def alloc_kf(self):
        """Index of a free keyframe slot, or -1 when capacity is exhausted
        (callers evict or cull — never crash mid-run)."""
        free = np.where(~self.kf_valid)[0]
        return int(free[0]) if len(free) else -1

    def alloc_mps(self, count):
        """Up to `count` free map-point slots. May return FEWER near
        capacity — callers must size their writes by len() of the result
        (graceful degradation instead of a mid-run RuntimeError)."""
        free = np.where(~self.mp_valid)[0]
        return free[:count]

    def erase_kf(self, k):
        """Remove a keyframe (KeyFrame::SetBadFlag analog): detach its
        observations, decrement map-point counts, and erase points left
        with no observers."""
        mp = self.kf_kp_mp[k]
        ids = np.unique(mp[mp >= 0])
        self.mp_nobs[ids] -= 1
        self.kf_kp_mp[k][:] = -1
        self.kf_kp_valid[k][:] = False
        self.kf_valid[k] = False
        self.kf_frame_id[k] = -1
        orphan = ids[(self.mp_nobs[ids] <= 0) & self.mp_valid[ids]]
        if len(orphan):
            self.erase_mp(orphan)

    def clear(self):
        """Map::clear analog — wipe everything (System/Tracking Reset)."""
        self.__post_init__()

    def kf_ids(self):
        return np.where(self.kf_valid)[0]

    def mp_ids(self):
        return np.where(self.mp_valid)[0]

    # -- derived quantities --------------------------------------------------
    def covisibility_counts(self, kf_id):
        """Shared-map-point counts between kf_id and every other KF
        (KeyFrame::UpdateConnections analog, computed on demand).

        Vectorized: membership mask over map-point ids, then one (K, N)
        reduction — no Python set intersections (scales to max_kf x n_kp)."""
        mps = self.kf_kp_mp[kf_id]
        mine = np.zeros(self.max_mp, dtype=bool)
        mine[mps[mps >= 0]] = True
        owned = (self.kf_kp_mp >= 0) & mine[np.clip(self.kf_kp_mp, 0, None)]
        counts = (owned & self.kf_valid[:, None]).sum(axis=1).astype(np.int32)
        counts[kf_id] = 0
        return counts

    def covisibility_matrix(self):
        """(max_kf, max_kf) shared-map-point counts between all KF pairs —
        one ownership matmul (essential-graph edge weights)."""
        own = np.zeros((self.max_kf, self.max_mp), dtype=np.float32)
        kf_i, kp_i = np.where(self.kf_valid[:, None] & (self.kf_kp_mp >= 0))
        own[kf_i, self.kf_kp_mp[kf_i, kp_i]] = 1.0
        counts = (own @ own.T).astype(np.int32)
        np.fill_diagonal(counts, 0)
        return counts

    def erase_mp(self, ids):
        self.mp_valid[ids] = False
        # detach from keyframes
        mask = np.isin(self.kf_kp_mp, ids)
        self.kf_kp_mp[mask] = -1

    def replace_mp(self, old, new):
        """MapPoint::Replace analog: every observation of `old` re-points to
        `new`; `old` is invalidated."""
        if old == new:
            return
        self.kf_kp_mp[self.kf_kp_mp == old] = new
        self.mp_nobs[new] += self.mp_nobs[old]
        self.mp_found[new] += self.mp_found[old]
        self.mp_visible[new] += self.mp_visible[old]
        self.mp_valid[old] = False

    def observations_of(self, mp_sel):
        """(kf_idx, kp_idx, mp_idx) arrays for all observations of the
        selected map-point ids (for BA edge lists)."""
        sel = np.zeros(self.max_mp, dtype=bool)
        sel[mp_sel] = True
        kf_idx, kp_idx = np.where(
            self.kf_valid[:, None] & (self.kf_kp_mp >= 0) & sel[np.clip(self.kf_kp_mp, 0, None)]
        )
        mp_idx = self.kf_kp_mp[kf_idx, kp_idx]
        return kf_idx, kp_idx, mp_idx


@dataclass
class FrameFeatures:
    """Per-frame extracted features (host mirror of Frame.cc fields).

    `dev` optionally holds the DEVICE-resident jnp arrays from extraction
    (xy/desc/level/valid/angle) so per-frame kernels can consume them
    without re-uploading — on a tunneled TPU every host->device transfer
    costs a round trip."""

    xy: np.ndarray       # (N, 2)
    level: np.ndarray    # (N,)
    angle: np.ndarray    # (N,)
    desc: np.ndarray     # (N, 8) uint32
    valid: np.ndarray    # (N,)
    mp: np.ndarray = None  # (N,) associated map point ids (-1 none)
    dev: dict = None     # optional device-array mirror

    def __post_init__(self):
        if self.mp is None:
            self.mp = np.full(len(self.valid), -1, dtype=np.int32)
