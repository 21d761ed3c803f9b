"""Monocular SLAM system — the host driver over jitted kernels.

Re-design of System/Tracking/LocalMapping (orb_object_slam/src/System.cc,
Tracking.cc, LocalMapping.cc) in the reference's `parallel_mapping=false`
configuration (Tracking.cc:775-780): the deterministic sequential schedule
where mapping runs inline after each keyframe insertion — the reference's
own determinism switch, and the natural shape for a host loop dispatching
fused device programs. The pthread pipeline (System.cc:104-117) becomes
per-frame kernel launches; all shared-state mutexes disappear because map
state is owned by this single driver.

Pipeline per frame (Tracking::Track, Tracking.cc:480-780):
  ORB extraction -> (init | motion-model tracking -> local-map tracking)
  -> keyframe decision -> inline local mapping (triangulation, culling,
  local BA).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..graph import ba
from ..ops import matching, orb
from ..utils import np_geometry as np_geo
from ..utils import profiler
from . import initializer as ini
from . import tracking as trk
from .state import FrameFeatures, MapState

logger = logging.getLogger("cube_slam_tpu")


def _select_best(ids, scores, cap, what):
    """Pick the top-`cap` ids by score (descending); log when clipping.

    Replaces silent first-N truncation: when a candidate set exceeds a
    fixed kernel capacity, keep the BEST candidates and say so."""
    if len(ids) <= cap:
        return ids
    order = np.argsort(-scores)[:cap]
    logger.warning("%s: clipping %d -> %d candidates (keeping best by score)",
                   what, len(ids), cap)
    return ids[order]


@dataclass
class TrackerConfig:
    n_features: int = 512
    n_levels: int = 8
    max_kf: int = 96
    max_mp: int = 12288
    match_radius_motion: float = 15.0
    match_radius_local: float = 6.0
    min_inliers_track: int = 10
    min_inliers_local: int = 20
    new_kf_min_frames: int = 0
    new_kf_max_frames: int = 10
    new_kf_ref_ratio: float = 0.9
    local_ba_kfs: int = 6
    triangulate_neighbors: int = 3
    local_ba_iters: int = 6
    max_obs_edges: int = 8192
    min_init_kps: int = 100
    min_init_matches: int = 100
    init_ratio: float = 0.9
    init_max_dist: int = 50
    enable_loop_closing: bool = True
    loop_min_gap_kfs: int = 10
    loop_covis_theta: int = 30
    loop_global_ba: bool = True
    # software-pipelined tracking: dispatch frame N without blocking on its
    # result; host logic for frame N-1 overlaps the tunnel round trip +
    # device compute. track() then returns the PREVIOUS frame's pose (call
    # flush() at end of run). ~3x frame throughput on tunneled TPUs.
    pipeline: bool = False


import functools

import jax
from jax import lax

from ..utils import hostpack


@functools.partial(jax.jit, static_argnames=("E", "KF", "PT", "num_iters"))
def _local_ba_packed(buf, K, E, KF, PT, num_iters):
    """local_ba_points with ONE packed upload and ONE packed download
    (the KF-step's dozen per-array transfers each cost a tunnel round
    trip — see utils/hostpack). The reduced-camera system assembles as
    the DENSE matmul-shaped contraction (ba.local_ba_points' default):
    no pair list travels through the tunnel and the compile shape
    depends only on (E, KF, PT)."""
    specs = [((KF, 4, 4), jnp.float32), ((PT, 3), jnp.float32),
             ((E,), jnp.int32), ((E,), jnp.int32), ((E, 2), jnp.float32),
             ((E,), jnp.float32), ((E,), jnp.bool_),
             ((KF,), jnp.bool_), ((PT,), jnp.bool_),
             ((E,), jnp.float32), ((E,), jnp.float32)]
    (kf_tcw, pts, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
     kf_fixed, pt_valid, obs_z, obs_z_si) = \
        hostpack.unpack_device(buf, specs)
    out_tcw, out_pts, _cost, inl = ba.local_ba_points(
        kf_tcw, pts, K, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
        kf_fixed, pt_valid, obs_z=obs_z, obs_z_si=obs_z_si,
        num_iters=num_iters)
    return jnp.concatenate([out_tcw.reshape(-1), out_pts.reshape(-1),
                            inl.astype(jnp.float32)])


@functools.partial(jax.jit, static_argnames=("NB", "N"))
def _triangulate_packed(buf, K, NB, N):
    """triangulate_multi with one packed upload / one packed download."""
    specs = [((4, 4), jnp.float32), ((NB, 4, 4), jnp.float32),
             ((N, 2), jnp.float32), ((N, 8), jnp.uint32), ((N,), jnp.int32),
             ((N,), jnp.bool_),
             ((NB, N, 2), jnp.float32), ((NB, N, 8), jnp.uint32),
             ((NB, N), jnp.int32), ((NB, N), jnp.bool_),
             ((N,), jnp.float32), ((NB, N), jnp.float32)]
    (Tcw1, Tcw2, kp_xy, kp_desc, kp_level, free_k,
     xy_s, desc_s, level_s, free_s, ang_k, ang_s) = \
        hostpack.unpack_device(buf, specs)
    from . import tracking as trk_mod
    X_s, m12_s, ok_s = trk_mod.triangulate_multi(
        Tcw1, Tcw2, K, kp_xy, kp_desc, kp_level, free_k,
        xy_s, desc_s, level_s, free_s,
        kp1_angle=ang_k, kp2_angle_s=ang_s)
    return jnp.concatenate([X_s.reshape(-1), m12_s.astype(jnp.float32).reshape(-1),
                            ok_s.astype(jnp.float32).reshape(-1)])


@functools.partial(jax.jit, static_argnames=("NN", "M", "N", "radius",
                                               "n_levels"))
def _fuse_packed(buf, K, img_wh, NN, M, N, radius=2.5, n_levels=8):
    """search_local_points_multi with ONE packed upload (candidate
    map-point data is freshly gathered on host — the device mirror is
    stale mid-keyframe-step) and one download."""
    specs = [((NN, 4, 4), jnp.float32),
             ((M, 3), jnp.float32), ((M, 8), jnp.uint32), ((M,), jnp.int32),
             ((M,), jnp.bool_), ((M, 3), jnp.float32), ((M,), jnp.float32),
             ((M,), jnp.float32),
             ((NN, N, 2), jnp.float32), ((NN, N, 8), jnp.uint32),
             ((NN, N), jnp.int32), ((NN, N), jnp.bool_)]
    (Tcw_s, c_pos, c_desc, c_level, mvalid, c_normal, c_min, c_max,
     xy_s, desc_s, level_s, valid_s) = hostpack.unpack_device(buf, specs)
    from . import tracking as trk_mod
    mp_to_kp_s, _ = trk_mod.search_local_points_multi(
        Tcw_s, K, c_pos, c_desc, c_level, mvalid, c_normal, c_min, c_max,
        xy_s, desc_s, level_s, valid_s,
        jnp.zeros((NN, N), dtype=bool), img_wh, jnp.float32(radius),
        n_levels=n_levels)
    return mp_to_kp_s


@functools.partial(jax.jit, static_argnames=("M",))
def _unpack_map_mirror(packed, M):
    """Device-side unpack of the single (P, 18) f32 mirror upload into the
    individual full-size map arrays (bit-exact: int/uint fields travel as
    raw bits). P is the live-slot prefix; the [P:M) tail is zero-padded on
    device — uploading the empty tail of a fixed-capacity map would waste
    real tunnel bandwidth every keyframe."""
    P = packed.shape[0]
    if P < M:
        packed = jnp.concatenate(
            [packed, jnp.zeros((M - P, 18), dtype=jnp.float32)])
    return dict(
        mp_pos=packed[:, 0:3],
        mp_normal=packed[:, 3:6],
        mp_min_dist=packed[:, 6],
        mp_max_dist=packed[:, 7],
        mp_level=lax.bitcast_convert_type(packed[:, 8], jnp.int32),
        mp_valid=packed[:, 9] > 0.5,
        mp_desc=lax.bitcast_convert_type(packed[:, 10:18], jnp.uint32),
    )


class _DeviceMapMirror:
    """Device-resident copies of the full-map arrays consumed by the
    per-frame kernels, refreshed in ONE packed transfer. The map mutates
    only at discrete events (keyframe creation, initialization, loop
    closure, rescale, reset) — between them, uploading arrays per frame
    costs one tunnel round trip each and dominated frame time on real TPU.
    The tracker bumps `_map_version` at every mutation site; the mirror
    re-uploads only on a version change, and as a single (M, 18) f32
    buffer (ints/bit-packed descriptors ride as raw bits) that a tiny
    device program unpacks — 2 round trips per refresh instead of 7.

    Also owns the device-resident per-frame VISIBILITY/FOUND counters
    (MapPoint::IncreaseVisible/IncreaseFound): the fast tracking path
    accumulates them on device; `sync_counters` folds the deltas into the
    host arrays at keyframe events."""

    def __init__(self):
        self.version = -1
        self.arrays = None
        self.vis_acc = None
        self.found_acc = None

    def get(self, m, version):
        if version != self.version or self.arrays is None:
            M = m.max_mp
            # live-slot prefix (slots are allocated front-first, so the
            # high-water mark bounds every valid slot), bucketed to pow2
            # for stable compile shapes
            used = np.where(m.mp_valid)[0]
            hi = int(used[-1]) + 1 if len(used) else 1
            P = min(M, max(512, 1 << int(np.ceil(np.log2(hi)))))
            P = max(P, hi)
            buf = np.empty((P, 18), dtype=np.float32)
            buf[:, 0:3] = m.mp_pos[:P]
            buf[:, 3:6] = m.mp_normal[:P]
            buf[:, 6] = m.mp_min_dist[:P]
            buf[:, 7] = m.mp_max_dist[:P]
            buf[:, 8] = m.mp_level[:P].view(np.float32)
            buf[:, 9] = m.mp_valid[:P]
            buf[:, 10:18] = m.mp_desc[:P].view(np.float32)
            self.arrays = dict(_unpack_map_mirror(jnp.asarray(buf), M=M))
            self.version = version
        return self.arrays

    def counters(self, m):
        if self.vis_acc is None:
            self.vis_acc = jnp.zeros(m.max_mp, dtype=jnp.int32)
            self.found_acc = jnp.zeros(m.max_mp, dtype=jnp.int32)
        return self.vis_acc, self.found_acc

    def set_counters(self, vis, found):
        self.vis_acc, self.found_acc = vis, found

    def sync_counters_dispatch(self):
        """Start the counter-delta download WITHOUT blocking; returns a
        pending handle for sync_counters_apply. The keyframe step dispatches
        this first so the ~one-round-trip download overlaps the
        triangulation/fusion device programs."""
        if self.vis_acc is None:
            return None
        stacked = jnp.stack([self.vis_acc, self.found_acc])
        try:
            stacked.copy_to_host_async()
        except Exception:
            pass
        return stacked

    def sync_counters_apply(self, m, pending):
        if pending is None:
            return
        deltas = np.array(pending)
        m.mp_visible += deltas[0]
        m.mp_found += deltas[1]
        self.vis_acc = jnp.zeros(m.max_mp, dtype=jnp.int32)
        self.found_acc = jnp.zeros(m.max_mp, dtype=jnp.int32)

    def sync_counters(self, m):
        """Fold device counter deltas into the host arrays and zero the
        device side. Must run BEFORE any host mutation that recycles
        map-point slots (the deltas are slot-indexed)."""
        self.sync_counters_apply(m, self.sync_counters_dispatch())


class MonocularTracker:
    """TrackMonocular-equivalent API over the TPU kernels."""

    def __init__(self, K, img_wh, config: TrackerConfig | None = None):
        self.cfg = config or TrackerConfig()
        self.K = np.asarray(K, dtype=np.float32)
        self.img_wh = np.asarray(img_wh, dtype=np.float32)
        self.orb_cfg = orb.OrbPyramidConfig(
            n_features=self.cfg.n_features, n_levels=self.cfg.n_levels
        )
        self.map = MapState(max_kf=self.cfg.max_kf, max_mp=self.cfg.max_mp,
                            n_kp=self._n_kp_total())
        self.state = "NOT_INITIALIZED"
        self.init_frame = None  # reference frame for initialization
        self.last_frame = None
        self.last_Tcw = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self.frame_id = -1
        self.last_kf_frame_id = -1
        self.ref_kf = -1
        self.trajectory = []  # (frame_id, Tcw) as tracked (not retro-corrected)
        # relative trajectory (mlRelativeFramePoses, System.cc:301-364):
        # (frame_id, ref_kf, ref_kf_frame_id, T_frame_wrt_ref) — recomposed
        # against the CURRENT keyframe poses so loop corrections and map
        # rescaling retroactively fix past frames
        self._traj_rel = []
        self.tracked_inliers = 0
        from .loop_closing import LoopDetector

        self.loop_detector = LoopDetector(min_gap_kfs=self.cfg.loop_min_gap_kfs)
        self.loops_closed = 0
        self.loop_edges = []  # (kf_a, kf_b) closed pairs (GetLoopEdges analog)
        # device-resident constants + full-map mirror (transfer avoidance)
        self._K_dev = jnp.asarray(self.K)
        self._img_wh_dev = jnp.asarray(self.img_wh)
        self._mirror = _DeviceMapMirror()
        self._map_version = 0
        # device-resident tracker state for the fast path: (last_Tcw,
        # velocity, last kp->mp table); None = re-seed from host next frame
        self._dev_state = None
        # in-flight dispatched frame (cfg.pipeline mode)
        self._pending = None
        # in-flight local BA from the last keyframe step (_apply_pending_map)
        self._pending_ba = None
        # last tracked frame's pose relative to its reference keyframe
        # (motion-model re-anchor after async BA folds)
        self._last_rel = None
        self._sup_dummy = None
        # optional structured per-frame metrics (utils/metrics.MetricsRecorder)
        self.metrics = None

    def _bump_map(self):
        """Invalidate the device map mirror AND the device tracker state —
        call after ANY mutation of the map arrays or host pose/velocity
        state the per-frame kernels consume."""
        self._map_version += 1
        self._dev_state = None

    def _n_kp_total(self):
        cfg = orb.OrbPyramidConfig(self.cfg.n_features, n_levels=self.cfg.n_levels)
        return int(sum(cfg.per_level))

    # ------------------------------------------------------------------
    def _extract(self, gray):
        """Whole-pyramid extraction as ONE device program; host fields are
        lazy (downloaded only by init / rescue / keyframe paths)."""
        f = orb.extract_orb_fused(
            jnp.asarray(gray, dtype=jnp.float32), self.orb_cfg)
        return FrameFeatures(dev=dict(f), n_kp=self._n_kp_total())

    def track(self, gray):
        """Process one frame; returns Tcw (4, 4) or None while initializing
        or lost.

        With `cfg.pipeline=True` the per-frame device program is dispatched
        WITHOUT blocking on its result: frame N's program runs (and its
        result rides back through the tunnel) while the host handles frame
        N-1's outcome — the software-pipelined analog of the reference's
        tracking/mapping thread overlap (System.cc:104-117). The returned
        pose then belongs to the PREVIOUS frame (None while the pipeline
        fills); `trajectory` still records every frame under its own id,
        and `flush()` resolves the final in-flight frame at end of run."""
        t0 = time.perf_counter()
        # fold the previous keyframe's local BA as soon as the device has
        # finished it (bounded staleness; non-blocking check)
        self._apply_pending_map(only_if_ready=True)
        if self.cfg.pipeline and self.state == "OK":
            out = self._track_pipelined(gray)
        else:
            if self._pending is not None:
                self._resolve_pending()
            out = self._track_one(gray)
        if self.metrics is not None:
            self.metrics.add(
                frame_id=self.frame_id, state=self.state,
                tracked=out is not None,
                inliers=int(self.tracked_inliers),
                n_kf=int(self.map.kf_valid.sum()),
                n_mp=int(self.map.mp_valid.sum()),
                frame_ms=(time.perf_counter() - t0) * 1e3,
            )
        return out

    def flush(self):
        """Resolve the in-flight frame (pipelined mode) and fold any
        in-flight local BA; returns the frame's pose or None."""
        if self._pending is None:
            self._apply_pending_map()
            return None
        out = self._resolve_pending()
        self._apply_pending_map()
        return out

    def _resolve_pending(self):
        p, self._pending = self._pending, None
        return self._resolve(p)

    def _track_pipelined(self, gray):
        self.frame_id += 1
        fid = self.frame_id
        # chain broken at the last resolve (keyframe / rescue / reset):
        # resolve the in-flight frame FIRST so the host re-seed below sees
        # its pose and associations
        resolved_pose = None
        resolved = False
        if self._pending is not None and self._dev_state is None:
            resolved_pose = self._resolve_pending()
            resolved = True
        if self.state == "NOT_INITIALIZED":
            # a resolve above may have reset the system
            return self._init_step(fid, gray)
        prev = self._pending
        self._pending = self._dispatch_frame(fid, gray)
        if prev is not None:
            return self._resolve(prev)
        return resolved_pose if resolved else None

    def _track_one(self, gray):
        self.frame_id += 1
        if self.state == "NOT_INITIALIZED":
            return self._init_step(self.frame_id, gray)
        p = self._dispatch_frame(self.frame_id, gray)
        return self._resolve(p)

    def _init_step(self, fid, gray):
        feats = self._extract(gray)
        ok = self._try_initialize(feats)
        if ok:
            self.state = "OK"
            self._bump_map()
            self.trajectory.append((fid, self.last_Tcw.copy()))
            self._record_pose(self.last_Tcw, fid=fid)
            return self.last_Tcw.copy()
        self.trajectory.append((fid, None))
        return None

    # ------------------------------------------------------------------
    # initialization (MonocularInitialization, Tracking.cc:931-1006)
    # ------------------------------------------------------------------
    def _try_initialize(self, feats):
        if self.init_frame is None or feats.valid.sum() < self.cfg.min_init_kps:
            if feats.valid.sum() >= self.cfg.min_init_kps:
                self.init_frame = (self.frame_id, feats)
            return False
        ref_id, ref = self.init_frame
        d = matching.hamming_matrix(
            jnp.asarray(ref.desc), jnp.asarray(feats.desc),
            jnp.asarray(ref.valid), jnp.asarray(feats.valid),
        )
        wm = matching.window_mask(
            jnp.asarray(ref.xy), jnp.asarray(feats.xy), 100.0
        )
        d = jnp.where(wm, d, matching.BIG)
        m, _ = matching.match_mutual_ratio(
            d, max_dist=self.cfg.init_max_dist, ratio=self.cfg.init_ratio, mutual=True
        )
        m = matching.rotation_consistency(
            jnp.asarray(ref.angle), jnp.asarray(feats.angle), m
        )
        m = np.array(m)
        matched = m >= 0
        if matched.sum() < self.cfg.min_init_matches:
            self.init_frame = (self.frame_id, feats)
            return False

        p1 = ref.xy
        p2 = feats.xy[np.clip(m, 0, None)]
        samples = ini.make_sample_indices(matched, n_ransac=200, seed=self.frame_id)
        out = ini.initialize_two_view(
            jnp.asarray(p1, dtype=jnp.float32), jnp.asarray(p2, dtype=jnp.float32),
            jnp.asarray(matched), jnp.asarray(self.K), jnp.asarray(samples),
        )
        if not bool(out["success"]):
            # keep trying against the same reference for a few frames
            if self.frame_id - ref_id > 5:
                self.init_frame = (self.frame_id, feats)
            return False

        Tcw2 = np.array(out["Tcw2"])
        good = np.array(out["point_good"]) & matched
        X = np.array(out["points3d"])

        # scale normalization by median depth (CreateInitialMapMonocular,
        # Tracking.cc:1098-1126)
        z = X[good][:, 2]
        med = np.median(z[z > 0]) if (z > 0).any() else 1.0
        X = X / med
        Tcw2[:3, 3] /= med

        # build initial map: two keyframes + points
        kf0 = self._insert_keyframe_raw(ref, np.eye(4, dtype=np.float32), ref_id)
        kf1 = self._insert_keyframe_raw(feats, Tcw2, self.frame_id)
        ids = self.map.alloc_mps(int(good.sum()))
        sel = np.where(good)[0][: len(ids)]
        self.map.mp_pos[ids] = X[sel]
        self.map.mp_valid[ids] = True
        self.map.mp_desc[ids] = feats.desc[m[sel]]
        self.map.mp_level[ids] = feats.level[m[sel]]
        self.map.mp_first_kf[ids] = kf1
        self.map.mp_nobs[ids] = 2
        self.map.kf_kp_mp[kf0, sel] = ids
        self.map.kf_kp_mp[kf1, m[sel]] = ids
        self._refresh_mp_geometry(ids)

        # full BA over the initial two-view map, then densify it with
        # epipolar triangulation between the two init keyframes
        self._local_ba([kf0, kf1], fixed=[kf0])
        self.ref_kf = kf1
        self._triangulate_new(kf1)
        self._local_ba([kf0, kf1], fixed=[kf0])
        self.last_Tcw = self.map.kf_tcw[kf1].copy()
        self.velocity = np.eye(4, dtype=np.float32)
        self.ref_kf = kf1
        self.last_kf_frame_id = self.frame_id
        feats.mp = self.map.kf_kp_mp[kf1].copy()
        self.last_frame = feats
        return True

    # ------------------------------------------------------------------
    # per-frame tracking
    # ------------------------------------------------------------------
    def _ensure_dev_state(self):
        """(Re-)seed the device tracker state from the host mirrors after a
        rescue / keyframe event / reset — one packed upload."""
        if self._dev_state is not None:
            return self._dev_state
        n_kp = self._n_kp_total()
        mp = (self.last_frame.mp if self.last_frame is not None
              else np.full(n_kp, -1, dtype=np.int32))
        buf = np.concatenate([
            self.last_Tcw.astype(np.float32).ravel(),
            self.velocity.astype(np.float32).ravel(),
            np.ascontiguousarray(mp.astype(np.int32)).view(np.float32),
        ])
        self._dev_state = trk.pack_track_state(jnp.asarray(buf))
        return self._dev_state

    def _suppress_dev(self, gray):
        """Hook: (mask, use) for suppressing keypoints in image regions
        (dynamic-object masks). Default: no suppression."""
        if self._sup_dummy is None:
            self._sup_dummy = jnp.zeros((1, 1), dtype=jnp.float32)
        return self._sup_dummy, False

    def _dispatch_frame(self, fid, gray):
        """Dispatch the per-frame happy path: ONE gray upload, ONE fused
        device program (extraction + motion tracking + local-map search +
        pose optimization + state/counter updates). Returns a pending
        record; no host<->device round trip happens here — the device
        state/counter chain advances through FUTURES (the program gates its
        own state update on the success flag, so chaining an eventually-
        failed frame is safe)."""
        profiler.tictoc("track.dispatch")
        cfg = self.cfg
        m = self.map
        dev = self._mirror.get(m, self._map_version)
        vis_acc, found_acc = self._mirror.counters(m)
        state = self._ensure_dev_state()
        sup, use_sup = self._suppress_dev(gray)
        g = np.asarray(gray)
        small, new_state, fdev, counters, rescue = trk.step_frame(
            jnp.asarray(g if g.dtype == np.uint8 else
                        g.astype(np.float32, copy=False)),
            state[0], state[1], state[2],
            dev["mp_pos"], dev["mp_desc"], dev["mp_level"], dev["mp_valid"],
            dev["mp_normal"], dev["mp_min_dist"], dev["mp_max_dist"],
            vis_acc, found_acc, self._K_dev, self._img_wh_dev, sup,
            orb_cfg=self.orb_cfg, use_suppress=use_sup,
            radius_motion=float(cfg.match_radius_motion),
            radius_local=float(cfg.match_radius_local),
            min_track=int(cfg.min_inliers_track),
            min_local=int(cfg.min_inliers_local),
        )
        self._dev_state = new_state
        self._mirror.set_counters(*counters)
        try:
            small.copy_to_host_async()
        except Exception:
            pass
        profiler.tictoc("track.dispatch")
        return dict(fid=fid, small=small, new_state=new_state, fdev=fdev,
                    rescue=rescue)

    def _resolve(self, p):
        """Resolve a dispatched frame: download the small result vector,
        update host pose state, run rescue paths on failure, and apply the
        trajectory / keyframe / mapping logic (Tracking::Track's epilogue,
        Tracking.cc:560-780)."""
        fid = p["fid"]
        with profiler.span("track.result_download"):
            small_h = np.array(p["small"])
        Tcw_f = small_h[:16].reshape(4, 4).astype(np.float32)
        n_in = int(small_h[16])
        n_in2 = int(small_h[17])
        ok = small_h[18] > 0.5
        self._last_track_stats = (n_in, n_in2, int(small_h[19]))
        feats = FrameFeatures(dev=dict(p["fdev"]), n_kp=self._n_kp_total())

        if ok:
            feats.set_mp_dev(p["new_state"][2])
            self.velocity = (
                Tcw_f.astype(np.float64)
                @ np_geo.inv_T(self.last_Tcw.astype(np.float64))
            ).astype(np.float32)
            self.last_Tcw = Tcw_f
            self.tracked_inliers = n_in2
        else:
            # host rescue paths take over (they mutate host state, so the
            # device state re-seeds at the next dispatch)
            self._dev_state = None
            with profiler.span("track.rescue"):
                ok = self._rescue(feats, p, n_in)

        if not ok:
            self.state = "LOST"
            self.trajectory.append((fid, None))
            # lost soon after initialization: the young map is unreliable —
            # wipe it and re-initialize (Tracking.cc:1017-1024)
            if len(self.map.kf_ids()) <= 5:
                logger.warning("tracking lost with only %d keyframes; "
                               "resetting", len(self.map.kf_ids()))
                self.reset()
            return None
        self.state = "OK"
        self.trajectory.append((fid, self.last_Tcw.copy()))
        self._record_pose(self.last_Tcw, fid=fid)
        if self._need_new_keyframe(fid, feats):
            self._create_keyframe(feats, fid=fid)
            # the keyframe step adds triangulated/fused associations to the
            # new reference KF = this frame; carry them into the next
            # frame's motion-model candidates
            if self.ref_kf >= 0:
                feats.mp = self.map.kf_kp_mp[self.ref_kf].copy()
            self._bump_map()
        self.last_frame = feats
        return self.last_Tcw.copy()

    def _rescue(self, feats, p, n_in):
        """Failure chain: PnP on the raw motion-stage matches, reference-KF
        match, relocalization. Returns True when tracking recovered."""
        cfg = self.cfg
        # tracking is in trouble: make sure the host map reflects every
        # completed optimization before the rescue matchers read it
        self._apply_pending_map()
        if n_in >= cfg.min_inliers_track:
            # motion stage fine but local-map stage too weak -> lost
            return False
        Tcw_pred = self.velocity @ self.last_Tcw
        cand_ids_d, raw_d = p["rescue"]
        cand = np.array(cand_ids_d).astype(np.int64)
        # wide-baseline rescue: PnP-RANSAC on the raw window matches
        # (plain pose LM cannot absorb large inter-frame motion; the
        # reference's answer is Relocalization's PnP, Tracking.cc:2876)
        ok_pnp, Tcw_p, mp_to_kp_p, n_p = self._pnp_on_matches(
            feats, cand, np.array(raw_d))
        if ok_pnp and n_p >= cfg.min_inliers_track:
            return self._track_local_after_rescue(
                feats, Tcw_p, mp_to_kp_p, cand)
        # TrackReferenceKeyFrame analog (Tracking.cc:1160): global
        # descriptor match against the reference KF's map points
        ok_ref, Tcw_r, mp_to_kp_r, cand_r, n_r = self._track_reference_kf(
            feats, Tcw_pred)
        if ok_ref:
            return self._track_local_after_rescue(
                feats, Tcw_r, mp_to_kp_r, cand_r)
        # relocalization (Tracking::Relocalization, :2876)
        return self._relocalize(feats)

    def _finish_tracked_frame(self, feats, Tcw_f, visible, n_in2):
        """Common epilogue: culling stats + motion model update."""
        vis_ids = np.where(visible)[0]
        self.map.mp_visible[vis_ids] += 1
        found_ids = feats.mp[feats.mp >= 0]
        self.map.mp_found[found_ids] += 1
        vel = Tcw_f @ np_geo.inv_T(self.last_Tcw)
        # a rescue that jumped far (relocalization to a distant keyframe)
        # yields a one-frame "velocity" that would catapult the next
        # prediction — the reference clears mVelocity only after
        # Relocalization (Tracking.cc:1347), and _relocalize does the same
        # here. PnP / reference-KF rescues recover a FRAME-ADJACENT pose, so
        # the velocity is real motion and must survive; the only guard kept
        # is SCALE-RELATIVE (>5x the previous speed when the previous speed
        # is meaningful) — an absolute floor is wrong at metric scales.
        prev = float(np.linalg.norm(self.velocity[:3, 3]))
        if prev > 1e-6 and float(np.linalg.norm(vel[:3, 3])) > 5.0 * prev:
            vel = np.eye(4, dtype=np.float32)
        self.velocity = vel
        self.last_Tcw = Tcw_f
        self.tracked_inliers = n_in2
        return True

    def _track_local_after_rescue(self, feats, Tcw, mp_to_kp, cand):
        """Rescue-path continuation: TrackLocalMap + final pose
        optimization, host-driven (the rescue pose is already downloaded
        and this path is rare, so fusing buys nothing)."""
        cfg = self.cfg
        fd = feats.dev or {}
        mp_to_kp = np.array(mp_to_kp)
        feats.mp = np.full(len(feats.valid), -1, dtype=np.int32)
        ok = mp_to_kp >= 0
        feats.mp[mp_to_kp[ok]] = cand[ok]

        Tcw_np = np.array(Tcw)
        dev = self._mirror.get(self.map, self._map_version)
        mp_to_kp2, visible = trk.search_local_points(
            jnp.asarray(Tcw_np), self._K_dev,
            dev["mp_pos"], dev["mp_desc"],
            dev["mp_level"], dev["mp_valid"],
            dev["mp_normal"], dev["mp_min_dist"],
            dev["mp_max_dist"],
            fd.get("xy", feats.xy), fd.get("desc", feats.desc),
            fd.get("level", feats.level), fd.get("valid", feats.valid),
            jnp.asarray(feats.mp >= 0),
            self._img_wh_dev, jnp.float32(cfg.match_radius_local),
            n_levels=cfg.n_levels,
        )
        mp_to_kp2 = np.array(mp_to_kp2)
        ok2 = mp_to_kp2 >= 0
        feats.mp[mp_to_kp2[ok2]] = np.where(ok2)[0]

        # final pose optimization against all associated points (shape padded
        # to the per-frame keypoint capacity -> never truncates, one compile)
        assoc_kp = np.where(feats.mp >= 0)[0]
        P = max(1024, len(feats.valid))
        pts = np.zeros((P, 3), dtype=np.float32)
        uv = np.zeros((P, 2), dtype=np.float32)
        si = np.ones(P, dtype=np.float32)
        av = np.zeros(P, dtype=bool)
        take = min(len(assoc_kp), P)
        kps = assoc_kp[:take]
        pts[:take] = self.map.mp_pos[feats.mp[kps]]
        uv[:take] = feats.xy[kps]
        si[:take] = 1.0 / (trk.SCALE_FACTOR ** feats.level[kps])
        av[:take] = True
        Tcw_f, inl_f, n_in2 = ba.pose_optimization(
            jnp.asarray(Tcw_np), jnp.asarray(self.K), jnp.asarray(pts),
            jnp.asarray(uv), jnp.asarray(si), jnp.asarray(av),
        )
        n_in2 = int(n_in2)
        if n_in2 < cfg.min_inliers_local:
            return False
        inl_f = np.array(inl_f)
        bad = kps[~inl_f[:take]]
        feats.mp[bad] = -1
        return self._finish_tracked_frame(feats, np.array(Tcw_f),
                                          np.array(visible), n_in2)

    def _pnp_on_matches(self, feats, cand, raw_match):
        """PnP-RANSAC over (map point -> keypoint) matches."""
        from . import pnp

        matched = raw_match >= 0
        if matched.sum() < 10:
            return False, None, None, 0
        kp_sel = np.clip(raw_match, 0, None)
        uv = feats.xy[kp_sel].astype(np.float32)
        samples = pnp.make_pnp_samples(matched, n_ransac=128, seed=self.frame_id)
        Tcw, inlier, n_in = pnp.pnp_ransac(
            jnp.asarray(self.map.mp_pos[cand]), jnp.asarray(uv),
            jnp.asarray(matched), jnp.asarray(self.K), jnp.asarray(samples),
        )
        n_in = int(n_in)
        inlier = np.array(inlier)
        mp_to_kp = np.where(inlier & matched, raw_match, -1)
        return True, Tcw, jnp.asarray(mp_to_kp), n_in

    def _track_reference_kf(self, feats, Tcw_pred):
        """Window-free descriptor match against the reference keyframe's
        map points + robust pose LM (TrackReferenceKeyFrame)."""
        m = self.map
        if self.ref_kf < 0:
            return False, None, None, None, 0
        ref_mp = m.kf_kp_mp[self.ref_kf]
        sel = np.where(ref_mp >= 0)[0]
        ids = ref_mp[sel]
        ids = ids[m.mp_valid[ids]]
        if len(ids) < 10:
            return False, None, None, None, 0
        M = 1024
        ids = _select_best(ids, m.mp_nobs[ids].astype(np.float64), M,
                           "ref-KF candidates")
        cand = np.zeros(M, dtype=np.int64)
        mvalid = np.zeros(M, dtype=bool)
        take = min(len(ids), M)
        cand[:take] = ids[:take]
        mvalid[:take] = True
        fd = feats.dev or {}
        d = matching.hamming_matrix(
            jnp.asarray(m.mp_desc[cand]), fd.get("desc", feats.desc),
            jnp.asarray(mvalid), fd.get("valid", feats.valid),
        )
        idx, _ = matching.match_mutual_ratio(d, max_dist=matching.TH_LOW, ratio=0.85,
                                             mutual=True)
        idx = np.array(idx)
        matched = idx >= 0
        if matched.sum() < self.cfg.min_inliers_track:
            return False, None, None, None, 0
        kp_sel = np.clip(idx, 0, None)
        uv = feats.xy[kp_sel].astype(np.float32)
        si = (1.0 / trk.SCALE_FACTOR ** feats.level[kp_sel]).astype(np.float32)
        Tcw, inlier, n_in = ba.pose_optimization(
            jnp.asarray(Tcw_pred), jnp.asarray(self.K),
            jnp.asarray(m.mp_pos[cand]), jnp.asarray(uv), jnp.asarray(si),
            jnp.asarray(matched),
        )
        n_in = int(n_in)
        if n_in < self.cfg.min_inliers_track:
            return False, None, None, None, 0
        mp_to_kp = jnp.where(jnp.asarray(np.array(inlier)), jnp.asarray(idx), -1)
        return True, Tcw, mp_to_kp, cand, n_in

    def _relocalize(self, feats):
        """Tracking::Relocalization (Tracking.cc:2876): first try the
        keyframe database's place-recognition candidates (matching against
        one candidate KF's map points — the DetectRelocalizationCandidates
        path), then fall back to brute-force against the whole map."""
        from . import loop_closing as lc

        m = self.map
        sig = lc.keyframe_signature(feats.desc, feats.valid)
        covis = lambda k: (np.where(m.covisibility_counts(k) >= 15)[0]
                           if m.kf_valid[k] else ())
        for kf_cand in self.loop_detector.detect_relocalization(
                sig, covis_groups=covis):
            if not m.kf_valid[kf_cand]:
                continue
            ref_mp = m.kf_kp_mp[kf_cand]
            ids = np.unique(ref_mp[ref_mp >= 0])
            ids = ids[m.mp_valid[ids]]
            if len(ids) >= 20 and self._pnp_reloc_against(feats, ids):
                logger.info("relocalized against KF %d (database candidate)",
                            kf_cand)
                return True
        ids = m.mp_ids()
        if len(ids) < 20:
            return False
        return self._pnp_reloc_against(feats, ids)

    def _pnp_reloc_against(self, feats, ids, cap=2048):
        """Descriptor match + PnP-RANSAC against a candidate point set."""
        from . import pnp

        m = self.map
        M = cap
        ids = _select_best(ids, m.mp_nobs[ids].astype(np.float64), M,
                           "relocalization candidates")
        cand = np.zeros(M, dtype=np.int64)
        mvalid = np.zeros(M, dtype=bool)
        take = min(len(ids), M)
        cand[:take] = ids[:take]
        mvalid[:take] = True
        fd = feats.dev or {}
        d = matching.hamming_matrix(
            jnp.asarray(m.mp_desc[cand]), fd.get("desc", feats.desc),
            jnp.asarray(mvalid), fd.get("valid", feats.valid),
        )
        idx, _ = matching.match_mutual_ratio(d, max_dist=64, ratio=0.9, mutual=True)
        idx = np.array(idx)
        matched = idx >= 0
        if matched.sum() < 15:
            return False
        kp_sel = np.clip(idx, 0, None)
        uv = feats.xy[kp_sel].astype(np.float32)
        samples = pnp.make_pnp_samples(matched, n_ransac=128, seed=self.frame_id)
        Tcw, inlier, n_in = pnp.pnp_ransac(
            jnp.asarray(m.mp_pos[cand]), jnp.asarray(uv), jnp.asarray(matched),
            jnp.asarray(self.K), jnp.asarray(samples),
        )
        n_in = int(n_in)
        # relocalization accepts only a STRONG pose (nGood > 50,
        # Tracking::Relocalization, Tracking.cc:2958-2997): a weakly
        # supported PnP fit here teleports the tracker and poisons the
        # motion model for several frames
        if n_in < max(50, self.cfg.min_inliers_track):
            return False
        inlier = np.array(inlier)
        feats.mp = np.full(len(feats.valid), -1, dtype=np.int32)
        good = matched & inlier
        feats.mp[kp_sel[good]] = cand[good]
        self.last_Tcw = np.array(Tcw)
        self.velocity = np.eye(4, dtype=np.float32)
        self.tracked_inliers = n_in
        self.last_frame = feats
        return True

    # ------------------------------------------------------------------
    # keyframe policy + local mapping (inline)
    # ------------------------------------------------------------------
    # nMinObs relaxation while the map is young, for modes whose first
    # frames carry non-triangulated depth anchors (object-depth /
    # truth-depth mono init): Tracking.cc:1437-1445 drops nMinObs to 1 for
    # the first ~20 keyframes so keyframe insertion isn't starved before
    # points mature. None = reference default (3, or 2 for tiny maps).
    _young_kf_min_obs = None

    def _kf_map_ratio(self, feats):
        """Stereo/RGBD close-point map ratio (Tracking.cc:1452-1479):
        nMap/nTotal over keypoints with valid close depth — how much of the
        potential depth-backed map already exists. Mono has no VO-depth
        notion (nMap=nTotal=1, :1475-1479): returns None."""
        return None

    def _need_new_keyframe(self, fid=None, feats=None):
        cfg = self.cfg
        fid = self.frame_id if fid is None else fid
        since = fid - self.last_kf_frame_id
        if since < 1:
            return False
        # nRefMatches counts the reference KF's points with >= 3 observations
        # (TrackedMapPoints(nMinObs), Tracking::NeedNewKeyFrame + KeyFrame.cc:
        # 536-556) — NOT every association: freshly triangulated 2-obs points
        # would otherwise inflate the baseline and fire a keyframe every
        # frame, collapsing triangulation baselines and swamping mapping.
        min_obs = 3 if len(self.map.kf_ids()) > 2 else 2
        if self._young_kf_min_obs is not None and self.map.kf_seq < 20:
            min_obs = self._young_kf_min_obs
        if self.ref_kf >= 0:
            mp = self.map.kf_kp_mp[self.ref_kf]
            ids = mp[mp >= 0]
            ids = ids[self.map.mp_valid[ids]]
            ref_tracked = int((self.map.mp_nobs[ids] >= min_obs).sum())
        else:
            ref_tracked = 0
        if ref_tracked == 0:
            # reference keyframe gone (culled/evicted) — re-anchor now
            return self.tracked_inliers > 15
        inl = self.tracked_inliers
        # c2 (Tracking.cc:1507-1509): few tracked points vs the reference
        # KF, or (stereo/RGBD) a low close-map ratio — lots of depth-backed
        # points could be created by inserting now
        weak_ref = inl < cfg.new_kf_ref_ratio * max(ref_tracked, 1)
        ratio_map = self._kf_map_ratio(feats)
        if ratio_map is not None:
            th_map = 0.20 if inl > 300 else 0.35
            weak_ref = weak_ref or ratio_map < th_map
        # with inline (always-idle) mapping c1b is always satisfied
        # (mMinFrames=0, Tracking.cc:1503-1504), so the gate is c2 plus our
        # max-frames forcing hatch
        need = since >= cfg.new_kf_max_frames or (weak_ref and inl > 15)
        return bool(need)

    def reset(self):
        """System::Reset -> Tracking::Reset (System.cc:279, Tracking.cc:3037):
        wipe the map and the loop database; tracking re-initializes on the
        next frame. Recorded trajectories are kept — stale keyframe
        references in the relative list degrade gracefully to the
        as-tracked poses in final_trajectory()."""
        from .loop_closing import LoopDetector

        logger.warning("system reset: clearing map (%d KFs, %d points)",
                       len(self.map.kf_ids()), int(self.map.mp_valid.sum()))
        if self._pending is not None:
            # an in-flight frame was dispatched against the map being wiped;
            # record it as untracked rather than resolving it
            self.trajectory.append((self._pending["fid"], None))
            self._pending = None
        self._pending_ba = None  # its keyframes are being wiped
        self.map.clear()
        self.state = "NOT_INITIALIZED"
        self.init_frame = None
        self.last_frame = None
        self.last_Tcw = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self.tracked_inliers = 0
        self.loop_detector = LoopDetector(min_gap_kfs=self.cfg.loop_min_gap_kfs)
        self.loop_edges = []
        self._last_rel = None
        # drop stale device counter deltas along with the map
        self._mirror.vis_acc = None
        self._mirror.found_acc = None
        self._bump_map()

    def _evict_one_kf(self):
        """Keyframe-capacity fallback: drop the valid keyframe least
        covisible with the reference (never the reference or the newest
        two) so long runs degrade to a bounded-window map instead of
        crashing. The reference never hits this (heap-allocated graph);
        fixed-capacity arrays need an explicit policy."""
        m = self.map
        # rank by TIME (kf_frame_id): slot recycling breaks slot-order ==
        # temporal order, and eviction must never take a recent keyframe
        kfs = sorted((int(i) for i in m.kf_ids()),
                     key=lambda i: int(m.kf_frame_id[i]))
        protect = {int(self.ref_kf)} | set(kfs[-2:])
        cands = [k for k in kfs if k not in protect]
        if not cands:
            return False
        counts = (m.covisibility_counts(self.ref_kf) if self.ref_kf >= 0
                  else np.zeros(m.max_kf, dtype=np.int32))
        victim = min(cands, key=lambda k: (int(counts[k]), -k))
        logger.warning("keyframe capacity exhausted; evicting KF %d "
                       "(covis %d with ref)", victim, int(counts[victim]))
        m.erase_kf(victim)
        self.loop_detector.remove(victim)
        return True

    def _insert_keyframe_raw(self, feats, Tcw, frame_id):
        k = self.map.alloc_kf()
        if k < 0:
            if not self._evict_one_kf():
                raise RuntimeError("keyframe capacity exhausted and nothing "
                                   "evictable (max_kf too small)")
            k = self.map.alloc_kf()
        m = self.map
        m.kf_tcw[k] = Tcw
        m.kf_valid[k] = True
        m.kf_frame_id[k] = frame_id
        n = len(feats.valid)
        m.kf_kp_xy[k, :n] = feats.xy
        m.kf_kp_level[k, :n] = feats.level
        m.kf_kp_angle[k, :n] = feats.angle
        m.kf_kp_desc[k, :n] = feats.desc
        m.kf_kp_valid[k, :n] = feats.valid
        m.kf_kp_mp[k] = -1
        return k

    def _create_keyframe(self, feats, fid=None):
        cfg = self.cfg
        fid = self.frame_id if fid is None else fid
        t_kf0 = time.perf_counter()
        # overlap the two host-bound downloads the step needs up front:
        # the counter deltas (folded BEFORE culling reads the ratios or
        # slot recycling invalidates them) and the frame's packed features
        if feats.dev is not None and "packed" in feats.dev:
            try:
                feats.dev["packed"].copy_to_host_async()
            except Exception:
                pass
        # fold the PREVIOUS keyframe's in-flight local BA in first: slot
        # recycling below would orphan its results
        with profiler.span("kf.ba_fold"):
            self._apply_pending_map()
        # start the counter-delta download now; it rides the tunnel while
        # the triangulation/fusion programs dispatch and execute
        counters_pending = self._mirror.sync_counters_dispatch()
        k = self._insert_keyframe_raw(feats, self.last_Tcw, fid)
        self.map.kf_kp_mp[k, : len(feats.mp)] = feats.mp
        obs = feats.mp >= 0
        self.map.mp_nobs[feats.mp[obs]] += 1
        # refresh stored descriptors/levels of re-observed points to THIS
        # keyframe's view (ComputeDistinctiveDescriptors analog, MapPoint.cc
        # :191-244 — the reference picks the median-distance descriptor over
        # all observations; the latest view is the cheap recency-weighted
        # stand-in). Without this, creation-time descriptors decorrelate as
        # the viewpoint moves and per-frame matching decays over time.
        # Refresh ONLY when the new view is Hamming-near the stored one
        # (<= TH_HIGH): one wrong association that slipped through inlier
        # gating must not overwrite the point's identity for good — the
        # reference's median-over-observations pick is robust to a single
        # bad observation, this gate is the O(1)-state equivalent.
        kp_idx = np.where(obs)[0]
        ids = feats.mp[kp_idx]
        live = self.map.mp_valid[ids]
        kp_live, id_live = kp_idx[live], ids[live]
        xor = (self.map.mp_desc[id_live] ^ feats.desc[kp_live]).view(np.uint8)
        hamm = np.unpackbits(xor, axis=1).sum(axis=1)
        near = hamm <= matching.TH_HIGH
        self.map.mp_desc[id_live[near]] = feats.desc[kp_live[near]]
        self.map.mp_level[id_live[near]] = feats.level[kp_live[near]]
        self.ref_kf = k
        self.last_kf_frame_id = fid

        # --- local mapping inline (RunMappingIteration)
        # dispatch triangulation + neighbor fusion TOGETHER, then block on
        # both results at once: one overlapped tunnel round trip instead of
        # two sequential ones. Fusion therefore projects the PRE-
        # triangulation candidate set — equivalent, because points
        # triangulated at this keyframe are created with both observations
        # already attached (SearchInNeighbors would find nothing new).
        with profiler.span("kf.tri_fuse_dispatch"):
            tri = self._triangulate_new_dispatch(k)
            fuse = self._fuse_neighbors_dispatch(k)
        for pend in (tri, fuse):
            if pend is not None:
                try:
                    pend[0].copy_to_host_async()
                except Exception:
                    pass
        # consume the counter deltas (their download overlapped the device
        # work above) BEFORE culling reads the found/visible ratios
        with profiler.span("kf.counters"):
            self._mirror.sync_counters_apply(self.map, counters_pending)
        self._cull_map_points(k)
        with profiler.span("kf.tri_fuse_apply"):
            self._triangulate_new_apply(k, tri)
            self._fuse_neighbors_apply(k, fuse)
        counts = self.map.covisibility_counts(k)
        order = np.argsort(-counts)
        local = [k] + [int(i) for i in order[: cfg.local_ba_kfs - 1] if counts[i] >= 15]
        # fixed ring = every keyframe that OBSERVES a local point but is
        # not itself local (Optimizer.cc:840-870 lFixedCameras). Choosing
        # the fixed set any other way (e.g. oldest slots) can leave the
        # local window without a single co-observing anchor — the mono
        # gauge then leaks and local BA drifts the map scale mid-run.
        m = self.map
        loc_mp = np.unique(np.concatenate(
            [m.kf_kp_mp[kf][m.kf_kp_mp[kf] >= 0] for kf in local]))
        loc_mp = loc_mp[m.mp_valid[loc_mp]]
        if len(loc_mp):
            obs_kf, _, _ = m.observations_of(loc_mp)
            fixed = [int(i) for i in np.unique(obs_kf) if i not in local]
        else:
            fixed = []
        # the OLDEST keyframe is always fixed, even when covisible/local
        # (Optimizer.cc:806-838 pKF->mnId==0 vertices are set fixed): the
        # gauge must anchor to the SAME old camera across events — falling
        # back to fixing the newest pose re-gauges the map around the
        # least-certain estimate and random-walks the mono scale per KF
        oldest = min((int(i) for i in m.kf_ids()),
                     key=lambda i: int(m.kf_frame_id[i]))
        if oldest not in fixed:
            fixed.append(oldest)
        # the solve stays IN FLIGHT until the next mapping event — tracking
        # continues on the pre-BA map meanwhile, exactly like the
        # reference's async mapping thread
        with profiler.span("kf.ba_dispatch"):
            self._pending_ba = self._local_ba_dispatch(local, fixed=fixed)
        with profiler.span("kf.cull_refresh"):
            self._cull_keyframes()
            self._refresh_mp_geometry(self.map.mp_ids())

        # keyframe database insert (relocalization + loop candidates)
        with profiler.span("kf.loop"):
            self.loop_detector.add(k, self.map.kf_kp_desc[k],
                                   self.map.kf_kp_valid[k])
            # --- loop closing (LoopClosing::Run, gated enable_loop_closing)
            if cfg.enable_loop_closing:
                self._try_close_loop(k, counts)
        # fold the local BA dispatched above as soon as the device reports
        # it done: track() polls with only_if_ready=True every frame, so
        # staleness is bounded to ~a frame — the same overlap the
        # reference's asynchronous mapping thread provides (System.cc:
        # 104-117). Blocking here would serialize the solve + a tunnel
        # round trip into every keyframe's wall time.
        self._apply_pending_map(only_if_ready=True)
        if profiler._enabled:
            profiler._records["kf.total"].append(time.perf_counter() - t_kf0)

    def _try_close_loop(self, k, covis_counts):
        """DetectLoop -> verify Sim3 -> CorrectLoop (essential graph with
        covisibility + past loop edges) -> SearchAndFuse -> global BA
        (LoopClosing::Run + RunGlobalBundleAdjustment, inline)."""
        from . import loop_closing as lc

        m = self.map
        covisible = [int(i) for i in np.where(covis_counts >= 15)[0]]
        for cand in self.loop_detector.detect(k, covisible)[:3]:
            if not m.kf_valid[cand]:
                continue
            ver = lc.verify_loop_sim3(m, k, cand, K=self.K, seed=self.frame_id)
            if ver is None:
                continue
            s, R, t, n_in = ver
            # the correction rewrites poses map-wide; a stale in-flight BA
            # applied afterwards would clobber it
            self._apply_pending_map()
            corrections = lc.correct_loop(
                m, loop_kf=k, matched_kf=cand, sim3_correction=(s, R, t),
                covis_theta=self.cfg.loop_covis_theta,
                extra_loop_edges=self.loop_edges,
            )
            self._on_loop_corrected(corrections)
            self.loop_edges.append((int(cand), int(k)))
            self._search_and_fuse_loop(k, cand)
            if self.cfg.loop_global_ba:
                # global BA refines keyframe poses AGAIN after the Sim3
                # correction; world-frame extras (object landmarks) must
                # ride that second move too, or they stay anchored to the
                # pre-GBA poses
                pre_gba = {int(kf): m.kf_tcw[kf].astype(np.float64).copy()
                           for kf in m.kf_ids()}
                self.global_ba()
                self._on_loop_corrected({
                    kf: (m.kf_tcw[kf].astype(np.float64), old, 1.0)
                    for kf, old in pre_gba.items()
                    if m.kf_valid[kf]
                    and not np.allclose(m.kf_tcw[kf], old, atol=1e-7)})
            self.last_Tcw = m.kf_tcw[k].copy()
            self.velocity = np.eye(4, dtype=np.float32)
            self.loops_closed += 1
            logger.info("loop closed: KF %d -> KF %d (%d Sim3 inliers)",
                        k, cand, n_in)
            break

    def _on_loop_corrected(self, corrections):
        """Hook: a loop correction rewrote keyframe poses + map points.
        `corrections`: kf -> (new_Tcw, old_Tcw, sim3_scale). Subclasses
        carrying additional world-frame state (object landmarks) re-anchor
        it here; the base tracker has nothing else to move."""

    def _search_and_fuse_loop(self, k, matched_kf, radius=4.0):
        """SearchAndFuse (LoopClosing.cc:536-580): after correction, project
        the matched side's map points into the current keyframe and merge
        duplicates (the drift created doubled geometry)."""
        m = self.map
        loop_mp = m.kf_kp_mp[matched_kf]
        ids = np.unique(loop_mp[loop_mp >= 0])
        ids = ids[m.mp_valid[ids]]
        if len(ids) == 0:
            return
        M = 1024
        ids = _select_best(ids, m.mp_nobs[ids].astype(np.float64), M,
                           "loop fuse candidates")
        cand = np.zeros(M, dtype=np.int64)
        mvalid = np.zeros(M, dtype=bool)
        take = min(len(ids), M)
        cand[:take] = ids[:take]
        mvalid[:take] = True
        mp_to_kp, _ = trk.search_local_points(
            jnp.asarray(m.kf_tcw[k]), jnp.asarray(self.K),
            jnp.asarray(m.mp_pos[cand]), jnp.asarray(m.mp_desc[cand]),
            jnp.asarray(m.mp_level[cand]), jnp.asarray(mvalid),
            jnp.asarray(m.mp_normal[cand]), jnp.asarray(m.mp_min_dist[cand]),
            jnp.asarray(m.mp_max_dist[cand]),
            jnp.asarray(m.kf_kp_xy[k]), jnp.asarray(m.kf_kp_desc[k]),
            jnp.asarray(m.kf_kp_level[k]), jnp.asarray(m.kf_kp_valid[k]),
            jnp.zeros(m.n_kp, dtype=bool),
            jnp.asarray(self.img_wh), jnp.float32(radius),
            n_levels=self.cfg.n_levels,
        )
        mp_to_kp = np.array(mp_to_kp)
        sel = np.where(mp_to_kp >= 0)[0]
        for i in sel:
            mp = int(cand[i])
            kp = int(mp_to_kp[i])
            existing = int(m.kf_kp_mp[k, kp])
            if existing < 0:
                m.kf_kp_mp[k, kp] = mp
                m.mp_nobs[mp] += 1
            elif existing != mp and m.mp_valid[existing] and m.mp_valid[mp]:
                # loop-side point replaces the drifted duplicate (the
                # reference's Fuse prefers the loop map point)
                m.replace_mp(existing, mp)

    def _cull_map_points(self, new_kf):
        """MapPointCulling (LocalMapping.cc:249-318): the found/visible
        ratio and min-observation tests apply ONLY to points still in their
        creation probation window (the reference iterates
        mlpRecentAddedMapPoints — points within ~3 keyframes of creation).
        Applying the ratio test to the whole map every keyframe erases the
        MATURE map from under the tracker: with a bounded per-frame
        candidate set, in-frustum points legitimately go unmatched for a
        few frames, accumulate visible-without-found, and would be wrongly
        culled — the map then evaporates after ~15 frames."""
        m = self.map
        age = m.kf_seq - m.mp_birth  # in keyframes
        recent = m.mp_valid & (age <= 3)
        ratio = m.mp_found / np.maximum(m.mp_visible, 1)
        bad = recent & (
            ((m.mp_visible >= 4) & (ratio < 0.25))
            | ((age >= 2) & (m.mp_nobs <= 2))
        )
        if bad.any():
            m.erase_mp(np.where(bad)[0])

    def _triangulate_new(self, k):
        """Synchronous wrapper (initialization path); the keyframe step
        uses the dispatch/apply halves to overlap the download with the
        neighbor-fusion program's."""
        pend = self._triangulate_new_dispatch(k)
        self._triangulate_new_apply(k, pend)
        self._refresh_mp_geometry(self.map.mp_ids())

    def _triangulate_new_dispatch(self, k):
        cfg = self.cfg
        m = self.map
        counts = m.covisibility_counts(k)
        order = [int(i) for i in np.argsort(-counts) if counts[i] >= 10]
        neighbors = order[: cfg.triangulate_neighbors]
        free_k = m.kf_kp_valid[k] & (m.kf_kp_mp[k] < 0)
        neighbors = [nb for nb in neighbors
                     if (m.kf_kp_valid[nb] & (m.kf_kp_mp[nb] < 0)).sum() >= 5]
        # mono baseline gate (LocalMapping.cc:389-398): triangulating across
        # a baseline under 1% of the median scene depth produces points with
        # unbounded depth error that poison tracking — skip those neighbors.
        mp = m.kf_kp_mp[k]
        ids = mp[mp >= 0]
        ids = ids[m.mp_valid[ids]]
        if len(ids) >= 10:
            Tcw_k = m.kf_tcw[k]
            z = (m.mp_pos[ids] @ Tcw_k[:3, :3].T + Tcw_k[:3, 3])[:, 2]
            med_depth = float(np.median(z[z > 0])) if (z > 0).any() else 0.0
            if med_depth > 0:
                ck = -(Tcw_k[:3, :3].T @ Tcw_k[:3, 3])
                def _baseline(nb):
                    Tn = m.kf_tcw[nb]
                    return float(np.linalg.norm(
                        -(Tn[:3, :3].T @ Tn[:3, 3]) - ck))
                neighbors = [nb for nb in neighbors
                             if _baseline(nb) / med_depth >= 0.01]
        if not neighbors or free_k.sum() < 5:
            return None

        # ONE batched program for all neighbor baselines (padded to the
        # config's neighbor count so the compile is reused); per-neighbor
        # results are applied sequentially on host, re-checking free_k so a
        # keypoint triangulated against an earlier neighbor isn't duplicated
        NB = cfg.triangulate_neighbors
        Tcw2 = np.stack([m.kf_tcw[nb] for nb in neighbors]
                        + [np.eye(4, dtype=np.float32)] * (NB - len(neighbors)))
        pad = np.zeros((NB - len(neighbors), m.n_kp), dtype=bool)
        free_nb = np.concatenate(
            [np.stack([m.kf_kp_valid[nb] & (m.kf_kp_mp[nb] < 0)
                       for nb in neighbors]), pad]) if len(neighbors) < NB \
            else np.stack([m.kf_kp_valid[nb] & (m.kf_kp_mp[nb] < 0)
                           for nb in neighbors])
        stack = lambda arr: np.concatenate(
            [np.stack([arr[nb] for nb in neighbors]),
             np.zeros((NB - len(neighbors),) + arr.shape[1:], arr.dtype)]) \
            if len(neighbors) < NB else np.stack([arr[nb] for nb in neighbors])

        N = m.n_kp
        buf = hostpack.pack_host([
            m.kf_tcw[k], Tcw2, m.kf_kp_xy[k], m.kf_kp_desc[k],
            m.kf_kp_level[k], free_k,
            stack(m.kf_kp_xy), stack(m.kf_kp_desc), stack(m.kf_kp_level),
            free_nb, m.kf_kp_angle[k], stack(m.kf_kp_angle)])
        dev_out = _triangulate_packed(jnp.asarray(buf), self._K_dev,
                                      NB=NB, N=N)
        return dev_out, neighbors, NB, N

    def _triangulate_new_apply(self, k, pend):
        if pend is None:
            return
        dev_out, neighbors, NB, N = pend
        m = self.map
        free_k = m.kf_kp_valid[k] & (m.kf_kp_mp[k] < 0)
        out = np.array(dev_out)
        o1 = NB * N * 3
        o2 = o1 + NB * N
        X_s = out[:o1].reshape(NB, N, 3)
        m12_s = out[o1:o2].reshape(NB, N).astype(np.int32)
        ok_s = out[o2:].reshape(NB, N) > 0.5
        # cross-neighbor agreement: a keypoint triangulated against two or
        # more neighbors must yield the SAME 3D point. Disagreement means
        # at least one epipolar match was wrong (wrong matches triangulate
        # self-consistently per pair, so no per-pair test can catch them)
        # — reject the keypoint outright. The reference gets an equivalent
        # effect from projecting each new point into all covisible KFs at
        # fusion time (LocalMapping.cc:655-831).
        n_ok = ok_s[: len(neighbors)].sum(0)
        multi = n_ok >= 2
        if multi.any():
            Tk = m.kf_tcw[k]
            sel = np.where(multi)[0]
            Xm = X_s[: len(neighbors), sel]           # (nb, S, 3)
            okm = ok_s[: len(neighbors), sel]         # (nb, S)
            zk = (Xm @ Tk[:3, :3].T + Tk[:3, 3])[..., 2]
            wsum = np.where(okm, 1.0, 0.0)
            mean = (Xm * okm[..., None]).sum(0) / wsum.sum(0)[:, None]
            spread = np.sqrt(
                ((np.linalg.norm(Xm - mean[None], axis=2) ** 2) * okm).sum(0)
                / wsum.sum(0))
            med_z = np.where(okm, zk, np.nan)
            zref = np.nanmedian(med_z, axis=0)
            bad = spread > 0.05 * np.maximum(np.abs(zref), 1e-6)
            ok_s[:, sel[bad]] = False
        for i, nb in enumerate(neighbors):
            ok = ok_s[i] & free_k
            sel = np.where(ok)[0]
            if len(sel) == 0:
                continue
            ids = m.alloc_mps(len(sel))
            if len(ids) == 0:
                logger.warning("map-point capacity exhausted; skipping "
                               "triangulation for KF %d", k)
                break
            sel = sel[: len(ids)]
            m.mp_pos[ids] = X_s[i, sel]
            m.mp_valid[ids] = True
            m.mp_desc[ids] = m.kf_kp_desc[k, sel]
            m.mp_level[ids] = m.kf_kp_level[k, sel]
            m.mp_first_kf[ids] = k
            m.mp_nobs[ids] = 2
            m.mp_visible[ids] = 1
            m.mp_found[ids] = 1
            m.kf_kp_mp[k, sel] = ids
            m.kf_kp_mp[nb, m12_s[i, sel]] = ids
            free_k = m.kf_kp_valid[k] & (m.kf_kp_mp[k] < 0)

    def _fuse_neighbors(self, k, n_neighbors=2):
        pend = self._fuse_neighbors_dispatch(k, n_neighbors)
        self._fuse_neighbors_apply(k, pend)

    def _fuse_neighbors_dispatch(self, k, n_neighbors=2):
        """SearchInNeighbors (LocalMapping.cc:655-831): project this KF's map
        points into covisible neighbors; unmatched keypoints gain an
        observation, conflicting associations merge into the better point."""
        m = self.map
        counts = m.covisibility_counts(k)
        order = [int(i) for i in np.argsort(-counts) if counts[i] >= 10][:n_neighbors]
        my_mp = m.kf_kp_mp[k]
        ids = np.unique(my_mp[my_mp >= 0])
        ids = ids[m.mp_valid[ids]]
        if len(ids) == 0:
            return None
        M = 1024
        cand = np.zeros(M, dtype=np.int64)
        mvalid = np.zeros(M, dtype=bool)
        take = min(len(ids), M)
        cand[:take] = ids[:take]
        mvalid[:take] = True
        if not order:
            return None
        # pad to a fixed neighbor count so the batched program's compile is
        # reused; padded slots project with an identity pose but carry
        # all-False keypoint validity -> no matches
        NN = n_neighbors
        nbs = order + [order[-1]] * (NN - len(order))
        pad_valid = np.stack(
            [m.kf_kp_valid[nb] if i < len(order) else
             np.zeros(m.n_kp, dtype=bool) for i, nb in enumerate(nbs)])
        buf = hostpack.pack_host([
            np.stack([m.kf_tcw[nb] for nb in nbs]),
            m.mp_pos[cand], m.mp_desc[cand], m.mp_level[cand], mvalid,
            m.mp_normal[cand], m.mp_min_dist[cand], m.mp_max_dist[cand],
            np.stack([m.kf_kp_xy[nb] for nb in nbs]),
            np.stack([m.kf_kp_desc[nb] for nb in nbs]),
            np.stack([m.kf_kp_level[nb] for nb in nbs]),
            pad_valid])
        dev_out = _fuse_packed(
            jnp.asarray(buf), self._K_dev, self._img_wh_dev,
            NN=NN, M=M, N=m.n_kp, n_levels=self.cfg.n_levels)
        return dev_out, order, cand

    def _fuse_neighbors_apply(self, k, pend):
        if pend is None:
            return
        dev_out, order, cand = pend
        m = self.map
        mp_to_kp_s = np.array(dev_out)
        for i, nb in enumerate(order):
            mp_to_kp = mp_to_kp_s[i]
            sel = np.where(mp_to_kp >= 0)[0]
            if len(sel) == 0:
                continue
            kps = mp_to_kp[sel]
            mps = cand[sel].astype(np.int32)
            # one match per keypoint (first wins, mirroring the loop order)
            _, uniq_first = np.unique(kps, return_index=True)
            kps, mps = kps[uniq_first], mps[uniq_first]
            existing = m.kf_kp_mp[nb, kps]

            fresh = existing < 0
            m.kf_kp_mp[nb, kps[fresh]] = mps[fresh]
            np.add.at(m.mp_nobs, mps[fresh], 1)

            # conflicts: merge ONLY when the two points coincide in 3D — on
            # repetitive texture a descriptor+window match alone merges
            # aliases and corrupts the map
            conflict = (~fresh) & (existing != mps) & m.mp_valid[np.clip(existing, 0, None)]
            if not conflict.any():
                continue
            cm, ce = mps[conflict], existing[conflict]
            cam = np_geo.inv_T(m.kf_tcw[nb])[:3, 3]
            d3 = np.linalg.norm(m.mp_pos[cm] - m.mp_pos[ce], axis=1)
            depth = np.maximum(np.linalg.norm(m.mp_pos[cm] - cam, axis=1), 1e-6)
            for mp, ex in zip(cm[d3 < 0.05 * depth], ce[d3 < 0.05 * depth]):
                if not (m.mp_valid[mp] and m.mp_valid[ex]):
                    continue
                keep, drop = (mp, ex) if m.mp_nobs[mp] >= m.mp_nobs[ex] else (ex, mp)
                m.replace_mp(int(drop), int(keep))

    def _refresh_mp_geometry(self, ids):
        """UpdateNormalAndDepth analog: viewing normal from the mean of
        observing-KF directions; scale-distance bounds from the reference
        octave (MapPoint.cc:UpdateNormalAndDepth). Fully vectorized over
        observations (np.add.at / bincount) — no per-observation Python."""
        m = self.map
        if len(ids) == 0:
            return
        kf_idx, kp_idx, mp_idx = m.observations_of(ids)
        if len(kf_idx) == 0:
            return
        # camera centers for ALL keyframe slots: c = -R^T t
        Rk = m.kf_tcw[:, :3, :3]
        tk = m.kf_tcw[:, :3, 3]
        centers = -np.einsum("kji,kj->ki", Rk, tk)

        # accumulate unit viewing directions per map point
        v = m.mp_pos[mp_idx] - centers[kf_idx]
        nrm = np.linalg.norm(v, axis=1)
        good = nrm > 1e-9
        v = v[good] / nrm[good, None]
        acc = np.zeros((m.max_mp, 3))
        np.add.at(acc, mp_idx[good], v)
        cnt = np.bincount(mp_idx[good], minlength=m.max_mp)
        upd = np.where(cnt > 0)[0]
        m.mp_normal[upd] = acc[upd] / cnt[upd, None]

        # depth bounds from the first observing keyframe (fall back to any
        # observing KF when first_kf is gone)
        uniq = np.unique(mp_idx)
        ref = m.mp_first_kf[uniq].astype(np.int64)
        first_obs = np.full(m.max_mp, -1, dtype=np.int64)
        # reversed so the FIRST observation in (kf, kp) order wins
        first_obs[mp_idx[::-1]] = kf_idx[::-1]
        use_fallback = (ref < 0) | ~m.kf_valid[np.clip(ref, 0, None)]
        ref = np.where(use_fallback, first_obs[uniq], ref)
        ok = (ref >= 0) & m.kf_valid[np.clip(ref, 0, None)]
        uniq, ref = uniq[ok], ref[ok]
        dist = np.linalg.norm(m.mp_pos[uniq] - centers[ref], axis=1)
        # mfMaxDistance = dist * 1.2^level, mfMinDistance = max / 1.2^(L-1)
        # (MapPoint::UpdateNormalAndDepth) — the 0.8/1.2 frustum slack is
        # applied at the gate, NOT baked in here; PredictScale divides by
        # this unbiased bound, so an extra 1.2 would shift every predicted
        # octave up by one and misplace the projection windows
        m.mp_max_dist[uniq] = dist * (trk.SCALE_FACTOR ** m.mp_level[uniq])
        m.mp_min_dist[uniq] = m.mp_max_dist[uniq] / (
            trk.SCALE_FACTOR ** (self.cfg.n_levels - 1))

    # ------------------------------------------------------------------
    @staticmethod
    def _bucket_pow2(n, lo, hi):
        """Smallest pow2 >= n, clamped to [lo, hi] — pads kernel shapes to a
        handful of buckets so a growing map triggers at most log2(hi/lo)
        recompiles instead of one per size."""
        b = max(lo, 1 << int(np.ceil(np.log2(max(int(n), 1)))))
        return int(min(b, hi))

    def _local_ba(self, local_kfs, fixed, kf_cap=None, pt_cap=None,
                  pin_gauge=True):
        """Synchronous dispatch + apply (global BA, loop closing). The
        keyframe step instead keeps the dispatched solve PENDING and
        applies it at the next mapping event (`_apply_pending_map`) — the
        tracking thread never blocks on the mapping thread's optimization
        in the reference either (LocalMapping runs asynchronously,
        System.cc:104-117)."""
        self._local_ba_apply(self._local_ba_dispatch(
            local_kfs, fixed, kf_cap=kf_cap, pt_cap=pt_cap,
            pin_gauge=pin_gauge))

    def _apply_pending_map(self, only_if_ready=False):
        """Fold the in-flight local BA into the map. Called opportunistically
        at the start of every track() with only_if_ready=True (fold as soon
        as the device finishes — staleness stays bounded to a frame or two),
        and UNCONDITIONALLY at every point where host code reads or rewrites
        optimized state (keyframe step / rescue / flush / loop correction /
        global BA / rescale). Leaving the fold until the next keyframe
        starves tracking of the optimized map and collapses robustness."""
        p = self._pending_ba
        if p is None:
            return
        if only_if_ready:
            try:
                if not p["out"].is_ready():
                    return
            except Exception:
                pass
        self._pending_ba = None
        self._local_ba_apply(p)
        # re-anchor the motion model through the (now BA-corrected)
        # reference keyframe (Tracking::UpdateLastFrame, Tracking.cc:
        # 1180-1192: mLastFrame.SetPose(Tlr * pRefKF->GetPose())). Without
        # this the next prediction carries the PRE-BA gauge against the
        # POST-BA map — a one-frame pose jump at every fold that seeds
        # velocity-feedback divergence on marginal scenes.
        lr = getattr(self, "_last_rel", None)
        if lr is not None:
            ref, ref_fid, T_rel = lr
            if (0 <= ref < self.map.max_kf and self.map.kf_valid[ref]
                    and int(self.map.kf_frame_id[ref]) == ref_fid):
                self.last_Tcw = (T_rel @ self.map.kf_tcw[ref]
                                 .astype(np.float64)).astype(np.float32)
        self._bump_map()

    def _local_ba_dispatch(self, local_kfs, fixed, kf_cap=None, pt_cap=None,
                           pin_gauge=True):
        cfg = self.cfg
        m = self.map
        kfs = list(dict.fromkeys(list(local_kfs) + list(fixed)))
        # points seen by local KFs
        mp_set = np.unique(
            np.concatenate([m.kf_kp_mp[k][m.kf_kp_mp[k] >= 0] for k in local_kfs])
        )
        mp_set = mp_set[m.mp_valid[mp_set]]
        if len(mp_set) == 0:
            return None

        kf_idx, kp_idx, mp_idx = m.observations_of(mp_set)
        keep = np.isin(kf_idx, kfs)
        kf_idx, kp_idx, mp_idx = kf_idx[keep], kp_idx[keep], mp_idx[keep]
        # pow2-bucketed edge capacity sized to the REAL edge count: the
        # reference never drops observations (Optimizer.cc:826-1534), and a
        # fixed cap silently leaves part of the map unoptimized — stale
        # points then decay tracking as poses move away from them. Buckets
        # bound recompiles to log2(range); cfg.max_obs_edges is the floor.
        E = self._bucket_pow2(len(kf_idx), cfg.max_obs_edges,
                              max(cfg.max_obs_edges, m.max_kf * m.n_kp))
        n_e = min(len(kf_idx), E)
        if len(kf_idx) > E:
            logger.warning("local BA: clipping %d -> %d observation edges",
                           len(kf_idx), E)
        # vectorized edge assembly: lookup tables instead of per-edge dicts
        kf_local = np.full(m.max_kf, -1, dtype=np.int32)
        kf_local[np.asarray(kfs)] = np.arange(len(kfs), dtype=np.int32)
        mp_local = np.full(m.max_mp, -1, dtype=np.int32)
        mp_local[mp_set] = np.arange(len(mp_set), dtype=np.int32)
        obs_kf = np.zeros(E, dtype=np.int32)
        obs_pt = np.zeros(E, dtype=np.int32)
        obs_uv = np.zeros((E, 2), dtype=np.float32)
        obs_si = np.ones(E, dtype=np.float32)
        obs_valid = np.zeros(E, dtype=bool)
        obs_z = np.zeros(E, dtype=np.float32)
        obs_z_si = np.zeros(E, dtype=np.float32)
        ke, pe, me = kf_idx[:n_e], kp_idx[:n_e], mp_idx[:n_e]
        obs_kf[:n_e] = kf_local[ke]
        obs_pt[:n_e] = mp_local[me]
        obs_uv[:n_e] = m.kf_kp_xy[ke, pe]
        obs_si[:n_e] = 1.0 / (trk.SCALE_FACTOR ** m.kf_kp_level[ke, pe])
        obs_valid[:n_e] = True
        z = m.kf_kp_depth[ke, pe]
        has_z = z > 0
        obs_z[:n_e] = np.where(has_z, z, 0.0)
        obs_z_si[:n_e] = np.where(has_z, obs_si[:n_e], 0.0)

        # keyframe/point capacities likewise bucket to the real problem size
        # (local windows stay at the 16 floor; global BA grows to the map)
        KF_CAP = (kf_cap if kf_cap is not None
                  else self._bucket_pow2(len(kfs), 16, m.max_kf))
        PT_CAP = (pt_cap if pt_cap is not None
                  else self._bucket_pow2(len(mp_set), 2048, m.max_mp))
        nk = min(len(kfs), KF_CAP)
        npt = min(len(mp_set), PT_CAP)
        if len(kfs) > KF_CAP:
            logger.warning("local BA: clipping %d -> %d keyframes", len(kfs), KF_CAP)
        if len(mp_set) > PT_CAP:
            logger.warning("local BA: clipping %d -> %d points", len(mp_set), PT_CAP)
        kf_tcw = np.tile(np.eye(4, dtype=np.float32), (KF_CAP, 1, 1))
        kf_tcw[:nk] = m.kf_tcw[kfs[:nk]]
        kf_fixed = np.ones(KF_CAP, dtype=bool)
        for i, k in enumerate(kfs[:nk]):
            kf_fixed[i] = k in fixed
        # always anchor at least one camera — the OLDEST in the problem,
        # never the newest (anchoring the freshest pose re-gauges the map
        # around the least-certain estimate, see _create_keyframe)
        if not kf_fixed[:nk].any():
            kf_fixed[int(np.argmin(m.kf_frame_id[kfs[:nk]]))] = True
        # mono scale-gauge handling: with a SINGLE fixed camera the
        # similarity scale (about its center) is a null direction of the
        # reprojection cost, and the damped LM step random-walks along it —
        # measured 1.2-1.3x per solve, compounding into runaway map scale
        # whenever the local window covers every co-observer (young maps,
        # small scenes). FIXING a second camera kills the walk but freezes
        # that camera's full pose error into the map forever — with the
        # two oldest pinned, BA could never repair the init pair's
        # low-parallax warp (measured: a persistent 0.7x translation-scale
        # map no amount of later BA could fix). Instead the solve stays
        # FREE (one fixed camera, the reference's own shape,
        # Optimizer.cc:840-870) and the APPLY step renormalizes the exact
        # gauge direction post-hoc: rescale the solution about the fixed
        # camera so the distance to a reference free camera is preserved
        # (cost-flat, so it cancels the random walk without constraining
        # any observable direction). Depth-carrying problems (stereo/RGBD)
        # have no scale-gauge freedom — the z edges pin it physically.
        gauge = None
        if (obs_z_si[:n_e] > 0).any():
            pin_gauge = False
        if pin_gauge and nk >= 3 and int(kf_fixed[:nk].sum()) == 1:
            i_fix = int(np.where(kf_fixed[:nk])[0][0])
            c_fix = np_geo.inv_T(kf_tcw[i_fix].astype(np.float64))[:3, 3]
            centers = np.stack([np_geo.inv_T(kf_tcw[i].astype(np.float64))[:3, 3]
                                for i in range(nk)])
            d = np.linalg.norm(centers - c_fix, axis=1)
            d[i_fix] = -1.0
            i_ref = int(np.argmax(d))  # widest baseline = best conditioned
            if d[i_ref] > 1e-6:
                gauge = (i_fix, i_ref, float(d[i_ref]))
        pts = np.zeros((PT_CAP, 3), dtype=np.float32)
        pts[:npt] = m.mp_pos[mp_set[:npt]]
        pt_valid = np.zeros(PT_CAP, dtype=bool)
        pt_valid[:npt] = True
        obs_valid &= (obs_kf < nk) & (obs_pt < npt)

        buf = hostpack.pack_host([
            kf_tcw, pts, obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
            kf_fixed, pt_valid, obs_z, obs_z_si])
        dev_out = _local_ba_packed(
            jnp.asarray(buf), self._K_dev, E=E, KF=KF_CAP, PT=PT_CAP,
            num_iters=cfg.local_ba_iters)
        try:
            dev_out.copy_to_host_async()
        except Exception:
            pass
        return dict(
            out=dev_out, kfs=kfs, nk=nk, kf_fixed=kf_fixed, mp_set=mp_set,
            npt=npt, kf_idx=kf_idx[:n_e], kp_idx=kp_idx[:n_e],
            mp_idx=mp_idx[:n_e], obs_valid=obs_valid[:n_e].copy(),
            KF_CAP=KF_CAP, PT_CAP=PT_CAP, gauge=gauge,
            # snapshot frame ids: keyframe culling / eviction may recycle a
            # slot between dispatch and apply — a mismatch means the result
            # belongs to a keyframe that no longer exists
            kf_fids=m.kf_frame_id[np.asarray(kfs)].copy(),
            # same for points: a culled slot re-allocated by a later
            # keyframe's triangulation must NOT receive the dead point's
            # optimized position
            mp_births=m.mp_birth[mp_set].copy(),
        )

    def _local_ba_apply(self, pend):
        if pend is None:
            return
        m = self.map
        out = np.array(pend["out"])
        KF_CAP, PT_CAP = pend["KF_CAP"], pend["PT_CAP"]
        kfs, nk, npt = pend["kfs"], pend["nk"], pend["npt"]
        kf_fixed, mp_set = pend["kf_fixed"], pend["mp_set"]
        o1 = KF_CAP * 16
        o2 = o1 + PT_CAP * 3
        out_tcw = out[:o1].reshape(KF_CAP, 4, 4)
        out_pts = out[o1:o2].reshape(PT_CAP, 3)
        inl = out[o2:] > 0.5
        # post-hoc mono scale-gauge renormalization (see dispatch): rescale
        # the free solution about the fixed camera so the baseline to the
        # reference camera is preserved — removes the LM's random walk
        # along the cost-flat similarity direction without freezing any
        # observable direction
        if pend.get("gauge") is not None:
            i_fix, i_ref, d_before = pend["gauge"]
            c_fix = np_geo.inv_T(out_tcw[i_fix].astype(np.float64))[:3, 3]
            c_ref = np_geo.inv_T(out_tcw[i_ref].astype(np.float64))[:3, 3]
            d_after = float(np.linalg.norm(c_ref - c_fix))
            if d_after > 1e-9:
                s = d_before / d_after
                if abs(s - 1.0) > 1e-6:
                    for i in range(nk):
                        Twc = np_geo.inv_T(out_tcw[i].astype(np.float64))
                        Twc[:3, 3] = (Twc[:3, 3] - c_fix) * s + c_fix
                        out_tcw[i] = np_geo.inv_T(Twc).astype(out_tcw.dtype)
                    out_pts[:npt] = ((out_pts[:npt].astype(np.float64)
                                      - c_fix) * s + c_fix
                                     ).astype(out_pts.dtype)
        for i, k in enumerate(kfs[:nk]):
            if (not kf_fixed[i] and m.kf_valid[k]
                    and m.kf_frame_id[k] == pend["kf_fids"][i]):
                m.kf_tcw[k] = out_tcw[i]
        live = (m.mp_valid[mp_set[:npt]]
                & (m.mp_birth[mp_set[:npt]] == pend["mp_births"][:npt]))
        m.mp_pos[mp_set[:npt][live]] = out_pts[:npt][live]
        # drop observations flagged as outliers (guard: slot still valid
        # and the association unchanged since dispatch)
        bad = pend["obs_valid"] & ~inl[: len(pend["obs_valid"])]
        idx = np.where(bad)[0]
        if len(idx):
            ks, kps, mps = (pend["kf_idx"][idx], pend["kp_idx"][idx],
                            pend["mp_idx"][idx])
            ok = m.kf_valid[ks] & (m.kf_kp_mp[ks, kps] == mps)
            m.kf_kp_mp[ks[ok], kps[ok]] = -1

    def global_ba(self, num_iters=10):
        """GlobalBundleAdjustemnt (Optimizer.cc:57-64): full BA over every
        valid keyframe and map point (first KF fixed). Used after loop
        closure (LoopClosing::RunGlobalBundleAdjustment) or on demand."""
        self._apply_pending_map()
        kfs = [int(k) for k in self.map.kf_ids()]
        if len(kfs) < 2:
            return
        oldest = min(kfs)
        # capacities bucket to the live map inside _local_ba_dispatch —
        # global BA never silently drops keyframes or points. The scale
        # gauge stays FREE here (no second pinned camera): global BA runs
        # after a loop's Sim3/essential-graph correction, whose scale the
        # polish must be allowed to spread across the whole chain
        # (GlobalBundleAdjustemnt fixes only KF0, Optimizer.cc:64-250).
        self._local_ba(kfs, fixed=[oldest], pin_gauge=False)
        self._bump_map()

    def _cull_keyframes(self, keep_latest=2, redundancy=0.9):
        """KeyFrameCulling (LocalMapping.cc:833-966): a keyframe is redundant
        when >=90% of its map points are observed by at least 3 other
        keyframes; redundant KFs are removed (latest few always kept)."""
        m = self.map
        # temporal order (kf_frame_id), NOT slot order: recycled slots put
        # recent keyframes at low slot ids, and culling must never take the
        # reference/newest keyframes
        kfs = sorted((int(k) for k in m.kf_ids()),
                     key=lambda k: int(m.kf_frame_id[k]))
        if len(kfs) <= keep_latest + 2:
            return 0
        removed = 0
        for k in kfs[1:-keep_latest]:  # never the first or the latest
            if k == self.ref_kf:
                continue
            mp = m.kf_kp_mp[k]
            ids = mp[mp >= 0]
            ids = ids[m.mp_valid[ids]]
            if len(ids) == 0:
                continue
            # observation counts from other KFs
            others = m.mp_nobs[ids] - 1
            if (others >= 3).mean() >= redundancy:
                m.erase_kf(k)
                self.loop_detector.remove(k)
                removed += 1
        return removed

    def _record_pose(self, Tcw, fid=None):
        """Store the frame pose relative to the current reference keyframe
        (SaveTrajectoryTUM's mechanism: corrections applied to keyframes
        later — loop closing, scale recovery — propagate to every frame).
        Also remembers the LAST frame's relative pose so `_apply_pending_map`
        can re-anchor the motion model after an async BA fold."""
        fid = self.frame_id if fid is None else fid
        if self.ref_kf >= 0 and self.map.kf_valid[self.ref_kf]:
            T_rel = np.asarray(Tcw, dtype=np.float64) @ np_geo.inv_T(
                self.map.kf_tcw[self.ref_kf].astype(np.float64))
            self._traj_rel.append(
                (fid, int(self.ref_kf),
                 int(self.map.kf_frame_id[self.ref_kf]), T_rel))
            self._last_rel = (int(self.ref_kf),
                              int(self.map.kf_frame_id[self.ref_kf]), T_rel)
        else:
            self._traj_rel.append((fid, -1, -1,
                                   np.asarray(Tcw, dtype=np.float64)))

    def _rescale_traj_rel(self, scale):
        """A map rescale (object-depth anchor / ground-height recovery)
        changes the length unit of every keyframe translation; the stored
        frame-to-reference relative poses are in the same unit and must
        follow, or recomposition mixes scales (the reference rescales
        mlRelativeFramePoses identically, Tracking.cc:2644-2651)."""
        for i, (fid, ref, ref_fid, T_rel) in enumerate(self._traj_rel):
            if ref >= 0:
                T = T_rel.copy()
                T[:3, 3] *= scale
                self._traj_rel[i] = (fid, ref, ref_fid, T)

    # ------------------------------------------------------------------
    def poses(self):
        """List of (frame_id, Tcw or None) for the whole run."""
        self.flush()
        return self.trajectory

    def final_trajectory(self):
        """(frame_id, Tcw or None) RECOMPOSED through the current keyframe
        poses — reflects loop closures and scale recoveries applied after
        the frame was tracked (System::SaveTrajectoryTUM, System.cc:301)."""
        self.flush()
        by_fid = {}
        for fid, ref, ref_fid, T_rel in self._traj_rel:
            if (ref >= 0 and self.map.kf_valid[ref]
                    and int(self.map.kf_frame_id[ref]) == ref_fid):
                by_fid[fid] = (T_rel @ self.map.kf_tcw[ref].astype(np.float64)
                               ).astype(np.float32)
            else:
                by_fid[fid] = None
        out = []
        for fid, T in self.trajectory:
            if T is None:
                out.append((fid, None))
            else:
                rec = by_fid.get(fid)
                out.append((fid, rec if rec is not None else T))
        return out


class RgbdTracker(MonocularTracker):
    """TrackRGBD-equivalent: depth measurements replace two-view bootstrap
    and triangulation (StereoInitialization, Tracking.cc:783-850; depth-based
    map-point creation in CreateNewKeyFrame). Metric scale is inherent."""

    def __init__(self, K, img_wh, config=None, depth_max=8.0, init_Twc=None):
        """init_Twc: optional pose of the FIRST camera in a gravity-aligned
        world (the reference's InitToGround, Tracking.cc:110-143). When
        given, the map world is that frame (z-up) instead of the first
        camera — required by planar object motion models."""
        super().__init__(K, img_wh, config)
        self.depth_max = depth_max
        self._pending_depth = None
        self.init_Tcw = (np_geo.inv_T(np.asarray(init_Twc, dtype=np.float64))
                         .astype(np.float32) if init_Twc is not None
                         else np.eye(4, dtype=np.float32))

    def track(self, gray, depth=None):
        self._pending_depth = depth
        return super().track(gray)

    def reset(self):
        super().reset()
        self._pending_depth = None

    def _kf_map_ratio(self, feats):
        """nMap/nTotal over close-depth keypoints (Tracking.cc:1452-1473):
        keypoints with valid depth that already carry a map point vs all
        keypoints with valid depth. Low ratio => inserting a keyframe would
        create many depth-backed points (the c1c/c2 ratioMap conditions)."""
        if feats is None or self._pending_depth is None:
            return None
        d = self._kp_depths(feats, self._pending_depth)
        close = d > 0
        n_total = int(close.sum())
        if n_total < 10:
            return None
        n_map = int(((feats.mp >= 0) & close).sum())
        return n_map / n_total

    def _kp_depths(self, feats, depth_img):
        """Bilinear depth at subpixel keypoint locations; invalid when any
        corner of the interpolation cell is missing."""
        H, W = depth_img.shape
        x = np.clip(feats.xy[:, 0], 0.0, W - 1.001)
        y = np.clip(feats.xy[:, 1], 0.0, H - 1.001)
        x0 = x.astype(int)
        y0 = y.astype(int)
        fx = x - x0
        fy = y - y0
        d00 = depth_img[y0, x0]
        d01 = depth_img[y0, x0 + 1]
        d10 = depth_img[y0 + 1, x0]
        d11 = depth_img[y0 + 1, x0 + 1]
        corners_ok = (d00 > 0.1) & (d01 > 0.1) & (d10 > 0.1) & (d11 > 0.1)
        d_bil = (d00 * (1 - fx) * (1 - fy) + d01 * fx * (1 - fy)
                 + d10 * (1 - fx) * fy + d11 * fx * fy)
        # sparse depth (stereo keypoint depth images): nearest-pixel value
        d_near = depth_img[np.clip(np.round(y).astype(int), 0, H - 1),
                           np.clip(np.round(x).astype(int), 0, W - 1)]
        d = np.where(corners_ok, d_bil, d_near)
        ok = feats.valid & (d > 0.1) & (d < self.depth_max)
        return np.where(ok, d, 0.0).astype(np.float32)

    def _backproject(self, feats, d, Tcw):
        Kinv = np.linalg.inv(self.K.astype(np.float64))
        uv1 = np.concatenate([feats.xy, np.ones((len(feats.xy), 1))], axis=1)
        pc = (uv1 @ Kinv.T) * d[:, None]
        Twc = np_geo.inv_T(Tcw.astype(np.float64))
        return (pc @ Twc[:3, :3].T + Twc[:3, 3]).astype(np.float32)

    def _try_initialize(self, feats):
        if self._pending_depth is None:
            return False
        d = self._kp_depths(feats, self._pending_depth)
        good = d > 0
        if good.sum() < 50:
            return False
        kf0 = self._insert_keyframe_raw(feats, self.init_Tcw.copy(), self.frame_id)
        self.map.kf_kp_depth[kf0, : len(d)] = d
        pts = self._backproject(feats, d, self.init_Tcw)
        sel = np.where(good)[0]
        ids = self.map.alloc_mps(len(sel))
        sel = sel[: len(ids)]
        m = self.map
        m.mp_pos[ids] = pts[sel]
        m.mp_valid[ids] = True
        m.mp_desc[ids] = feats.desc[sel]
        m.mp_level[ids] = feats.level[sel]
        m.mp_first_kf[ids] = kf0
        m.mp_nobs[ids] = 1
        m.kf_kp_mp[kf0, sel] = ids
        self._refresh_mp_geometry(ids)
        self.last_Tcw = self.init_Tcw.copy()
        self.velocity = np.eye(4, dtype=np.float32)
        self.ref_kf = kf0
        self.last_kf_frame_id = self.frame_id
        feats.mp = m.kf_kp_mp[kf0].copy()
        self.last_frame = feats
        return True

    def _create_keyframe(self, feats, fid=None):
        super()._create_keyframe(feats, fid=fid)
        # the in-flight BA guards against slot reuse, but the depth-backed
        # points below may REUSE erased map slots — fold it first
        self._apply_pending_map()
        # add depth-backed points for still-unmatched keypoints
        if self._pending_depth is None:
            return
        k = self.ref_kf
        m = self.map
        d = self._kp_depths(feats, self._pending_depth)
        m.kf_kp_depth[k, : len(d)] = d
        free = (m.kf_kp_mp[k, : len(feats.valid)] < 0) & (d > 0)
        sel = np.where(free)[0]
        if len(sel) == 0:
            return
        ids = m.alloc_mps(len(sel))
        if len(ids) == 0:
            logger.warning("map-point capacity exhausted; skipping "
                           "depth-backed points for KF %d", k)
            return
        sel = sel[: len(ids)]
        pts = self._backproject(feats, d, m.kf_tcw[k])
        m.mp_pos[ids] = pts[sel]
        m.mp_valid[ids] = True
        m.mp_desc[ids] = feats.desc[sel]
        m.mp_level[ids] = feats.level[sel]
        m.mp_first_kf[ids] = k
        m.mp_nobs[ids] = 1
        m.kf_kp_mp[k, sel] = ids
        self._refresh_mp_geometry(ids)


class StereoTracker(RgbdTracker):
    """TrackStereo-equivalent: rectified left/right pairs; per-keypoint
    depth via batched row-band Hamming matching (ops/stereo.py, standing in
    for Frame::ComputeStereoMatches)."""

    def __init__(self, K, img_wh, baseline, config=None, depth_max=20.0):
        super().__init__(K, img_wh, config, depth_max=depth_max)
        self.baseline = float(baseline)

    def track(self, gray_left, gray_right=None):
        from ..ops import stereo as stereo_ops

        feats_l = self._extract(gray_left)
        feats_r = self._extract(gray_right)
        depth, disp, matched = stereo_ops.stereo_match_keypoints(
            jnp.asarray(feats_l.xy), jnp.asarray(feats_l.desc),
            jnp.asarray(feats_l.level), jnp.asarray(feats_l.valid),
            jnp.asarray(feats_r.xy), jnp.asarray(feats_r.desc),
            jnp.asarray(feats_r.level), jnp.asarray(feats_r.valid),
            jnp.float32(self.K[0, 0]), jnp.float32(self.baseline),
        )
        # synthesize a sparse depth image at keypoint locations
        H = int(self.img_wh[1])
        W = int(self.img_wh[0])
        depth_img = np.zeros((H, W), dtype=np.float32)
        dnp = np.array(depth)
        xi = np.clip(feats_l.xy[:, 0].astype(int), 0, W - 1)
        yi = np.clip(feats_l.xy[:, 1].astype(int), 0, H - 1)
        depth_img[yi, xi] = dnp
        self._pending_depth = depth_img
        return MonocularTracker.track(self, gray_left)


class ObjectSlamTracker(MonocularTracker):
    """Monocular tracker with cuboid object landmarks — the orb_object_slam
    configuration (static objects): per new keyframe, run the TPU cuboid
    detector (Tracking::DetectCuboid), associate detections to landmarks by
    shared-point voting (Tracking::AssociateCuboids), and solve the joint
    camera-point-object local BA (Optimizer::LocalBACameraPointObjects)."""

    # keep the reference's nMinObs (3) even while the map is young: the
    # relaxed nMinObs=1 of Tracking.cc:1437-1445 inflates ref_tracked so
    # the c2 ratio fires a keyframe EVERY frame, and the resulting
    # one-frame-baseline triangulations flooded the map with noisy depths
    # (measured: progressive scale drift into tracking collapse on the
    # orbit scene; with nMinObs=3 the same run tracks 57/61)
    _young_kf_min_obs = None

    # per-keyframe ground-height scale recovery: the reference enables it
    # only for monocular KITTI (enable_ground_height_scale in the launch
    # config) — on indoor object scenes the lower image is mostly object
    # faces, whose normal-aligned pseudo-planes under-report camera height
    # and send the correction into runaway inflation (measured x2.1 map
    # growth on the orbit-room scene); drift there is absorbed by loop
    # closure instead. The GROUND-BASED METRIC INIT stays on regardless —
    # one clean measurement on the fresh init map, floor-dominated by
    # construction.
    enable_ground_height_scale = False

    def __init__(self, K, img_wh, config=None, detector=None, ground_Twc0=None,
                 camera_object_weight=1.0):
        super().__init__(K, img_wh, config)
        from ..models.detector import CuboidDetector
        from .objects import ObjectManager

        if detector is None:
            # sample camera roll/pitch around the SLAM estimate: inside the
            # loop the pose carries drift, and the detector's corner-chain
            # geometry dies beyond ~5 deg of ground-frame orientation error
            # (measured). The reference enables exactly this whenever the
            # pose isn't the calibrated first frame (main_obj.cpp:442-446,
            # whether_sample_cam_roll_pitch +-6 deg step 3).
            detector = CuboidDetector(whether_sample_cam_roll_pitch=True)
            detector.set_calibration(K)
        self.objects = ObjectManager(detector)
        # SLAM world frame = first camera; detection needs a ground-aligned
        # frame (z-up, ground at z=0). ground_Twc0 supplies the first
        # camera's pose in the ground frame (the reference's InitToGround,
        # Tracking.cc:110-143).
        self.ground_align = None
        if ground_Twc0 is not None:
            self.ground_align = np.asarray(ground_Twc0, dtype=np.float64)
        self.camera_object_weight = camera_object_weight
        self._pending_obs = None  # (gray, bboxes, lines) for the next KF
        self.mono_scale_initialized = False
        self._world_is_ground = False
        # ground-height scale recovery (Tracking.cc:2433-2663): nominal
        # camera height = the calibrated mount height from ground_Twc0
        self._ground_est = None
        if self.ground_align is not None:
            from .ground import GroundConfig, GroundScaleEstimator

            h0 = float(abs(self.ground_align[2, 3]))
            if h0 > 1e-3:
                # every_kfs=1: the estimator is the mono drift absorber —
                # its height low-pass already smooths per-KF noise, and
                # skipping keyframes just lets frontier scale drift
                # compound unchecked between corrections
                self._ground_est = GroundScaleEstimator(GroundConfig(
                    nominal_height=h0, every_kfs=1, min_points=12,
                    inlier_thresh=0.05 * h0))

    def track(self, gray, bboxes_2d=None, lines=None):
        self._pending_obs = (gray, bboxes_2d, lines)
        was_uninit = self.state == "NOT_INITIALIZED"
        out = super().track(gray)
        if was_uninit and self.state == "OK":
            self._anchor_world_to_ground()
            self._object_depth_scale_init()
            self._bump_map()
        return out

    def _anchor_world_to_ground(self):
        """build_worldframe_on_ground (Tracking.cc:1103-1116): right after
        two-view initialization transform the whole initial map into the
        GROUND frame, so the SLAM world is z-up with the ground at z=0 and
        object landmark poses are directly metric-room-frame once the scale
        anchor fires. Cameras: Tcw' = Tcw @ G^-1; points: p' = G p."""
        if self.ground_align is None or self._world_is_ground:
            return
        G = self.ground_align
        Ginv = np_geo.inv_T(G)
        m = self.map
        R = G[:3, :3]
        ids = m.mp_ids()
        m.mp_pos[ids] = (m.mp_pos[ids] @ R.T + G[:3, 3]).astype(np.float32)
        m.mp_normal[ids] = (m.mp_normal[ids] @ R.T).astype(np.float32)
        for k in m.kf_ids():
            m.kf_tcw[k] = (m.kf_tcw[k].astype(np.float64) @ Ginv
                           ).astype(np.float32)
        self.last_Tcw = (self.last_Tcw.astype(np.float64) @ Ginv
                         ).astype(np.float32)
        # velocity is camera-to-camera relative: invariant under a world
        # re-anchor. As-tracked trajectory entries + absolute (ref == -1)
        # relative-trajectory entries move with the world.
        self.trajectory = [
            (fid, None if T is None else
             (np.asarray(T, dtype=np.float64) @ Ginv).astype(np.float32))
            for fid, T in self.trajectory]
        self._traj_rel = [
            (fid, ref, ref_fid, (T if ref >= 0 else T @ Ginv))
            for fid, ref, ref_fid, T in self._traj_rel]
        if self._last_rel is not None:
            ref, ref_fid, T = self._last_rel
            if ref < 0:
                self._last_rel = (ref, ref_fid, T @ Ginv)
        self._world_is_ground = True
        self._dev_state = None
        self._bump_map()

    def reset(self):
        super().reset()
        self.objects.reset()
        self._pending_obs = None
        self.mono_scale_initialized = False
        # the re-initialized world starts in the new first camera's frame;
        # ground_align (the ORIGINAL first camera's mount) no longer
        # describes it, so a post-reset map stays camera-anchored (the
        # reference has the same static-mount limitation)
        self._world_is_ground = False
        self.ground_align = None
        self._ground_est = None

    def _object_depth_scale_init(self):
        """MonoObjDepthInitialization analog (Tracking.cc:852-930): anchor
        the arbitrary monocular scale to metric truth right after two-view
        initialization. Preferred anchor: the GROUND PLANE of the freshly
        anchored world (scale = calibrated mount height / fitted apparent
        height — exact, lands the floor on z=0 by construction, same
        machinery as enable_ground_height_scale, Tracking.cc:2433-2663).
        Fallback: the cuboid detector's metric object depth vs the map's
        depth (the reference's object-depth init) — useful when the ground
        is untextured, but it inherits the detector's systematic ~15%
        near-bias (measured), so it only runs when the plane fit fails."""
        m = self.map
        k = self.ref_kf
        # ground-plane anchor: exact when the fit is clean (floor lands on
        # z=0 by construction), but a fit through object faces can be
        # arbitrarily wrong — demand the plane explain half the candidate
        # region (min_inlier_frac) and cross-check against the object below
        s_ground = None
        if self._ground_est is not None and self._world_is_ground:
            n_cam = (m.kf_tcw[k, :3, :3].astype(np.float64)
                     @ np.array([0.0, 0.0, 1.0]))
            h = self._ground_est.measure_height(
                m, k, self.img_wh, cam_ground_normal=tuple(n_cam),
                seed=self.frame_id, min_inlier_frac=0.5)
            if h is not None:
                s_ground = self._ground_est.cfg.nominal_height / h
        # object-depth anchor (the reference's MonoObjDepthInitialization):
        # systematically ~15% near-biased through the detector's depth, but
        # never catastrophically off — the robustness reference
        s_obj = None
        gray, bboxes_2d, lines = self._pending_obs or (None, None, None)
        if bboxes_2d is not None and lines is not None and len(bboxes_2d):
            Twc_slam = np_geo.inv_T(m.kf_tcw[k].astype(np.float64))
            # after _anchor_world_to_ground the SLAM world IS ground-framed
            Twc_ground = (Twc_slam if self._world_is_ground else
                          (self.ground_align @ Twc_slam
                           if self.ground_align is not None else Twc_slam))
            dets = self.objects.detect_on_keyframe(m, k, gray, bboxes_2d,
                                                   lines, Twc_ground)
            if dets:
                ratios = self._object_depth_ratios(k, dets[0])
                if len(ratios) >= 5:
                    s_obj = float(np.median(ratios))
        if s_ground is not None and s_obj is not None:
            # agree -> trust the exact one; disagree -> the plane fit was
            # contaminated (measured 1.5x-off fits), fall back to the object
            scale = (s_ground if 0.75 < s_ground / s_obj < 1.35 else s_obj)
        else:
            scale = s_ground if s_ground is not None else s_obj
        if scale is None or not (0.05 < scale < 50.0):
            return
        self._apply_metric_scale(scale, k)
        self.mono_scale_initialized = True

    def _apply_metric_scale(self, scale, k):
        """GLOBAL rescale about the oldest keyframe's camera center —
        the INIT-time anchor: the first camera's pose is the metric truth
        the ground frame was built from (it stays put; structure scales
        radially around it, which lands the floor on z=0 exactly)."""
        from .ground import GroundScaleEstimator

        m = self.map
        all_kf = [int(x) for x in m.kf_ids()]
        anchor = (min(all_kf, key=lambda i: int(m.kf_frame_id[i]))
                  if all_kf else k)
        GroundScaleEstimator.apply_scale(m, anchor, scale)
        self._rescale_traj_rel(scale)
        self.last_Tcw = m.kf_tcw[k].copy()
        self.velocity[:3, 3] *= scale
        self._dev_state = None

    def _rescale_local_window(self, k, scale, covis_min=15):
        """LOCAL-window rescale, the reference's ground-recovery shape
        (Tracking.cc:2614-2651): only the covisible window of k and its
        points rescale; mature structure outside the window — already
        metric — is untouched, so this absorbs frontier drift without
        re-gauging the whole map. Pivot: in a GROUND-ANCHORED world the
        window's oldest camera's ground projection (x, y, 0) — the floor
        stays on z=0 and the corrected camera height lands on s*h =
        nominal; a camera-center pivot would lift the floor to h(1-s) and
        poison the next plane fit. Pre-anchor worlds keep the reference's
        camera-center pivot."""
        m = self.map
        counts = m.covisibility_counts(k)
        window = sorted({int(k)} | {int(i) for i in np.where(
            counts >= covis_min)[0] if m.kf_valid[i]})
        anchor = min(window, key=lambda i: int(m.kf_frame_id[i]))
        Tcw_a = m.kf_tcw[anchor].astype(np.float64)
        c_a = np_geo.inv_T(Tcw_a)[:3, 3]
        pivot = (np.array([c_a[0], c_a[1], 0.0])
                 if getattr(self, "_world_is_ground", False) else c_a)
        mp_set = np.unique(np.concatenate(
            [m.kf_kp_mp[kf][m.kf_kp_mp[kf] >= 0] for kf in window]))
        mp_set = mp_set[m.mp_valid[mp_set]]
        if len(mp_set):
            m.mp_pos[mp_set] = ((m.mp_pos[mp_set].astype(np.float64) - pivot)
                                * scale + pivot).astype(np.float32)
            m.mp_min_dist[mp_set] *= scale
            m.mp_max_dist[mp_set] *= scale
        for kf in window:
            Twc = np_geo.inv_T(m.kf_tcw[kf].astype(np.float64))
            Twc[:3, 3] = (Twc[:3, 3] - pivot) * scale + pivot
            m.kf_tcw[kf] = np_geo.inv_T(Twc).astype(np.float32)
        Twc = np_geo.inv_T(self.last_Tcw.astype(np.float64))
        Twc[:3, 3] = (Twc[:3, 3] - pivot) * scale + pivot
        self.last_Tcw = np_geo.inv_T(Twc).astype(np.float32)
        self.velocity[:3, 3] *= scale
        # frame->reference relative poses whose reference is in the window
        # carry window units (the reference scales exactly those,
        # Tracking.cc:2643-2651)
        win = set(window)
        for i, (fid, ref, ref_fid, T) in enumerate(self._traj_rel):
            if ref in win:
                T2 = T.copy()
                T2[:3, 3] *= scale
                self._traj_rel[i] = (fid, ref, ref_fid, T2)
        if self._last_rel is not None and self._last_rel[0] in win:
            ref, ref_fid, T = self._last_rel
            T2 = T.copy()
            T2[:3, 3] *= scale
            self._last_rel = (ref, ref_fid, T2)
        self._bump_map()

    def _object_depth_ratios(self, k, det, min_points=5):
        """Per-point metric/estimated depth ratios for one detection:
        metric depth = the keypoint ray's FIRST intersection with the
        detected cuboid (the visible surface the tracked point actually
        sits on — comparing against the cuboid CENTER depth instead biases
        the ratio ~half-a-box-depth upward, which measured as a compounding
        +16%/anchor scale overshoot); estimated depth = the owned map
        point's camera-frame z."""
        from .kitti import _ray_cuboid_depth

        m = self.map
        mp = m.kf_kp_mp[k]
        if len(det.owned_kps) == 0:
            return []
        inside = np.zeros(len(mp), dtype=bool)
        inside[det.owned_kps] = True
        sel = np.where((mp >= 0) & inside)[0]
        ids = mp[sel]
        live = m.mp_valid[ids]
        sel, ids = sel[live], ids[live]
        if len(ids) < min_points:
            return []
        d_metric = _ray_cuboid_depth(self.K, m.kf_kp_xy[k, sel],
                                     det.local_pose, det.scale)
        Tcw = m.kf_tcw[k]
        z_est = (m.mp_pos[ids] @ Tcw[:3, :3].T + Tcw[:3, 3])[:, 2]
        ok = (d_metric > 0) & (z_est > 1e-6)
        return (d_metric[ok] / z_est[ok]).tolist()

    def _ground_height_reanchor(self, k):
        """Ground-height scale recovery for the live object tracker
        (enable_ground_height_scale, Tracking.cc:2433-2663): fit the floor
        plane to lower-image map points, rescale the LOCAL window so the
        camera's height above that plane equals the NOMINAL mount height
        (|ground_Twc0 z| — a fixed external constant, so the feedback loop
        is anchored OUTSIDE the estimate). The object-depth ratio cannot
        play this role: the detector's 'metric' depth is proportional to
        the estimated camera height, so correcting scale from it chases
        its own tail (measured as a runaway +30%/keyframe inflation)."""
        if (not self.enable_ground_height_scale or self._ground_est is None
                or not self._world_is_ground):
            return
        m = self.map
        # expected ground normal in the CURRENT camera frame (world z-up
        # through the estimated rotation; tolerant of ~10 deg drift)
        n_cam = m.kf_tcw[k, :3, :3].astype(np.float64) @ np.array([0., 0., 1.])
        # once the world is metric, only NEAR-FLOOR points may vote: points
        # on object faces in the lower image form normal-aligned pseudo-
        # planes (box tops / face clusters) that under-report camera height
        # and send the recovery into a runaway inflation (measured x2.1)
        z_gate = (0.25 * self._ground_est.cfg.nominal_height
                  if self.mono_scale_initialized else None)
        s = self._ground_est.try_recover(
            m, k, self.img_wh, cam_ground_normal=tuple(n_cam),
            seed=self.frame_id, max_world_z=z_gate)
        if s is None or not (0.5 < s < 2.0):
            return
        s = min(max(s, 0.7), 1.3)
        if abs(s - 1.0) < 0.02:
            return
        self._rescale_local_window(k, s)
        logger.info("ground-height scale recovery at KF %d: x%.3f", k, s)

    def _create_keyframe(self, feats, fid=None):
        super()._create_keyframe(feats, fid=fid)
        # the object pipeline below reads AND writes camera/point state
        # (object BA, scale init) — fold the in-flight static BA first
        self._apply_pending_map()
        k = self.ref_kf
        gray, bboxes_2d, lines = self._pending_obs or (None, None, None)
        if bboxes_2d is None or lines is None or len(bboxes_2d) == 0:
            return
        # camera pose in the ground frame for detection
        Twc_slam = np_geo.inv_T(self.map.kf_tcw[k].astype(np.float64))
        if self._world_is_ground or self.ground_align is None:
            Twc_ground = Twc_slam  # world anchored on the ground at init
        else:
            # world->ground alignment via the first camera
            Twc_ground = self.ground_align @ Twc_slam
        with profiler.span("obj.detect"):
            dets = self.objects.detect_on_keyframe(
                self.map, k, gray, bboxes_2d, lines, Twc_ground
            )
        # measurements are stored in the camera frame -> keep them in the
        # SLAM world by re-lifting with the SLAM pose during association
        with profiler.span("obj.associate"):
            self.objects.associate(self.map, k, dets)
            self.objects.cull(self.map)
        # ground-height scale recovery (drift absorber)
        self._ground_height_reanchor(k)
        with profiler.span("obj.ba"):
            self._object_ba(k)

    def _on_loop_corrected(self, corrections):
        """Re-anchor object landmarks through their latest measurement
        keyframe after a loop correction — the object analog of the map-
        point re-anchoring in correct_loop.

        BEYOND the reference: LoopClosing.cc:401-580 re-anchors MapPoints
        only; MapObjects keep their stale world poses after a correction,
        so corrected cameras and uncorrected cuboids disagree until the
        next sighting. Here every landmark rides the correction of the
        keyframe that last measured it (pose through the camera frame,
        translation + free scale divided by the Sim3 scale, exactly like
        the points)."""
        st = self.objects.store
        for o in np.where(st.valid)[0]:
            dq = self.objects.meas.get(int(o))
            anchor = None
            if dq:
                for det in reversed(dq):
                    if det.kf_id in corrections:
                        anchor = det.kf_id
                        break
            if anchor is None:
                continue
            new_Tcw, old_Tcw, s_ref = corrections[anchor]
            pose_cam = old_Tcw @ st.pose[o].astype(np.float64)
            pose_cam[:3, 3] /= s_ref
            st.pose[o] = (np_geo.inv_T(new_Tcw) @ pose_cam).astype(np.float32)
            # fix_scale landmarks carry a METRIC prior (e.g. the KITTI car
            # size) — their extent intentionally does NOT follow a mono
            # Sim3 rescale, so after a correction with s far from 1 they
            # are temporarily inconsistent with their owned points until
            # the next object BA re-converges the surrounding geometry.
            if not st.fix_scale[o]:
                st.scale[o] = (st.scale[o] / s_ref).astype(np.float32)
            elif abs(s_ref - 1.0) > 0.1:
                logger.warning(
                    "loop Sim3 scale %.3f rescaled the map around fixed-"
                    "scale object %d; its metric extent is kept", s_ref, o)

    def _object_ba(self, k):
        """Joint local BA with objects (replaces the plain point BA result
        for the local window). Runs the reference's pre-pass (owned-point
        filter + re-center, Optimizer.cc:1180-1224) and two-stage
        5 -> prune -> 10 schedule (:1389-1444)."""
        from ..graph.object_ba import local_ba_objects_two_stage
        import jax.numpy as jnp

        cfg = self.cfg
        m = self.map
        st = self.objects.store
        if not st.valid.any():
            return
        self.objects.filter_and_recenter(m)
        counts = m.covisibility_counts(k)
        order = np.argsort(-counts)
        local = [k] + [int(i) for i in order[: cfg.local_ba_kfs - 1] if counts[i] >= 15]
        kf_map = {int(kf): i for i, kf in enumerate(local)}

        mp_set = np.unique(
            np.concatenate([m.kf_kp_mp[kf][m.kf_kp_mp[kf] >= 0] for kf in local])
        )
        mp_set = mp_set[m.mp_valid[mp_set]]
        if len(mp_set) == 0:
            return

        kf_idx, kp_idx, mp_idx = m.observations_of(mp_set)
        keep = np.isin(kf_idx, local)
        kf_idx, kp_idx, mp_idx = kf_idx[keep], kp_idx[keep], mp_idx[keep]
        # pow2-bucketed capacities, same policy as _local_ba_dispatch: the
        # reference never drops observations from the joint solve
        # (Optimizer.cc:826-1534); fixed caps silently left part of any
        # beyond-toy object run unoptimized
        E = self._bucket_pow2(len(kf_idx), cfg.max_obs_edges,
                              max(cfg.max_obs_edges, m.max_kf * m.n_kp))
        n_e = min(len(kf_idx), E)
        if len(kf_idx) > E:
            logger.warning("object BA: clipping %d -> %d observation edges",
                           len(kf_idx), E)
        kf_local = np.full(m.max_kf, -1, dtype=np.int32)
        kf_local[np.asarray(local)] = np.arange(len(local), dtype=np.int32)
        mp_local = np.full(m.max_mp, -1, dtype=np.int32)
        mp_local[mp_set] = np.arange(len(mp_set), dtype=np.int32)
        obs_kf = np.zeros(E, dtype=np.int32)
        obs_pt = np.zeros(E, dtype=np.int32)
        obs_uv = np.zeros((E, 2), dtype=np.float32)
        obs_si = np.ones(E, dtype=np.float32)
        obs_valid = np.zeros(E, dtype=bool)
        ke, pe, me = kf_idx[:n_e], kp_idx[:n_e], mp_idx[:n_e]
        obs_kf[:n_e] = kf_local[ke]
        obs_pt[:n_e] = mp_local[me]
        obs_uv[:n_e] = m.kf_kp_xy[ke, pe]
        obs_si[:n_e] = 1.0 / (trk.SCALE_FACTOR ** m.kf_kp_level[ke, pe])
        obs_valid[:n_e] = True

        (box_kf, box_obj, box_meas, box_si, box_valid,
         po_obj, po_pt_g, po_si, po_valid,
         meas_kf, meas_obj, meas_pose, meas_scale, meas_si,
         meas_valid) = self.objects.ba_edges(
            m, kf_map, camera_object_weight=self.camera_object_weight
        )
        # remap point-object edges into local point indices
        po_loc = mp_local[np.clip(po_pt_g, 0, None)]
        po_valid &= po_loc >= 0
        po_pt = np.where(po_valid, po_loc, 0).astype(po_pt_g.dtype)

        KF_CAP = self._bucket_pow2(len(local), 16, m.max_kf)
        PT_CAP = self._bucket_pow2(len(mp_set), 2048, m.max_mp)
        nk = min(len(local), KF_CAP)
        npt = min(len(mp_set), PT_CAP)
        kf_tcw = np.tile(np.eye(4, dtype=np.float32), (KF_CAP, 1, 1))
        kf_tcw[:nk] = m.kf_tcw[local[:nk]]
        kf_fixed = np.ones(KF_CAP, dtype=bool)
        all_kf = [int(x) for x in m.kf_ids()]
        # oldest by FRAME id (slot recycling breaks slot==temporal order);
        # anchoring the newest pose instead would re-gauge the map around
        # the least-certain estimate (see _create_keyframe)
        oldest = (min(all_kf, key=lambda i: int(m.kf_frame_id[i]))
                  if all_kf else 0)
        for i, kf in enumerate(local[:nk]):
            kf_fixed[i] = kf == oldest
        if not kf_fixed[:nk].any():
            kf_fixed[int(np.argmin(m.kf_frame_id[local[:nk]]))] = True
        # mono scale-gauge handling (see _local_ba_dispatch): keep the
        # solve FREE (one fixed camera — pinning a second would freeze its
        # pose error in) and renormalize the cost-flat similarity direction
        # post-hoc, preserving the fixed->widest-baseline camera distance.
        # The object edges' metric information still reaches every free
        # pose/point/landmark; only the runaway contraction along the
        # near-flat direction (measured 3x in one solve) is cancelled —
        # whole-map scale corrections belong to the explicit rescale paths.
        gauge = None
        if nk >= 3 and int(kf_fixed[:nk].sum()) == 1:
            i_fix = int(np.where(kf_fixed[:nk])[0][0])
            c_fix = np_geo.inv_T(kf_tcw[i_fix].astype(np.float64))[:3, 3]
            centers = np.stack([np_geo.inv_T(kf_tcw[i].astype(np.float64))[:3, 3]
                                for i in range(nk)])
            dctr = np.linalg.norm(centers - c_fix, axis=1)
            dctr[i_fix] = -1.0
            i_ref = int(np.argmax(dctr))
            if dctr[i_ref] > 1e-6:
                gauge = (i_fix, i_ref, float(dctr[i_ref]))
        pts = np.zeros((PT_CAP, 3), dtype=np.float32)
        pts[:npt] = m.mp_pos[mp_set[:npt]]
        pt_valid = np.zeros(PT_CAP, dtype=bool)
        pt_valid[:npt] = True
        obs_valid &= (obs_kf < nk) & (obs_pt < npt)
        box_valid &= box_kf < nk
        po_valid &= po_pt < npt
        meas_valid &= meas_kf < nk

        out = local_ba_objects_two_stage(
            jnp.asarray(kf_tcw), jnp.asarray(pts),
            jnp.asarray(st.pose), jnp.asarray(st.scale), jnp.asarray(self.K),
            jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
            jnp.asarray(obs_si), jnp.asarray(obs_valid),
            jnp.asarray(box_kf), jnp.asarray(box_obj), jnp.asarray(box_meas),
            jnp.asarray(box_si), jnp.asarray(box_valid),
            jnp.asarray(po_obj), jnp.asarray(po_pt), jnp.asarray(po_si),
            jnp.asarray(po_valid),
            jnp.asarray(kf_fixed), jnp.asarray(pt_valid),
            jnp.asarray(st.valid), jnp.asarray(st.fix_scale),
            meas_kf=jnp.asarray(meas_kf), meas_obj=jnp.asarray(meas_obj),
            meas_pose=jnp.asarray(meas_pose),
            meas_scale=jnp.asarray(meas_scale),
            meas_si=jnp.asarray(meas_si), meas_valid=jnp.asarray(meas_valid),
        )
        kf_out, pts_out, op_out, os_out = (np.array(x) for x in out[:4])
        if gauge is not None:
            i_fix, i_ref, d_before = gauge
            c_fix = np_geo.inv_T(kf_out[i_fix].astype(np.float64))[:3, 3]
            c_ref = np_geo.inv_T(kf_out[i_ref].astype(np.float64))[:3, 3]
            d_after = float(np.linalg.norm(c_ref - c_fix))
            if d_after > 1e-9 and abs(d_before / d_after - 1.0) > 1e-6:
                s = d_before / d_after
                for i in range(nk):
                    Twc = np_geo.inv_T(kf_out[i].astype(np.float64))
                    Twc[:3, 3] = (Twc[:3, 3] - c_fix) * s + c_fix
                    kf_out[i] = np_geo.inv_T(Twc).astype(kf_out.dtype)
                pts_out[:npt] = ((pts_out[:npt].astype(np.float64) - c_fix)
                                 * s + c_fix).astype(pts_out.dtype)
                # object landmarks ride the same similarity (position about
                # the pivot, dimensions by s) — they live in the same world
                live_o = np.where(st.valid)[0]
                op_out[live_o, :3, 3] = ((op_out[live_o, :3, 3]
                                          .astype(np.float64) - c_fix) * s
                                         + c_fix).astype(op_out.dtype)
                os_out[live_o] = (os_out[live_o].astype(np.float64)
                                  * s).astype(os_out.dtype)
        for i, kf in enumerate(local[:nk]):
            if not kf_fixed[i]:
                m.kf_tcw[kf] = kf_out[i]
        m.mp_pos[mp_set[:npt]] = pts_out[:npt]
        self.objects.store.pose[:] = op_out
        self.objects.store.scale[:] = os_out
