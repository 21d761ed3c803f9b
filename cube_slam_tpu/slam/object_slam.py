"""Cube-only object SLAM demo pipeline — parity with object_slam/.

Re-design of `incremental_build_graph` (object_slam/src/main_obj.cpp:344-592):
a sequential 58-frame loop where each frame adds one camera vertex, one
camera-cuboid edge (if a cuboid was detected) and one odometry edge, then
re-optimizes the WHOLE graph with 5 LM iterations (main_obj.cpp:561-562).

Here the graph lives in fixed-capacity padded arrays (poses (F, 4, 4),
per-frame cuboid measurements, odometry chain) and each frame's
`graph.optimize(5)` is ONE jitted LM solve with masks selecting the active
prefix — the same compiled program re-used for all frames. Measurements come
either from offline txt cuboids (whether_read_offline_cuboidtxt analog,
main_obj.cpp:476-497) or from the live TPU detector (models/detector.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import factors
from ..graph.lm import lm_optimize
from ..models import cuboid as cb
from ..utils import geometry as geo
from ..utils import io as io_utils
from ..utils import np_geometry as np_geo


@functools.partial(jax.jit, static_argnames=("num_iters", "max_frames"))
def optimize_graph(
    tcw,            # (F, 4, 4) current world->camera estimates
    cube_pose,      # (4, 4) cuboid pose (object->world)
    cube_scale,     # (3,)
    meas_pose,      # (F, 4, 4) per-frame cuboid measurement (camera frame)
    meas_scale,     # (F, 3)
    meas_quality,   # (F,)
    has_obs,        # (F,) bool
    odom,           # (F, 4, 4) measured motion (f-1 -> f), Tcw convention
    frame_count,    # scalar int: frames currently in the graph
    num_iters: int,
    max_frames: int,
):
    """One `graph.optimize(num_iters)` call over the active prefix."""
    F = max_frames
    idx = jnp.arange(F)
    frame_active = idx < frame_count
    obs_active = frame_active & has_obs
    odom_active = (idx >= 1) & frame_active

    dim = F * 6 + 9

    def retract(params, dx):
        tcw_c, cpose, cscale = params
        dxc = dx[: F * 6].reshape(F, 6)
        new_tcw = geo.se3_exp(dxc) @ tcw_c  # left-multiplicative (g2o VertexSE3Expmap)
        cub = cb.exp_update(cb.Cuboid(cpose, cscale), dx[F * 6 :])
        return new_tcw, cub.pose, cub.scale

    def residual(params):
        tcw_c, cpose, cscale = params
        cub = cb.Cuboid(cpose, cscale)
        sqrt_info = factors.quality_to_sqrt_info(meas_quality)  # (F,)
        r_cube = factors.se3_cuboid_error(
            cb.Cuboid(jnp.broadcast_to(cpose, (F, 4, 4)), jnp.broadcast_to(cscale, (F, 3))),
            tcw_c,
            cb.Cuboid(meas_pose, meas_scale),
            sqrt_info[:, None],
            obs_active,
        )  # (F, 9)
        prev = jnp.roll(tcw_c, 1, axis=0)
        r_odom = factors.se3_odometry_error(prev, tcw_c, odom, 1.0, odom_active)  # (F, 6)
        return jnp.concatenate([r_cube.reshape(-1), r_odom.reshape(-1)])

    cam_mask = jnp.repeat(frame_active & (idx > 0), 6)  # frame 0 fixed
    cube_mask = jnp.ones((9,), dtype=bool) & (frame_count > 0)
    param_mask = jnp.concatenate([cam_mask, jnp.broadcast_to(cube_mask, (9,))])

    res = lm_optimize(
        residual,
        retract,
        (tcw, cube_pose, cube_scale),
        dim=dim,
        num_iters=num_iters,
        param_mask=param_mask,
    )
    new_tcw, new_cpose, new_cscale = res.params
    return new_tcw, new_cpose, new_cscale, res.chi2


def optimize_graph_sharded(
    mesh, tcw, cube_pose, cube_scale, meas_pose, meas_scale, meas_quality,
    has_obs, odom, frame_count, num_iters=5,
):
    """Multi-chip variant of optimize_graph: frames (edges) shard across the
    mesh, parameters stay replicated, normal equations psum over ICI
    (parallel/sharded_lm.py). The frame capacity must be divisible by the
    mesh size. Numerically equivalent to optimize_graph."""
    from ..parallel.sharded_lm import sharded_lm_optimize

    F = tcw.shape[0]
    idx = jnp.arange(F)
    frame_active = idx < frame_count
    obs_active = frame_active & has_obs
    odom_active = (idx >= 1) & frame_active
    dim = F * 6 + 9

    edge_data = {
        "f_idx": idx,
        "meas_pose": meas_pose,
        "meas_scale": meas_scale,
        "quality": meas_quality,
        "obs_active": obs_active,
        "odom": odom,
        "odom_active": odom_active,
    }

    def retract(params, dx):
        tcw_c, cpose, cscale = params
        new_tcw = geo.se3_exp(dx[: F * 6].reshape(F, 6)) @ tcw_c
        cub = cb.exp_update(cb.Cuboid(cpose, cscale), dx[F * 6 :])
        return new_tcw, cub.pose, cub.scale

    def edge_residual(params, shard):
        tcw_c, cpose, cscale = params
        f = shard["f_idx"]  # (E_local,)
        n_local = f.shape[0]
        T_f = tcw_c[f]
        T_prev = tcw_c[jnp.maximum(f - 1, 0)]
        sqrt_info = factors.quality_to_sqrt_info(shard["quality"])
        r_cube = factors.se3_cuboid_error(
            cb.Cuboid(jnp.broadcast_to(cpose, (n_local, 4, 4)),
                      jnp.broadcast_to(cscale, (n_local, 3))),
            T_f,
            cb.Cuboid(shard["meas_pose"], shard["meas_scale"]),
            sqrt_info[:, None],
            shard["obs_active"],
        )
        r_odom = factors.se3_odometry_error(
            T_prev, T_f, shard["odom"], 1.0, shard["odom_active"]
        )
        return jnp.concatenate([r_cube.reshape(-1), r_odom.reshape(-1)])

    cam_mask = jnp.repeat(frame_active & (idx > 0), 6)
    param_mask = jnp.concatenate([cam_mask, jnp.ones((9,), dtype=bool)])

    res = sharded_lm_optimize(
        edge_residual, retract, (tcw, cube_pose, cube_scale), edge_data,
        dim=dim, mesh=mesh, num_iters=num_iters, param_mask=param_mask,
    )
    new_tcw, new_cpose, new_cscale = res.params
    return new_tcw, new_cpose, new_cscale, res.chi2


@dataclass
class DemoResult:
    est_Twc: np.ndarray            # (N, 4, 4) optimized camera poses
    cube_pose_history: np.ndarray  # (N, 4, 4) cuboid pose after each frame
    cube_scale_history: np.ndarray # (N, 3)
    raw_cube_world: np.ndarray     # (N, 4, 4) raw detection lifted to world
    raw_cube_valid: np.ndarray     # (N,)
    chi2_history: np.ndarray       # (N,)


class ObjectSlamDemo:
    """Host driver of the incremental demo graph (main_obj.cpp:344-592)."""

    def __init__(self, max_frames=64, num_lm_iters=5):
        self.max_frames = max_frames
        self.num_lm_iters = num_lm_iters

    def run_offline(self, seq: io_utils.CabinetSequence | None = None):
        """Offline mode (online_detect_mode=false): cuboid measurements from
        detect_cuboids_saved.txt in the local ground frame, transformed into
        each frame's pop camera pose (main_obj.cpp:476-497)."""
        seq = seq or io_utils.CabinetSequence()
        N = seq.num_frames
        meas = []
        row_id = 0
        for f in range(N):
            if row_id < len(seq.offline_cuboids) and int(seq.offline_cuboids[row_id][0]) == f:
                r = seq.offline_cuboids[row_id]
                pose_g, scale = np_geo.minimal9_to_pose_scale(
                    [r[1], r[2], r[3], 0.0, 0.0, r[4], r[5], r[6], r[7]]
                )
                local_pose = np_geo.inv_T(seq.init_Twc(f)) @ pose_g
                quality = (1.0 - r[8] + 0.5) / 2.0
                meas.append((local_pose.astype(np.float32), scale.astype(np.float32), quality))
                row_id += 1
            else:
                meas.append(None)
        first_truth_Twc = seq.truth_Twc(0)
        return self._run(meas, first_truth_Twc, N)

    def run_online(self, seq: io_utils.CabinetSequence | None = None, max_lines=128):
        """Online mode (online_detect_mode=true, main_obj.cpp:421-474): per
        frame run the TPU line detector (ops/lsd.py, standing in for
        line_lbd's LSD) + the fused cuboid detector, sampling camera
        roll/pitch around the first truth pose after frame 0."""
        from ..models.detector import CuboidDetector
        from ..ops import lsd as lsd_ops

        import jax.numpy as jnp

        seq = seq or io_utils.CabinetSequence()
        N = seq.num_frames
        first_truth_Twc = seq.truth_Twc(0)

        det = CuboidDetector()
        det.set_calibration(seq.K)
        det.whether_sample_bbox_height = False
        det.nominal_skew_ratio = 2.0

        meas = [None] * N
        # camera pose used for detection: frame 0 uses its own estimate; later
        # frames sample roll/pitch around the FIRST truth pose
        # (main_obj.cpp:442-446). We replicate by tracking the running
        # estimate only for frame 0 (= first truth pose anyway).
        for f in range(N):
            boxes = seq.yolo_boxes(f)
            if boxes.size == 0:
                continue
            gray = seq.gray(f)
            lines, lvalid = lsd_ops.detect_lines(
                jnp.asarray(gray, dtype=jnp.float32),
                min_length=15.0, max_lines=max_lines,
            )
            lines_np = np.array(lines)[np.array(lvalid)]
            det.whether_sample_cam_roll_pitch = f != 0
            Twc_det = first_truth_Twc
            props = det.detect_cuboid(gray, Twc_det, boxes[:1, :4], lines_np)
            if not props or not props[0]:
                continue
            p = props[0][0]
            pose_g, scale = np_geo.minimal9_to_pose_scale(
                [p.pos[0], p.pos[1], p.pos[2], 0.0, 0.0, p.rotY, p.scale[0], p.scale[1], p.scale[2]]
            )
            if det.whether_sample_cam_roll_pitch:
                # correct camera frame for the sampled roll/pitch
                # (main_obj.cpp:463-471)
                r0, p0, y0 = np_geo.rot_to_euler_zyx(Twc_det[:3, :3])
                R_new = np_geo.euler_zyx_to_rot(
                    r0 + p.camera_roll_delta, p0 + p.camera_pitch_delta, y0
                )
                Twc_new = np_geo.make_T(R_new, Twc_det[:3, 3])
            else:
                Twc_new = Twc_det
            local_pose = np_geo.inv_T(Twc_new) @ pose_g
            quality = (1.0 - p.normalized_error + 0.5) / 2.0
            meas[f] = (local_pose.astype(np.float32), scale.astype(np.float32), quality)
        return self._run(meas, first_truth_Twc, N)

    def run_with_measurements(self, meas, first_truth_Twc):
        """meas: list (per frame) of None or (local_pose (4,4), scale (3,),
        quality) camera-frame cuboid measurements."""
        return self._run(meas, first_truth_Twc, len(meas))

    def _run(self, meas, first_truth_Twc, N):
        F = self.max_frames
        assert N <= F
        tcw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        meas_pose = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
        meas_scale = np.zeros((F, 3), dtype=np.float32)
        meas_quality = np.zeros((F,), dtype=np.float32)
        has_obs = np.zeros((F,), dtype=bool)
        odom = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))

        cube_pose = np.eye(4, dtype=np.float32)
        cube_scale = np.zeros(3, dtype=np.float32)

        est_Twc_hist = np.zeros((N, 4, 4))
        cube_pose_hist = np.zeros((N, 4, 4))
        cube_scale_hist = np.zeros((N, 3))
        raw_cube_world = np.tile(np.eye(4), (N, 1, 1))
        raw_cube_valid = np.zeros(N, dtype=bool)
        chi2_hist = np.zeros(N)

        first_Twc = np.asarray(first_truth_Twc, dtype=np.float32)

        for f in range(N):
            # constant-velocity pose prediction (main_obj.cpp:394-408)
            if f == 0:
                curr_Twc = first_Twc
                odom_f = np.eye(4, dtype=np.float32)
            else:
                prev_tcw = tcw[f - 1]
                if f > 1:
                    odom_f = prev_tcw @ np.linalg.inv(tcw[f - 2])
                else:
                    odom_f = np.eye(4, dtype=np.float32)
                curr_Twc = np.linalg.inv(odom_f @ prev_tcw)
            tcw[f] = np.linalg.inv(curr_Twc)
            odom[f] = odom_f

            if meas[f] is not None:
                mp, ms, q = meas[f]
                meas_pose[f] = mp
                meas_scale[f] = ms
                meas_quality[f] = q
                has_obs[f] = True

            # cuboid vertex init at frame 0 (main_obj.cpp:510-518)
            if f == 0:
                assert meas[0] is not None, "demo data has a frame-0 observation"
                cube_pose = (curr_Twc @ meas_pose[0]).astype(np.float32)
                cube_scale = meas_scale[0].copy()

            out = optimize_graph(
                jnp.asarray(tcw), jnp.asarray(cube_pose), jnp.asarray(cube_scale),
                jnp.asarray(meas_pose), jnp.asarray(meas_scale),
                jnp.asarray(meas_quality), jnp.asarray(has_obs), jnp.asarray(odom),
                jnp.asarray(f + 1),
                num_iters=self.num_lm_iters, max_frames=F,
            )
            tcw_j, cube_pose_j, cube_scale_j, chi2 = out
            tcw = np.array(tcw_j)  # np.array copies: jax buffers are read-only
            cube_pose = np.array(cube_pose_j)
            cube_scale = np.array(cube_scale_j)

            est_Twc_hist[f] = np.linalg.inv(tcw[f])
            cube_pose_hist[f] = cube_pose
            cube_scale_hist[f] = cube_scale
            chi2_hist[f] = float(chi2)
            if meas[f] is not None:
                raw_cube_world[f] = np.linalg.inv(tcw[f]) @ meas_pose[f]
                raw_cube_valid[f] = True

        # final pose history re-read (reference re-reads vertices each frame;
        # we report the final optimized trajectory)
        for f in range(N):
            est_Twc_hist[f] = np.linalg.inv(tcw[f])

        return DemoResult(
            est_Twc=est_Twc_hist,
            cube_pose_history=cube_pose_hist,
            cube_scale_history=cube_scale_hist,
            raw_cube_world=raw_cube_world,
            raw_cube_valid=raw_cube_valid,
            chi2_history=chi2_hist,
        )


def evaluate_ate(est_Twc, truth_Twc):
    """Absolute trajectory error (translation RMSE), no alignment — the demo
    anchors frame 0 at the truth pose (main_obj.cpp:379-380)."""
    est_t = est_Twc[:, :3, 3]
    tru_t = truth_Twc[:, :3, 3]
    d = est_t - tru_t
    return float(np.sqrt((d * d).sum(axis=1).mean()))
