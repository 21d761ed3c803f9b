"""Benchmark: end-to-end demo-pipeline throughput on one chip.

Reference baseline (BASELINE.md): the C++ pipeline runs the TUM-cabinet demo
with full-graph optimize(5) per frame and live detection; the official KITTI
instructions replay rosbags at 0.5x of 10 fps => ~5 frames/sec effective on
CPU. This bench measures our per-frame cost = cuboid detection (full fused
lattice on the bundled fixture frame) + incremental BA step (5 LM iterations
on the padded 64-frame graph with the real 58-frame cabinet data), and
reports combined frames/sec vs that 5 fps envelope.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cube_slam_tpu.models import cuboid as cb
    from cube_slam_tpu.models.detector import CuboidDetector, detect_lattice_batch
    from cube_slam_tpu.slam.object_slam import ObjectSlamDemo, optimize_graph
    from cube_slam_tpu.utils import io

    # ---- detector throughput (device kernel + host prep) ----
    fx = io.load_detect3d_fixture()
    det = CuboidDetector()
    det.set_calibration(fx["K"])
    kernel_args, _ = det.prepare_batch(fx["gray"], fx["Twc"], fx["bbox"], fx["edges"])

    def run_detect():
        res, top_idx, top_scores, top_valid, packed = detect_lattice_batch(**kernel_args)
        return top_scores

    jax.block_until_ready(run_detect())  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = run_detect()
    jax.block_until_ready(out)
    detect_dt = (time.perf_counter() - t0) / n

    # host-side prep cost (line merge etc.), amortized per frame
    t0 = time.perf_counter()
    for _ in range(5):
        det.prepare_batch(fx["gray"], fx["Twc"], fx["bbox"], fx["edges"])
    prep_dt = (time.perf_counter() - t0) / 5

    # ---- incremental BA step (5 LM iters, padded 64-frame graph, real data) ----
    seq = io.CabinetSequence()
    demo = ObjectSlamDemo(max_frames=64, num_lm_iters=5)
    # build the frame-57 state by running the pipeline once (also compiles)
    res = demo.run_offline(seq)

    F = 64
    tcw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for f in range(seq.num_frames):
        tcw[f] = np.linalg.inv(res.est_Twc[f])
    meas_pose = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    meas_scale = np.zeros((F, 3), np.float32)
    quality = np.zeros((F,), np.float32)
    has = np.zeros((F,), bool)
    from cube_slam_tpu.utils import np_geometry as np_geo

    row = 0
    for f in range(seq.num_frames):
        if row < len(seq.offline_cuboids) and int(seq.offline_cuboids[row][0]) == f:
            r = seq.offline_cuboids[row]
            pose_g, scale = np_geo.minimal9_to_pose_scale(
                [r[1], r[2], r[3], 0, 0, r[4], r[5], r[6], r[7]]
            )
            meas_pose[f] = np_geo.inv_T(seq.init_Twc(f)) @ pose_g
            meas_scale[f] = scale
            quality[f] = (1.0 - r[8] + 0.5) / 2.0
            has[f] = True
            row += 1
    odom = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for f in range(1, seq.num_frames):
        odom[f] = tcw[f] @ np.linalg.inv(tcw[f - 1])

    args = (
        jnp.asarray(tcw),
        jnp.asarray(res.cube_pose_history[-1], dtype=jnp.float32),
        jnp.asarray(res.cube_scale_history[-1], dtype=jnp.float32),
        jnp.asarray(meas_pose), jnp.asarray(meas_scale), jnp.asarray(quality),
        jnp.asarray(has), jnp.asarray(odom), jnp.asarray(seq.num_frames),
    )
    jax.block_until_ready(optimize_graph(*args, num_iters=5, max_frames=F))
    t0 = time.perf_counter()
    for _ in range(n):
        out = optimize_graph(*args, num_iters=5, max_frames=F)
    jax.block_until_ready(out)
    ba_dt = (time.perf_counter() - t0) / n

    per_frame = detect_dt + prep_dt + ba_dt
    fps = 1.0 / per_frame
    baseline_fps = 5.0  # README.md:52-53 replay envelope
    print(json.dumps({
        "metric": "e2e_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s (detect+BA per frame, 1 chip)",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
