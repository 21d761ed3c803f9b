"""Benchmark: demo-pipeline throughput + full-tracker + BA kernel metrics.

Reference baseline (BASELINE.md): the C++ pipeline runs the TUM-cabinet demo
with full-graph optimize(5) per frame and live detection; the official KITTI
instructions replay rosbags at 0.5x of 10 fps => ~5 frames/sec effective on
CPU. The headline metric is our per-frame cost = cuboid detection (full
fused lattice on the bundled fixture frame) + incremental BA step (5 LM
iterations on the padded 64-frame graph with the real 58-frame cabinet
data), reported as frames/sec vs that 5 fps envelope.

Also measured (BASELINE.md protocol items (a)-(c), VERDICT r1 #6):
  * tracker_fps         — the ACTUAL SLAM tracker (slam/system.py) on a
                          synthetic video-rate sequence (320x240, default
                          pipeline incl. keyframes/local BA/loop detector),
  * ba_iters_per_sec    — Schur camera-point BA at fixed (16 KF, 2048 pts,
                          8192 edges), LM iterations per second,
  * detector_ms/_mfu    — device time + XLA cost-analysis FLOPs for the
                          detector lattice, utilization vs 197 TF/s (v5e
                          bf16 peak; we run f32 matmul precision, so this
                          understates achievable MFU),
  * schur_ms/_mfu       — same for one 5-iteration BA solve.

Prints ONE JSON line; extra keys ride alongside the required four.
"""

import json
import sys
import time


def _stage(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _aot(jitted, *args, **kwargs):
    """Lower+compile ONCE; returns (compiled, flops, bytes_accessed). The
    compiled object is then used for the timing loop too — no second
    compile for the cost analysis."""
    compiled = jitted.lower(*args, **kwargs).compile()
    flops, nbytes = 0.0, 0.0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    return compiled, flops, nbytes


PEAK_FLOPS = 197e12  # TPU v5e bf16 peak (f32 runs lower — rough yardstick)
PEAK_HBM_BW = 819e9  # TPU v5e HBM bandwidth (bytes/s)


def bench_detector(jax, jnp, np):
    from cube_slam_tpu.models.detector import CuboidDetector, detect_lattice_batch
    from cube_slam_tpu.utils import io

    fx = io.load_detect3d_fixture()
    det = CuboidDetector()
    det.set_calibration(fx["K"])
    kernel_args, _ = det.prepare_batch(fx["gray"], fx["Twc"], fx["bbox"], fx["edges"])

    compiled, flops, nbytes = _aot(detect_lattice_batch, **kernel_args)
    arr_args = {k: v for k, v in kernel_args.items()
                if k not in ("sample_roll_pitch", "top_k")}
    jax.block_until_ready(compiled(**arr_args))  # warm
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(**arr_args)
    jax.block_until_ready(out)
    detect_dt = (time.perf_counter() - t0) / n

    # host-side prep cost (line merge etc.), amortized per frame
    t0 = time.perf_counter()
    for _ in range(5):
        det.prepare_batch(fx["gray"], fx["Twc"], fx["bbox"], fx["edges"])
    prep_dt = (time.perf_counter() - t0) / 5

    mfu = flops / max(detect_dt, 1e-12) / PEAK_FLOPS
    hbm = nbytes / max(detect_dt, 1e-12) / PEAK_HBM_BW
    return detect_dt, prep_dt, mfu, hbm


def bench_demo_ba(jax, jnp, np):
    from cube_slam_tpu.slam.object_slam import ObjectSlamDemo, optimize_graph
    from cube_slam_tpu.utils import io
    from cube_slam_tpu.utils import np_geometry as np_geo

    seq = io.CabinetSequence()
    demo = ObjectSlamDemo(max_frames=64, num_lm_iters=5)
    res = demo.run_offline(seq)  # builds frame-57 state (also compiles)

    F = 64
    tcw = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for f in range(seq.num_frames):
        tcw[f] = np.linalg.inv(res.est_Twc[f])
    meas_pose = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    meas_scale = np.zeros((F, 3), np.float32)
    quality = np.zeros((F,), np.float32)
    has = np.zeros((F,), bool)
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
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = optimize_graph(*args, num_iters=5, max_frames=F)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_schur_ba(jax, jnp, np, n_kf=16, n_pt=2048, n_edge=8192, iters=5):
    """Fixed-size camera-point Schur BA (BASELINE item (b))."""
    from cube_slam_tpu.graph import ba

    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    pts = rng.uniform(-2, 2, size=(n_pt, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    kf_tcw = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    for i in range(n_kf):
        kf_tcw[i, :3, 3] = [0.1 * i, 0.01 * i, 0.0]
    obs_kf = rng.integers(0, n_kf, size=n_edge).astype(np.int32)
    obs_pt = rng.integers(0, n_pt, size=n_edge).astype(np.int32)
    pc = np.einsum("eij,ej->ei", kf_tcw[obs_kf, :3, :3], pts[obs_pt]) \
        + kf_tcw[obs_kf, :3, 3]
    uv = pc @ K.T
    obs_uv = (uv[:, :2] / uv[:, 2:3]
              + rng.normal(0, 0.5, size=(n_edge, 2))).astype(np.float32)
    si = np.ones(n_edge, np.float32)
    valid = np.ones(n_edge, bool)
    kf_fixed = np.zeros(n_kf, bool)
    kf_fixed[0] = True
    pt_valid = np.ones(n_pt, bool)
    pts_noisy = pts + rng.normal(0, 0.03, size=pts.shape).astype(np.float32)

    args = (jnp.asarray(kf_tcw), jnp.asarray(pts_noisy), jnp.asarray(K),
            jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
            jnp.asarray(si), jnp.asarray(valid), jnp.asarray(kf_fixed),
            jnp.asarray(pt_valid))
    # dense matmul-shaped reduced-camera assembly (what the runtime's
    # keyframe step and global BA use)
    kw = dict(num_iters=iters, n_kf=n_kf, n_pt=n_pt)
    compiled, flops, nbytes = _aot(ba.local_ba_points, *args, **kw)
    jax.block_until_ready(compiled(*args))
    # CHAINED timing: feed each solve's outputs back as the next inputs so
    # the device executes the n solves back-to-back — measures kernel
    # throughput, not the host<->device tunnel round trip (~45 ms here,
    # which would swamp the kernel). NB: materialize to host at the end —
    # through the tunneled device, block_until_ready alone can return
    # before the queued programs actually finish.
    n = 20
    tcw, pts_c = args[0], args[1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(tcw, pts_c, *args[2:])
        tcw, pts_c = out[0], out[1]
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / n
    mfu = flops / max(dt, 1e-12) / PEAK_FLOPS
    hbm = nbytes / max(dt, 1e-12) / PEAK_HBM_BW
    return dt, iters / dt, mfu, hbm


def bench_tracker(np, n_frames=36, warmup=12):
    """The ACTUAL SLAM tracker on a synthetic video-rate sequence.

    Frames are uint8 (the real input format; 4x less tunnel bandwidth than
    f32). Warmup includes one deliberate tracking break so the rescue-path
    programs (PnP / reference-KF / relocalization) compile outside the
    measured window — a first-rescue compile spike is a one-time cost, not
    steady-state throughput."""
    from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
    from cube_slam_tpu.utils import synth

    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], np.float32)
    scene = synth.RoomScene(seed=2)
    poses = synth.camera_path(n_frames)
    frames = [np.clip(scene.render(poses[i], K, wh=(320, 240)), 0, 255)
              .astype(np.uint8) for i in range(n_frames)]
    cfg = TrackerConfig(n_features=600, n_levels=3, max_kf=48, max_mp=8192,
                        min_init_kps=80, min_init_matches=80, pipeline=True)
    trk = MonocularTracker(K, (320, 240), cfg)
    for f in frames[:warmup]:  # compiles all per-frame programs
        trk.track(f)
    # warm the rescue paths: a wide jump back breaks the motion model
    trk.track(frames[2])
    trk.track(frames[warmup - 1])
    trk.track(frames[warmup - 1])
    trk.flush()
    t0 = time.perf_counter()
    for f in frames[warmup:]:
        trk.track(f)
    trk.flush()
    dt = (time.perf_counter() - t0) / (n_frames - warmup)
    n_tracked = sum(1 for fid, T in trk.trajectory
                    if T is not None and fid < n_frames)
    return 1.0 / dt, n_tracked


def bench_tracker_objects(np, n_frames=36, warmup=10):
    """HEADLINE: the full ObjectSlamTracker end-to-end — per-frame ORB
    tracking + per-keyframe live cuboid detection + object association +
    joint camera-point-object BA + loop detector — on a synthetic room
    with a ground-truth box (the orb_object_slam configuration the project
    is named for). LSD line detection runs per frame and is charged to the
    frame time (the reference detects lines inside DetectCuboid per
    keyframe, Tracking.cc:1581-1626 — charging it every frame is the
    conservative side). Also returns the profiler's per-stage breakdown so
    the JSON shows WHERE frame time goes."""
    import jax.numpy as jnp

    from cube_slam_tpu.ops import lsd as lsd_ops
    from cube_slam_tpu.slam.system import ObjectSlamTracker, TrackerConfig
    from cube_slam_tpu.utils import profiler, synth

    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]], np.float32)
    wh = (320, 240)
    scene = synth.RoomScene(seed=3, box_center=[0.0, 3.2, 0.45],
                            box_half=[0.6, 0.4, 0.45])
    ss = 0.5 - 0.5 * np.cos(np.linspace(0.0, 2.0 * np.pi, n_frames))
    poses = synth.camera_path(n_frames, kind="orbit", target=[0.0, 3.2, 0.6],
                              s_values=ss)
    frames = [np.clip(scene.render(poses[i], K, wh=wh), 0, 255)
              .astype(np.uint8) for i in range(n_frames)]
    bboxes = [scene.box_bbox_2d(poses[i], K, wh=wh) for i in range(n_frames)]
    cfg = TrackerConfig(n_features=800, n_levels=3, max_kf=48, max_mp=8192,
                        min_init_kps=80, min_init_matches=80,
                        match_radius_motion=20.0, pipeline=True,
                        enable_loop_closing=True, loop_min_gap_kfs=10)
    trk = ObjectSlamTracker(K, wh, cfg, ground_Twc0=poses[0])

    def step(i):
        g = jnp.asarray(frames[i], dtype=jnp.float32)
        lines, lv = lsd_ops.detect_lines(g, min_length=15.0, max_lines=128)
        lines_np = np.array(lines)[np.array(lv)]
        bb = bboxes[i]
        trk.track(frames[i], bboxes_2d=None if bb is None else bb[None, :],
                  lines=lines_np)

    for i in range(warmup):  # compiles every per-frame/KF/detector program
        step(i)
    profiler.reset()
    profiler.enable()
    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        step(i)
    trk.flush()
    dt = (time.perf_counter() - t0) / (n_frames - warmup)
    profiler.disable()
    stages = {name: round(vals[2], 2)  # avg ms per call
              for name, vals in profiler.aggregated().items()}
    n_tracked = sum(1 for fid, T in trk.trajectory
                    if T is not None and fid < n_frames)
    n_obj = int(trk.objects.store.valid.sum())
    return 1.0 / dt, n_tracked, n_obj, stages


def bench_tracker_ref_cfg(np, n_frames=14, warmup=6):
    """Steady-state per-frame cost at the REFERENCE's KITTI settings:
    3000 features x 8 levels (Examples/Monocular/KITTI04-12_me.yaml:19,35)
    on KITTI-sized frames (1226x370). Reports the tracked-frame (non-KF)
    fps — the reference's envelope is ~5 fps replay / 10 fps camera."""
    from cube_slam_tpu.slam.system import MonocularTracker, TrackerConfig
    from cube_slam_tpu.utils import synth

    wh = (1226, 370)
    K = np.array([[707.0, 0, 601.8], [0, 707.0, 183.1], [0, 0, 1]],
                 np.float32)
    scene = synth.RoomScene(seed=2)
    poses = synth.camera_path(n_frames)
    frames = [np.clip(scene.render(poses[i], K, wh=wh), 0, 255)
              .astype(np.uint8) for i in range(n_frames)]
    cfg = TrackerConfig(n_features=3000, n_levels=8, max_kf=48, max_mp=16384,
                        min_init_kps=80, min_init_matches=80, pipeline=True)
    trk = MonocularTracker(K, wh, cfg)
    times = []
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        trk.track(f)
        times.append(time.perf_counter() - t0)
    trk.flush()
    ts = np.asarray(times[warmup:])
    if len(ts) == 0:
        return None
    return 1.0 / float(np.median(ts))


def main():
    import os

    # persistent compile cache: the tracker stage spans ~10 XLA programs
    # whose TPU compiles dominate a cold run
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_cube_slam"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    t0 = time.perf_counter()
    # the HEADLINE is the full objects-on tracker — run it FIRST so a cold
    # compile cache cannot push it past the wall budget
    obj_fps, obj_tracked, obj_landmarks, stages = bench_tracker_objects(np)
    _stage(f"objects tracker done {time.perf_counter() - t0:.0f}s")
    tracker_fps, n_tracked = bench_tracker(np)
    _stage(f"tracker done {time.perf_counter() - t0:.0f}s")
    tracker_fps_ref = None
    if time.perf_counter() - t0 < budget:
        tracker_fps_ref = bench_tracker_ref_cfg(np)
        _stage(f"tracker ref-cfg done {time.perf_counter() - t0:.0f}s")
    else:
        _stage("tracker ref-cfg SKIPPED (budget)")
    detect_dt, prep_dt, det_mfu, det_hbm = bench_detector(jax, jnp, np)
    _stage(f"detector done {time.perf_counter() - t0:.0f}s")
    ba_dt = bench_demo_ba(jax, jnp, np)
    _stage(f"demo BA done {time.perf_counter() - t0:.0f}s")
    schur_dt, schur_ips, schur_mfu, schur_hbm = bench_schur_ba(jax, jnp, np)
    _stage(f"schur BA done {time.perf_counter() - t0:.0f}s")
    # global-BA scale (the shapes global_ba actually pads to): the sparse
    # edge-pair assembly replaces the dense (Kf, P) W grid that was ~85 MB
    # per LM iteration here
    schur_global_dt = None
    if time.perf_counter() - t0 < budget:
        schur_global_dt, _, _, _ = bench_schur_ba(
            jax, jnp, np, n_kf=96, n_pt=12288, n_edge=8192)
        _stage(f"schur global done {time.perf_counter() - t0:.0f}s")
    else:
        _stage("schur global SKIPPED (budget)")

    # detect+demo-BA per-frame rate (the old headline; kept as a micro-metric)
    detect_ba_fps = 1.0 / (detect_dt + prep_dt + ba_dt)
    baseline_fps = 5.0  # README.md:52-53 replay envelope
    print(json.dumps({
        "metric": "objects_tracker_frames_per_sec",
        # HEADLINE: full SLAM system e2e — ORB tracking + keyframe mapping
        # + live cuboid detection + object BA + loop detector, per frame.
        # Moves when the tracker moves.
        "value": round(obj_fps, 3),
        "unit": "frames/s (full object-SLAM e2e, 1 chip)",
        "vs_baseline": round(obj_fps / baseline_fps, 3),
        "objects_frames_ok": obj_tracked,
        "objects_landmarks": obj_landmarks,
        "stage_avg_ms": stages,
        "tracker_fps": round(tracker_fps, 2) if tracker_fps else None,
        "tracker_fps_ref_cfg": (round(tracker_fps_ref, 2)
                                if tracker_fps_ref else None),
        "tracker_frames_ok": n_tracked,
        "detect_ba_fps": round(detect_ba_fps, 2),
        "ba_iters_per_sec": round(schur_ips, 1),
        "schur_ba_ms": round(schur_dt * 1e3, 2),
        "schur_ba_mfu_pct": round(schur_mfu * 100, 2),
        "schur_ba_hbm_pct": round(schur_hbm * 100, 2),
        "schur_ba_global_ms": (round(schur_global_dt * 1e3, 2)
                               if schur_global_dt else None),
        "detector_ms": round(detect_dt * 1e3, 2),
        "detector_prep_ms": round(prep_dt * 1e3, 2),
        "detector_mfu_pct": round(det_mfu * 100, 2),
        "detector_hbm_pct": round(det_hbm * 100, 2),
    }))


if __name__ == "__main__":
    main()
