#!/usr/bin/env python
"""Single-image 3D cuboid detection demo — the detect_3d_cuboid node
equivalent (detect_3d_cuboid/src/main.cpp): bundled frame + offline LSD
edges + hard-coded calibration/pose/2D-box in, scored cuboid out, overlay
saved.

  python examples/run_cuboid_detection.py [--live-lines] [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--live-lines", action="store_true",
                    help="run the TPU line detector instead of the bundled LSD txt")
    ap.add_argument("--out", default="/tmp/cuboid_detection")
    args = ap.parse_args()

    from PIL import Image, ImageDraw

    from cube_slam_tpu.models.detector import CuboidDetector
    from cube_slam_tpu.utils import io, profiler
    from cube_slam_tpu.viz import drawing

    os.makedirs(args.out, exist_ok=True)
    profiler.enable()
    fx = io.load_detect3d_fixture()

    lines = fx["edges"]
    if args.live_lines:
        import jax.numpy as jnp

        from cube_slam_tpu.ops import lsd

        ls, valid = lsd.detect_lines(jnp.asarray(fx["gray"], dtype=jnp.float32),
                                     min_length=15.0, max_lines=256)
        lines = np.array(ls)[np.array(valid)]

    det = CuboidDetector()
    det.set_calibration(fx["K"])
    with profiler.span("One 3D object total time"):
        res = det.detect_cuboid(fx["gray"], fx["Twc"], fx["bbox"], lines)
    # timed steady-state pass
    t0 = time.perf_counter()
    for _ in range(5):
        res = det.detect_cuboid(fx["gray"], fx["Twc"], fx["bbox"], lines)
    print(f"steady detect: {(time.perf_counter() - t0) / 5 * 1000:.1f} ms/frame")

    p = res[0][0]
    print(f"pos {np.round(p.pos, 3)}  rotY {p.rotY:.3f}  scale {np.round(p.scale, 3)}")
    print(f"errors: dist {p.edge_distance_error:.3f} angle {p.edge_angle_error:.3f} "
          f"normalized {p.normalized_error:.4f} skew {p.skew_ratio:.3f}")

    img = drawing.draw_frame(
        fx["rgb"], cuboid_corners_2d=[p.box_corners_2d], bboxes=[fx["bbox"][0]]
    )
    img.save(os.path.join(args.out, "cuboid_overlay.png"))
    profiler.print_aggregated()
    print("artifacts in", args.out)


if __name__ == "__main__":
    main()
