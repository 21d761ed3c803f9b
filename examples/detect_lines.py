#!/usr/bin/env python
"""Line detection demo — the line_lbd `detect_lines` node equivalent
(line_lbd/src/detect_lines.cpp): detect + filter line segments on an image,
optionally compute LBD descriptors, save overlay and txt.

  python examples/detect_lines.py [IMAGE] [--out DIR] [--min-length 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None,
                    help="image path (default: the bundled cabinet fixture)")
    ap.add_argument("--out", default="/tmp/detect_lines")
    ap.add_argument("--min-length", type=float, default=15.0)
    ap.add_argument("--max-lines", type=int, default=256)
    ap.add_argument("--lbd", action="store_true", help="also compute LBD descriptors")
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image, ImageDraw

    from cube_slam_tpu.ops import lbd, lsd
    from cube_slam_tpu.utils import io

    os.makedirs(args.out, exist_ok=True)
    if args.image:
        rgb = io.load_image(args.image)
        gray = io.rgb_to_gray(rgb)
    else:
        fx = io.load_detect3d_fixture()
        rgb, gray = fx["rgb"], fx["gray"]

    lines, valid = lsd.detect_lines(
        jnp.asarray(gray, dtype=jnp.float32),
        min_length=args.min_length, max_lines=args.max_lines,
    )
    L = np.array(lines)[np.array(valid)]
    print(f"detected {len(L)} lines")

    if args.lbd:
        fdesc, bdesc = lbd.lbd_descriptors(jnp.asarray(gray, dtype=jnp.float32), lines, valid)
        np.savetxt(os.path.join(args.out, "lbd_float.txt"), np.array(fdesc)[np.array(valid)])
        print("LBD descriptors written")

    # save_to_imgs / save_to_txts (detect_lines.cpp rosparams)
    np.savetxt(os.path.join(args.out, "lines.txt"), L, fmt="%.3f")
    img = Image.fromarray(np.asarray(rgb, dtype=np.uint8)).convert("RGB")
    d = ImageDraw.Draw(img)
    for x1, y1, x2, y2 in L:
        d.line([(x1, y1), (x2, y2)], fill=(255, 0, 0), width=2)
    img.save(os.path.join(args.out, "lines.png"))
    print("artifacts in", args.out)


if __name__ == "__main__":
    main()
