"""Host-side dataset / fixture IO (numpy, not jitted).

Replaces the reference's txt readers (detect_3d_cuboid/src/matrix_utils.cpp:
197-315 read_all_number_txt / read_obj_detection_txt) and the ROS image
subscription with plain-file loading. All array outputs are numpy float64 on
host; conversion to device f32 happens at the framework boundary.
"""

from __future__ import annotations

import os

import numpy as np

REFERENCE_DATA = "/root/reference/object_slam/data"
REFERENCE_DETECT3D_DATA = "/root/reference/detect_3d_cuboid/data"


def read_all_number_txt(path):
    """Whitespace-separated numeric table -> (rows, cols) float64 array.

    Parity with matrix_utils.cpp:197-234 (skips empty lines; column count
    from the first line).
    """
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            rows.append([float(p) for p in parts])
    if not rows:
        return np.zeros((0, 0))
    return np.asarray(rows, dtype=np.float64)


def read_obj_detection_txt(path):
    """Object detection txt where each row may end with a class name string.

    Returns (numbers (N, C) float64, class_names list[str]).
    Parity with matrix_utils.cpp:236-315.
    """
    numbers = []
    names = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            row = []
            name = ""
            for p in parts:
                try:
                    row.append(float(p))
                except ValueError:
                    name = p
                    break
            numbers.append(row)
            names.append(name)
    return np.asarray(numbers, dtype=np.float64), names


def load_image(path, gray=False):
    """Load an image file -> numpy array (H, W, 3) uint8 or (H, W) float32 gray.

    Grayscale uses the OpenCV BGR2GRAY weights the reference relies on
    (box_proposal_detail.cpp:64: cv::cvtColor(..., CV_BGR2GRAY)) —
    y = 0.299 R + 0.587 G + 0.114 B, rounded to uint8 like OpenCV.
    """
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    if not gray:
        return img
    y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return np.round(y).astype(np.uint8).astype(np.float32)


def rgb_to_gray(img_rgb):
    """(H, W, 3) uint8 RGB -> (H, W) float32 gray with OpenCV weights."""
    y = 0.299 * img_rgb[..., 0] + 0.587 * img_rgb[..., 1] + 0.114 * img_rgb[..., 2]
    return np.round(y).astype(np.uint8).astype(np.float32)


# ---------------------------------------------------------------------------
# Bundled sequence: object_slam/data (58-frame TUM cabinet)
# ---------------------------------------------------------------------------

def tum_pose_to_matrix(row):
    """TUM row [time x y z qx qy qz qw] -> 4x4 Twc (numpy)."""
    t = row[1:4]
    qx, qy, qz, qw = row[4:8]
    # normalized quaternion to rotation
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    R = np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class CabinetSequence:
    """Loader for the bundled 58-frame TUM-cabinet sequence
    (reference: object_slam/data, README.md:66-70).

    Exposes: truth poses, pop (detector) camera poses, offline matlab
    cuboids, per-frame YOLO 2D boxes, raw RGB frames.
    """

    # TUM cabinet calibration (main_obj.cpp:346-349)
    K = np.array([[535.4, 0.0, 320.1], [0.0, 539.2, 247.6], [0.0, 0.0, 1.0]])

    def __init__(self, base_folder=REFERENCE_DATA):
        self.base = base_folder
        self.truth_poses = read_all_number_txt(os.path.join(base_folder, "truth_cam_poses.txt"))
        self.init_poses = read_all_number_txt(os.path.join(base_folder, "pop_cam_poses_saved.txt"))
        self.offline_cuboids = read_all_number_txt(os.path.join(base_folder, "detect_cuboids_saved.txt"))
        self.num_frames = self.truth_poses.shape[0]

    def rgb(self, idx):
        return load_image(os.path.join(self.base, "raw_imgs", "%04d_rgb_raw.jpg" % idx))

    def gray(self, idx):
        return load_image(os.path.join(self.base, "raw_imgs", "%04d_rgb_raw.jpg" % idx), gray=True)

    def yolo_boxes(self, idx):
        """2D boxes [x, y, w, h, prob], matlab->c++ index shift applied
        (main_obj.cpp:436-439: leftCols<2> -= 1)."""
        path = os.path.join(self.base, "filter_2d_obj_txts", "%04d_yolo2_0.15.txt" % idx)
        boxes = read_all_number_txt(path)
        if boxes.size:
            boxes = boxes.copy()
            boxes[:, :2] -= 1.0
        return boxes

    def truth_Twc(self, idx):
        return tum_pose_to_matrix(self.truth_poses[idx])

    def init_Twc(self, idx):
        return tum_pose_to_matrix(self.init_poses[idx])


def read_offline_cuboid_txts(folder, use_truth_trackid=False, max_frames=10000):
    """Per-frame offline 3D cuboid txts (Tracking::ReadAllObjecttxt,
    Tracking_util.cc:25-69): `%04d_3d_cuboids.txt` rows of
    [center(3), yaw, scale(3), bbox x1 y1 w h, prob] (+ leading tracklet id
    when use_truth_trackid). Returns list per frame of (N, 12|13) arrays;
    stops at the first missing frame file."""
    out = []
    for i in range(max_frames):
        path = os.path.join(folder, "%04d_3d_cuboids.txt" % i)
        if not os.path.exists(path):
            break
        out.append(read_all_number_txt(path))
    return out


class KittiSequence:
    """KITTI odometry-style sequence loader: `image_0/%06d.png`, times.txt,
    optional offline 2D/3D detections (the reference's KITTI inputs,
    Examples/Monocular/mono_kitti.cc:58 + Tracking_util.cc). Used when real
    KITTI data is mounted; the bundled tests use CabinetSequence."""

    def __init__(self, base_folder, K=None):
        self.base = base_folder
        times_path = os.path.join(base_folder, "times.txt")
        self.times = (
            read_all_number_txt(times_path).reshape(-1)
            if os.path.exists(times_path) else None
        )
        self.K = K
        self.num_frames = len(self.times) if self.times is not None else 0

    def gray(self, idx):
        for pattern in ("image_0/%06d.png", "image_2/%06d.png", "%06d.png"):
            p = os.path.join(self.base, pattern % idx)
            if os.path.exists(p):
                return load_image(p, gray=True)
        raise FileNotFoundError(f"frame {idx} under {self.base}")

    def gray_right(self, idx):
        """Right image of the rectified pair (stereo_kitti.cc reads
        image_0/image_1; raw-format sequences use image_3)."""
        for pattern in ("image_1/%06d.png", "image_3/%06d.png"):
            p = os.path.join(self.base, pattern % idx)
            if os.path.exists(p):
                return load_image(p, gray=True)
        raise FileNotFoundError(f"right frame {idx} under {self.base}")

    def offline_cuboids(self, use_truth_trackid=False):
        sub = "pred_3d_obj_matched_tracked_txt" if use_truth_trackid else "pred_3d_obj_matched_txt"
        return read_offline_cuboid_txts(os.path.join(self.base, sub), use_truth_trackid)


def load_detect3d_fixture():
    """Bundled single-frame fixture of detect_3d_cuboid/ (main.cpp:27-74):
    image, offline LSD edges, hard-coded K / camera pose / 2D bbox.

    Returns dict with rgb, gray, edges (N,4), K (3,3), Twc (4,4), bbox (1,4).
    """
    rgb = load_image(os.path.join(REFERENCE_DETECT3D_DATA, "0000_rgb_raw.jpg"))
    edges = read_all_number_txt(
        os.path.join(REFERENCE_DETECT3D_DATA, "edge_detection", "LSD", "0000_edge.txt")
    )
    # constants from detect_3d_cuboid/src/main.cpp:35-48
    K = np.array([[529.5, 0.0, 365.0], [0.0, 529.5, 265.0], [0.0, 0.0, 1.0]])
    Twc = np.array(
        [
            [1.0, 0.0011, 0.0004, 0.0],
            [0.0, -0.3376, 0.9413, 0.0],
            [0.0011, -0.9413, -0.3376, 1.35],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    # [x y w h], matlab->c++ -1 shift on x,y applied (main.cpp:46-48)
    bbox = np.array([[187.0, 188.0, 201.0, 311.0]])
    return {
        "rgb": rgb,
        "gray": rgb_to_gray(rgb),
        "edges": edges,
        "K": K,
        "Twc": Twc,
        "bbox": bbox,
    }
