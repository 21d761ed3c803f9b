"""Native host runtime (C++) — the glue layer the TPU shouldn't do.

The reference is a C++ system end to end; in this framework the compute
path is JAX/XLA on TPU, and the host-side runtime pieces that are scalar
and order-dependent (greedy line merging, dataset parsing) live in a small
C++ library, built on demand with the system toolchain and bound via
ctypes. Python fallbacks keep every feature working if no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_libcubeslam.so")
_SOURCES = ["merge_lines.cpp"]
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            newest_src = max(
                os.path.getmtime(os.path.join(_HERE, s)) for s in _SOURCES
            )
            if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < newest_src:
                _build()
            lib = ctypes.CDLL(_SO_PATH)
            lib.cube_slam_merge_break_lines.restype = ctypes.c_int
            lib.cube_slam_merge_break_lines.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def merge_break_lines_native(lines, pre_merge_dist_thre=20.0,
                             pre_merge_angle_thre_deg=5.0,
                             edge_length_threshold=30.0):
    """C++ greedy merge; returns (merged (M, 4) float64) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    work = np.ascontiguousarray(np.asarray(lines, dtype=np.float64)).copy()
    n = work.shape[0]
    if n == 0:
        return work.reshape(0, 4)
    m = lib.cube_slam_merge_break_lines(
        work.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(pre_merge_dist_thre), float(pre_merge_angle_thre_deg),
        float(edge_length_threshold),
    )
    return work[:m].copy()
