"""Multi-chip data-parallel cuboid detection.

The fused proposal-lattice detector (models/detector.detect_lattice_batch)
vmaps over the (bbox, height) batch — embarrassingly parallel over objects.
For multi-object frames (or batched offline processing of many frames'
boxes), the per-bbox packed inputs shard across a `jax.sharding.Mesh` on
the leading axis while the image and calibration stay replicated; XLA
GSPMD partitions the single fused program with no cross-device
communication until the (per-bbox, device-local) top-k, so throughput
scales linearly over ICI-connected chips.

Reference scope: detect_3d_cuboid runs its proposal loops per object on
one CPU core (box_proposal_detail.cpp:94-560); this is the scale-out
answer for production loads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.detector import detect_lattice_batch


def detect_lattice_sharded(mesh, kernel_args, axis_name=None):
    """Run detect_lattice_batch with the bbox batch sharded over `mesh`.

    kernel_args: the dict from CuboidDetector.prepare_batch (bh_batch must
    be the packed-tuple form). The bbox axis is zero-padded to a multiple
    of the mesh size — padded rows carry zero validity masks, so they
    produce no proposals. Returns the same outputs as detect_lattice_batch,
    trimmed back to the original bbox count.
    """
    axis_name = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis_name]
    packed = kernel_args["bh_batch"]
    assert isinstance(packed, (tuple, list)), (
        "sharded detection needs the packed bh tuple from prepare_batch")
    NB = packed[0].shape[0]
    pad = (-NB) % n
    if pad:
        packed = tuple(
            np.concatenate(
                [np.asarray(p),
                 np.zeros((pad,) + p.shape[1:], dtype=np.asarray(p).dtype)])
            for p in packed)

    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    packed = tuple(jax.device_put(jnp.asarray(p), shard) for p in packed)

    def put(v):
        return jax.device_put(jnp.asarray(v), repl)

    res, top_idx, top_scores, top_valid, top_packed = detect_lattice_batch(
        gray=put(kernel_args["gray"]),
        bh_batch=packed,
        K=put(kernel_args["K"]),
        invK=put(kernel_args["invK"]),
        Twc_raw=put(kernel_args["Twc_raw"]),
        cam_yaw=put(kernel_args["cam_yaw"]),
        sample_roll_pitch=kernel_args["sample_roll_pitch"],
        top_k=kernel_args["top_k"],
        nominal_skew_ratio=kernel_args["nominal_skew_ratio"],
        max_cut_skew=kernel_args["max_cut_skew"],
    )
    trim = lambda x: jax.tree_util.tree_map(lambda a: a[:NB], x)
    return trim(res), top_idx[:NB], top_scores[:NB], top_valid[:NB], top_packed[:NB]
