"""Device-mesh helpers.

The reference's parallelism is four pthreads + mutexes over shared maps
(SURVEY 2.7; System.cc:104-117). The TPU-native replacement is SPMD over a
jax.sharding.Mesh: proposal lattices and factor-graph edges shard across
devices ("data"/edge parallelism riding ICI), graph states stay replicated,
and reductions are psum collectives — no NCCL/MPI analog needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="edges"):
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_leading(mesh, axis_name="edges"):
    """NamedSharding that splits the leading array dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())
