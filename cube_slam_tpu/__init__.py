"""cube_slam_tpu — a TPU-native (JAX/XLA/Pallas) monocular 3D object SLAM framework.

A ground-up re-design of the capabilities of CubeSLAM (shichaoy/cube_slam,
"CubeSLAM: Monocular 3D Object SLAM", IEEE T-RO 2019):

* single-image 3D cuboid detection from 2D boxes + line segments
  (reference: detect_3d_cuboid/) — here a fully batched proposal lattice
  evaluated in one fused XLA program,
* cuboid-landmark factor-graph SLAM (reference: object_slam/) — here a
  dense-blocked Levenberg-Marquardt solver written in JAX,
* the full ORB-SLAM2-style object SLAM runtime (reference: orb_object_slam/)
  — here staged jitted programs over an immutable SlamState pytree.

Everything in the compute path is functional JAX with static shapes; device
scaling goes through jax.sharding over a Mesh rather than threads/mutexes.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/BA correctness requires true-f32 matmuls: the TPU default lowers
# f32 matmuls to bf16 passes, which breaks SE3 orthonormality (~1e-4 drift)
# and LM convergence. Compute-bound image/descriptor kernels opt back into
# bf16 explicitly where tolerable.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the detector lattice / LM programs are large
# and TPU (re)compiles are expensive in this environment; cache them on disk
# so benches and repeated sessions pay compile cost once.
import os as _os

_cache_dir = _os.environ.get("CUBE_SLAM_TPU_CACHE", _os.path.expanduser("~/.cache/cube_slam_tpu_jax"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never fatal
    pass

