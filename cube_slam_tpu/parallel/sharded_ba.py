"""Edge-sharded camera+point+object bundle adjustment — the flagship
multi-chip training step.

This shards the SLAM workload's dominant computation (the local/global BA of
Optimizer::LocalBACameraPointObjects, orb_object_slam/src/Optimizer.cc:
826-1534) over a TPU mesh the way a data-parallel training step shards a
batch:

* the three edge families (point reprojection, camera-object bbox
  projection, object-point hinge) are the "batch" — split across devices
  along the edge axis (in_specs P("edges")),
* graph state (keyframe poses, points, cuboids) is replicated (P()),
* every device linearizes its local edge shard into normal-equation blocks
  (H_C, b_C, Hpp, bp, W) using the SAME assembly code as the single-device
  solver (graph/object_ba.assemble_normal_blocks), then the blocks psum
  over ICI,
* the Schur-reduced camera+object solve runs replicated on every device
  (it is tiny next to the linearization work).

Communication per LM iteration: one psum of the block pytree plus one
scalar psum for the acceptance cost — the classic all-reduce-of-gradients
layout. Numerically identical to graph/object_ba.local_ba_objects (psum of
per-edge sums == global sum; float reassociation is the only difference).

This module is what `__graft_entry__.dryrun_multichip` exercises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import object_ba as oba


def _pad_to_multiple(arrs, valid_idx, mult):
    """Host helper: pad each edge array in `arrs` (dict) to a multiple of
    mult along axis 0 with zeros (valid mask False)."""
    import numpy as np

    n = arrs[valid_idx].shape[0]
    pad = (-n) % mult
    if pad == 0:
        return arrs
    out = {}
    for k, v in arrs.items():
        pad_width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), pad_width)
    return out


def sharded_local_ba(
    mesh: Mesh,
    kf_tcw, pts, obj_pose, obj_scale, K,
    obs_kf, obs_pt, obs_uv, obs_si, obs_valid,
    box_kf, box_obj, box_meas, box_si, box_valid,
    po_obj, po_pt, po_si, po_valid,
    kf_fixed, pt_valid, obj_valid, obj_fix_scale,
    num_iters: int = 10,
    axis_name: str = "edges",
):
    """Multi-chip local_ba_objects. Edge arrays must have leading dims
    divisible by the mesh size (pad with valid=False rows).

    Returns (kf_tcw, pts, obj_pose, obj_scale, cost).
    """
    Kf = kf_tcw.shape[0]
    Pn = pts.shape[0]
    O = obj_pose.shape[0]
    D = Kf * 6 + O * 9

    C_mask = oba.camera_object_mask(kf_fixed, obj_valid, obj_fix_scale, O)
    pt_mask = pt_valid.astype(jnp.float32)

    state_specs = (P(), P(), P(), P())
    edge_spec_obs = (P(axis_name),) * 5
    edge_spec_box = (P(axis_name),) * 5
    edge_spec_po = (P(axis_name),) * 4

    # every device adds the shape prior; a 1/sqrt(N) prior_factor makes the
    # psum of the N per-device contributions EXACTLY one prior (cost,
    # gradient, and Hessian all scale by prior_factor^2 = 1/N)
    n_dev = mesh.size
    obj_flags = (obj_valid, obj_fix_scale)
    prior_factor = 1.0 / float(n_dev) ** 0.5

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, edge_spec_obs, edge_spec_box, edge_spec_po),
        out_specs=(state_specs, P()),
    )
    def run(state, obs_edges, box_edges, po_edges):
        def total_cost(s):
            local = oba.total_robust_cost(
                s, K, obs_edges, box_edges, po_edges,
                obj_flags=obj_flags, prior_factor=prior_factor)
            return jax.lax.psum(local, axis_name)

        def lm_step(s, lam):
            blocks = oba.assemble_normal_blocks(
                s, K, Kf, Pn, O, obs_edges, box_edges, po_edges,
                obj_flags=obj_flags, prior_factor=prior_factor)
            H_C, b_C, Hpp, bp, W = jax.lax.psum(blocks, axis_name)
            dC, dp = oba.schur_reduce_solve(
                H_C, b_C, Hpp, bp, W, lam, C_mask, pt_mask, Kf, D)
            return oba.retract_state(s, dC, dp, Kf, O)

        def body(i, carry):
            s, lam, cost = carry
            new_s = lm_step(s, lam)
            new_cost = total_cost(new_s)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            s = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_s, s)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return s, lam, cost

        cost0 = total_cost(state)
        state, _, cost = jax.lax.fori_loop(
            0, num_iters, body, (state, 1e-4, cost0))
        return state, cost

    state0 = (kf_tcw, pts, obj_pose, obj_scale)
    obs_edges = (obs_kf, obs_pt, obs_uv, obs_si, obs_valid)
    box_edges = (box_kf, box_obj, box_meas, box_si, box_valid)
    po_edges = (po_obj, po_pt, po_si, po_valid)
    (kf_tcw, pts, obj_pose, obj_scale), cost = run(
        state0, obs_edges, box_edges, po_edges)
    return kf_tcw, pts, obj_pose, obj_scale, cost
