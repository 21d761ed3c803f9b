"""Edge-sharded Levenberg-Marquardt: multi-chip bundle adjustment.

The scaling story for the factor-graph solver (graph/lm.py): residuals are
independent per edge, so the normal equations are a sum of per-edge outer
products,

    H = sum_e J_e^T J_e,   g = sum_e J_e^T r_e.

Shard the edge data over a 1-D device mesh, let every device linearize its
edge shard against the REPLICATED parameter tangent, psum (H, g) over ICI,
and solve the (small, dense) system identically on every device. This
replaces g2o's single-threaded BlockSolver with an SPMD program whose
communication is two all-reduces of (D x D) and (D,) per iteration — the
classic data-parallel-gradient layout applied to BA.

Implemented with shard_map so the per-device Jacobian work never
materializes the global (R, D) Jacobian.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


class ShardedLMResult(NamedTuple):
    params: object
    chi2: jnp.ndarray
    chi2_history: jnp.ndarray


def sharded_lm_optimize(
    edge_residual_fn: Callable,   # (params, edge_data_shard) -> (R_local,)
    retract_fn: Callable,         # (params, dx (D,)) -> params
    params,                       # replicated pytree
    edge_data,                    # pytree, leading dim = edges (sharded)
    dim: int,
    mesh: Mesh,
    axis_name: str = "edges",
    num_iters: int = 10,
    tau: float = 1e-5,
    param_mask=None,
):
    """LM with edge-sharded normal-equation accumulation.

    edge_data's leading axis must be divisible by the mesh size (pad edges
    with mask=0 rows — masked residuals contribute zero to H and g).
    """
    if param_mask is None:
        param_mask = jnp.ones((dim,), dtype=bool)
    mask_f = param_mask.astype(jnp.float32)
    zero_dx = jnp.zeros((dim,), dtype=jnp.float32)

    def local_normal_eqs(params, shard):
        def r_of(dx):
            return edge_residual_fn(retract_fn(params, dx * mask_f), shard)

        r = r_of(zero_dx)
        J = jax.jacfwd(r_of)(zero_dx)  # (R_local, D)
        H_l = J.T @ J
        g_l = J.T @ r
        chi_l = jnp.sum(r * r)
        return H_l, g_l, chi_l

    def local_chi2(params, shard):
        r = edge_residual_fn(params, shard)
        return jnp.sum(r * r)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(),
    )
    def spmd_step_state(params, shard):
        """One full LM run on sharded edges; state replicated across devices."""

        def chi2_of(p):
            return jax.lax.psum(local_chi2(p, shard), axis_name)

        def normal_eqs(p):
            H_l, g_l, chi_l = local_normal_eqs(p, shard)
            H = jax.lax.psum(H_l, axis_name)
            g = jax.lax.psum(g_l, axis_name)
            chi = jax.lax.psum(chi_l, axis_name)
            return H, g, chi

        def solve(H, g, lam):
            A = H + jnp.diag(lam * jnp.ones((dim,)) + (1.0 - mask_f))
            A = mask_f[:, None] * A * mask_f[None, :] + jnp.diag(1.0 - mask_f)
            L, low = jax.scipy.linalg.cho_factor(A, lower=True)
            return jax.scipy.linalg.cho_solve((L, low), -g * mask_f) * mask_f

        chi2_0 = chi2_of(params)

        def body(i, state):
            p, lam, ni, chi2, hist = state
            H, g, _ = normal_eqs(p)
            # first-pass lambda init (see graph/lm.py): one Jacobian graph in
            # the compiled program instead of two — the shard_map partitioner
            # cost scales with module size, and this halves it.
            lam0 = tau * jnp.max(jnp.diag(H) * mask_f)
            lam0 = jnp.where(lam0 > 0, lam0, tau)
            lam = jnp.where(i == 0, lam0, lam)
            dx = solve(H, g, lam)
            p_new = retract_fn(p, dx)
            chi2_new = chi2_of(p_new)
            accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
            denom = jnp.dot(dx, lam * dx - g) + 1e-12
            rho = (chi2 - chi2_new) / denom
            lam_next = jnp.where(
                accept, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * ni
            )
            ni_next = jnp.where(accept, 2.0, ni * 2.0)
            p_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), p_new, p)
            chi2_next = jnp.where(accept, chi2_new, chi2)
            hist = hist.at[i + 1].set(chi2_next)
            return p_next, lam_next, ni_next, chi2_next, hist

        hist0 = jnp.zeros((num_iters + 1,), dtype=jnp.float32).at[0].set(chi2_0)
        p, lam, _, chi2, hist = jax.lax.fori_loop(
            0, num_iters, body, (params, jnp.float32(tau), 2.0, chi2_0, hist0)
        )
        return p, chi2, hist

    params_out, chi2, hist = spmd_step_state(params, edge_data)
    return ShardedLMResult(params=params_out, chi2=chi2, chi2_history=hist)
