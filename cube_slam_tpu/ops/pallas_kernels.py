"""Pallas TPU kernels for the hot image ops.

The exact-EDT column pass (distance_transform.edt_l2 pass 2) evaluates
D[i,x] = min_u (g^2[i,u] + (x-u)^2) — an O(H W^2) min-plus reduction that
XLA schedules as large materialized intermediates. This Pallas kernel
streams it through VMEM: each grid step owns a row block, keeps the running
minimum in registers/VMEM, and walks the source columns in chunks, so the
(rows, W, W) intermediate never exists. VPU-only (min-plus has no MXU
form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e9
ROW_BLOCK = 8
COL_CHUNK = 128


def _edt_pass2_kernel(g2_ref, out_ref):
    """g2_ref: (ROW_BLOCK, Wp) squared vertical distances;
    out_ref: (ROW_BLOCK, Wp). The (x-u)^2 table is synthesized per column
    chunk from iota — nothing quadratic in W ever leaves registers."""
    TB, W = out_ref.shape
    # tpu.iota requires integer dtype; cast after
    x_ids = lax.broadcasted_iota(jnp.int32, (W, COL_CHUNK), 0).astype(jnp.float32)

    def body(c, acc):
        u0 = c * COL_CHUNK
        g = g2_ref[:, pl.ds(u0, COL_CHUNK)]  # (TB, C)
        u_ids = (u0 + lax.broadcasted_iota(jnp.int32, (W, COL_CHUNK), 1)).astype(jnp.float32)
        s = (x_ids - u_ids) ** 2             # (W, C)
        cand = g[:, None, :] + s[None, :, :]  # (TB, W, C)
        return jnp.minimum(acc, jnp.min(cand, axis=-1))

    acc0 = jnp.full((TB, W), _INF, dtype=jnp.float32)
    out_ref[:] = lax.fori_loop(0, W // COL_CHUNK, body, acc0)


@functools.partial(jax.jit, static_argnames=())
def edt_pass2_pallas(g2):
    """(H, W) squared vertical distances -> (H, W) exact squared EDT."""
    H, W = g2.shape
    Wp = -(-W // COL_CHUNK) * COL_CHUNK
    Hp = -(-H // ROW_BLOCK) * ROW_BLOCK
    g2p = jnp.full((Hp, Wp), _INF, dtype=jnp.float32).at[:H, :W].set(g2)

    out = pl.pallas_call(
        _edt_pass2_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid=(Hp // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Hp * Wp * Wp, bytes_accessed=2 * Hp * Wp * 4,
            transcendentals=0,
        ),
    )(g2p)
    return out[:H, :W]


def edt_l2_pallas(edge_mask):
    """Exact L2 EDT with the Pallas column pass. Drop-in replacement for
    distance_transform.edt_l2 on TPU."""
    from .distance_transform import _vertical_dist

    g = _vertical_dist(edge_mask)
    d2 = edt_pass2_pallas(g * g)
    return jnp.sqrt(jnp.minimum(d2, _INF))


def use_pallas():
    """Pallas kernels are TPU-only; CPU tests use the XLA path."""
    return jax.default_backend() == "tpu"
