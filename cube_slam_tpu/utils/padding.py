"""Padded-buffer / masking idioms.

The reference grows Eigen matrices and std::vectors dynamically
(e.g. box_proposal_detail.cpp:130-134, 458-462). XLA wants static shapes, so
every variable-length collection in this framework is a fixed-capacity array
plus a validity mask (or a count). These helpers keep that idiom uniform.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

BIG = 1e8  # sentinel cost for invalid entries (scores are minimized)


def pad_rows(arr, capacity, fill=0.0):
    """Pad (n, d) numpy/jnp array to (capacity, d); returns (padded, mask)."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    if n > capacity:
        arr = arr[:capacity]
        n = capacity
    d = arr.shape[1:] if arr.ndim > 1 else ()
    out = np.full((capacity,) + d, fill, dtype=arr.dtype if arr.size else np.float32)
    out[:n] = arr
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return out, mask


def masked_min(values, mask, axis=None):
    """Min over valid entries; invalid -> +BIG."""
    return jnp.min(jnp.where(mask, values, BIG), axis=axis)


def masked_max(values, mask, axis=None):
    """Max over valid entries; invalid -> -BIG."""
    return jnp.max(jnp.where(mask, values, -BIG), axis=axis)


def masked_argmin(values, mask, axis=-1):
    return jnp.argmin(jnp.where(mask, values, BIG), axis=axis)


def masked_topk_smallest(values, mask, k):
    """Indices of the k smallest valid entries (invalid pushed to the end).

    Returns (indices (k,), valid (k,) bool).
    """
    import jax.lax as lax

    masked = jnp.where(mask, values, BIG)
    _, idx = lax.top_k(-masked, k)  # top_k selects largest
    taken = jnp.take(mask, idx)
    return idx, taken


def linespace(start, end, step):
    """Inclusive arange matching the reference's linespace
    (matrix_utils.cpp:350-364): values start, start+step, ... <= end.

    Host-side (numpy); returns float64/int array. A tiny epsilon absorbs the
    accumulated-rounding inclusion behavior of the C++ loop.
    """
    if step <= 0:
        return np.array([start])
    n = int(np.floor((end - start) / step + 1e-9)) + 1
    n = max(n, 1)
    vals = start + step * np.arange(n)
    return vals
