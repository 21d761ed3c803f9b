"""Host<->device transfer packing.

On a tunneled TPU every host->device transfer costs a round trip
(~10-50 ms), independent of size until bandwidth dominates. Kernel calls
that take a dozen small arrays therefore pay a dozen round trips. These
helpers pack any set of 32-bit arrays into ONE flat f32 buffer on the host
(ints/bools travel as raw bits / 0-1 floats) and unpack them INSIDE the
consuming jitted program (slicing + bitcast fuse into the program — no
extra transfers, no copies worth naming).

The reference has no analog — this is pure TPU-plumbing, the moral
equivalent of marshalling a struct across an RPC boundary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def pack_host(arrays):
    """Pack numpy arrays (f32/i32/u32/bool) into one flat f32 buffer."""
    views = []
    for a in arrays:
        a = np.ascontiguousarray(a)
        if a.dtype == np.bool_:
            a = a.astype(np.float32)
        if a.dtype.itemsize != 4:
            raise TypeError(f"pack_host needs 32-bit dtypes, got {a.dtype}")
        views.append(a.view(np.float32).reshape(-1))
    if not views:
        return np.zeros(0, dtype=np.float32)
    return np.concatenate(views)


def unpack_device(buf, specs):
    """Unpack a flat f32 device buffer per `specs` = [(shape, dtype), ...].

    Must run inside a jitted program (shapes/dtypes are static). bool
    fields were packed as 0/1 floats; integer fields as raw bits.
    """
    out, off = [], 0
    for shape, dtype in specs:
        n = int(np.prod(shape)) if shape else 1
        seg = buf[off:off + n].reshape(shape)
        jd = jnp.dtype(dtype)
        if jd == jnp.bool_:
            arr = seg > 0.5
        elif jd == jnp.float32:
            arr = seg
        else:
            arr = lax.bitcast_convert_type(seg, jd)
        out.append(arr)
        off += n
    return out
