"""One-transfer device->host readback packing.

The axon-tunneled TPU pays ~25-40 ms of latency per host fetch regardless
of size; the fused provers' outputs are ~16 small arrays (transcript state,
commitment coords, proof scalars, per-round L/R points), so reading them
individually cost ~380 ms per proof — 45% of the warm prove (round-4
profile, benches/profile_fused.py).  Packing every output into ONE flat
int32 vector inside the jitted program makes readback a single fetch.

All proof outputs are int32-representable (canonical 13-bit limbs, byte
vectors < 256, boolean flags), so a flat int32 buffer is lossless.
"""

from __future__ import annotations

import numpy as np


def pack_device(leaves):
    """Concatenate device arrays into one flat int32 vector (traceable)."""
    import jax.numpy as jnp

    return jnp.concatenate([l.reshape(-1).astype(jnp.int32) for l in leaves])


def unpack_np(flat, shapes):
    """Split a fetched flat np vector back into arrays of ``shapes``.

    ``shapes``: list of tuples.  Returns list of np.int32 arrays.
    """
    flat = np.asarray(flat)
    out = []
    off = 0
    for shp in shapes:
        k = int(np.prod(shp)) if shp else 1
        out.append(flat[off : off + k].reshape(shp))
        off += k
    if off != flat.size:
        raise ValueError(f"unpack mismatch: consumed {off} of {flat.size}")
    return out
