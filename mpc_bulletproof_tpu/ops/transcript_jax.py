"""On-device Fiat-Shamir transcript ops (functional, jit-composable).

Device-side mirror of :class:`..transcript.HashChainTranscript`: the state is
a ``(32,)`` uint32 byte vector threaded functionally through absorbs and
challenges, with :mod:`.keccak_jax` as the hash.  Byte layouts are identical
to the host transcript (and therefore to the reference's Cairo-compatible
merlin fork — reference src/transcript.rs:63-121, src/util.rs:252-289):

* ``absorb``:            ``state' = keccak256(state || pad_label(l) || msg)``
* ``challenge_scalar``:  ``state' = keccak256(state || pad_label(l))``; the
  scalar is ``hash_to_scalar(state')`` = LE(state' || keccak256(state'))
  reduced mod r;
* points absorb as ``x || y`` 32-byte LE felts, identity = 64 zero bytes;
* scalars absorb as 32 LE bytes.

This lets a whole log-round protocol (the IPP) compile into one XLA program
with zero host round trips — the host transcript is synchronized afterwards
by assigning the returned state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import P, R
from .keccak import pad_label
from .keccak_jax import keccak256_device
from . import limb
from .limb import FP, FR, NL, NLZ, BASE_BITS, WIDE


def absorb(state: jnp.ndarray, label: bytes, msg: jnp.ndarray, msg_len: int) -> jnp.ndarray:
    """``state' = keccak256(state || pad_label(label) || msg)``; msg is a
    ``(msg_len,)`` uint32 byte vector (static length)."""
    lbl = np.frombuffer(pad_label(label), dtype=np.uint8).astype(np.uint32)
    data = jnp.concatenate([state.astype(jnp.uint32), jnp.asarray(lbl), msg.astype(jnp.uint32)])
    return keccak256_device(data, 32 + len(lbl) + msg_len)


def challenge_scalar(state: jnp.ndarray, label: bytes):
    """Squeeze a challenge: returns ``(state', u)`` with ``u`` a canonical
    ``(NL, 1)`` scalar limb column (hash_to_scalar semantics)."""
    lbl = np.frombuffer(pad_label(label), dtype=np.uint8).astype(np.uint32)
    data = jnp.concatenate([state.astype(jnp.uint32), jnp.asarray(lbl)])
    new_state = keccak256_device(data, 32 + len(lbl))
    high = keccak256_device(new_state, 32)
    u = bytes_to_scalar_mod_r(jnp.concatenate([new_state, high]))
    return new_state, u


def bytes_to_scalar_mod_r(bytes64: jnp.ndarray) -> jnp.ndarray:
    """LE-interpret 64 uniform bytes and reduce mod r -> (NL, 1) canonical."""
    b = bytes64.astype(jnp.int32)
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = ((b[:, None] >> shifts[None, :]) & 1).reshape(512)
    bits = jnp.pad(bits, (0, WIDE * BASE_BITS - 512))
    groups = bits.reshape(WIDE, BASE_BITS)
    w = jnp.asarray([1 << t for t in range(BASE_BITS)], dtype=jnp.int32)
    limbs = jnp.sum(groups * w[None, :], axis=1)[:, None]  # (WIDE, 1)
    return limb._barrett_reduce(limbs, FR)


def felt_bytes_le(limbs_col: jnp.ndarray) -> jnp.ndarray:
    """Canonical ``(NL, k)`` limbs -> ``(32, k)`` LE bytes (uint32)."""
    k = limbs_col.shape[-1]
    shifts = jnp.arange(BASE_BITS, dtype=jnp.int32)
    bits = ((limbs_col[:, None, :] >> shifts[None, :, None]) & 1).reshape(NL * BASE_BITS, k)
    bits = bits[:256]
    w = jnp.asarray([1 << t for t in range(8)], dtype=jnp.int32)
    return jnp.sum(bits.reshape(32, 8, k) * w[None, :, None], axis=1).astype(jnp.uint32)


def points_transcript_bytes(x: jnp.ndarray, y: jnp.ndarray, is_id: jnp.ndarray) -> jnp.ndarray:
    """Affine canonical coords ``(NL, k)`` + identity flags ``(k,)`` ->
    ``(64, k)`` transcript encodings (x || y LE felts; identity = zeros)."""
    enc = jnp.concatenate([felt_bytes_le(x), felt_bytes_le(y)], axis=0)
    return jnp.where(is_id[None, :], jnp.uint32(0), enc)


def lazy_points_to_affine(pts: jnp.ndarray):
    """``(3, NLZ, k)`` lazy *Montgomery* projective points -> canonical
    standard-form affine ``(x, y, is_id)`` with ``(NL, k)`` coords.

    One batched Fermat inversion (square-and-multiply ladder over the k
    lanes) — boundary-only cost.  The Montgomery R factors cancel in X/Z,
    so only the canonicalization needs care, not an explicit R^-1 scaling.
    """
    xc = limb._lazy_to_canonical(pts[0], FP)
    yc = limb._lazy_to_canonical(pts[1], FP)
    zc = limb._lazy_to_canonical(pts[2], FP)
    is_id = jnp.all(zc == 0, axis=0)
    # avoid 0^(p-2) = 0 division noise: substitute 1 for identity lanes
    z_safe = jnp.where(is_id[None, :], limb.from_const(1, zc.shape[1:]), zc)
    from . import kernels  # in-kernel ladder: one dispatch, not ~500

    zinv = kernels.mod_pow_static(z_safe, P - 2, FP)
    x_aff = limb._mod_mul(xc, zinv, FP)
    y_aff = limb._mod_mul(yc, zinv, FP)
    return x_aff, y_aff, is_id
