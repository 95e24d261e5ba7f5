"""Keccak-256 on the TPU, for the fused on-device Fiat-Shamir transcript.

The round-1 design kept the transcript on the host ("sequential and tiny"),
which is right for a locally-attached host — but it forces 2 host<->device
round trips per IPP round (absorb L/R, read the challenge), serializing the
whole prover on dispatch latency.  Putting the *hash chain itself* on device
lets the entire log-round IPP — MSMs, folds, absorbs, challenges — compile
into ONE XLA program with zero host round trips (see
``models/inner_product.py``).

This module mirrors :mod:`.keccak` (textbook keccak-f[1600], keccak-256
padding ``0x01 .. 0x80``) bit-for-bit; the test suite pins both against
each other.  64-bit lanes are (lo, hi) uint32 pairs — TPUs have no 64-bit
integer lanes — held as two ``(25,)`` vectors so each round is ~40 vector
ops (per-lane rho rotations use static shift vectors; pi is a static
gather).  Message lengths are static (every transcript absorb has a known
layout), so a single-block path (<= 135 bytes) suffices for all protocol
uses and everything unrolls into straight-line code.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_RATE = 136  # keccak-256 rate in bytes (17 lanes)

_RC64 = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _RC64], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _RC64], dtype=np.uint32)

# Per-lane rho rotation amounts at index x + 5*y.
_ROT_TBL = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_ROT = np.array([_ROT_TBL[i % 5][i // 5] for i in range(25)], dtype=np.int32)

# pi: B[y + 5*((2x + 3y) % 5)] = A[x + 5*y]  =>  B = A[_PI_SRC]
_PI_SRC = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y

# chi neighbour gathers along x within each row y (index x + 5*y).
_CHI_1 = np.array([(i % 5 + 1) % 5 + 5 * (i // 5) for i in range(25)], dtype=np.int32)
_CHI_2 = np.array([(i % 5 + 2) % 5 + 5 * (i // 5) for i in range(25)], dtype=np.int32)

# theta D gathers: D[x] = C[(x-1)%5] ^ rotl1(C[(x+1)%5])
_TH_M1 = np.array([(x - 1) % 5 for x in range(5)], dtype=np.int32)
_TH_P1 = np.array([(x + 1) % 5 for x in range(5)], dtype=np.int32)


def _rotl_vec(lo, hi, rot: np.ndarray):
    """Per-lane 64-bit rotate-left by static amounts (uint32 pair vectors)."""
    r = rot % 32
    swap = rot >= 32
    a = jnp.where(swap, hi, lo)
    b = jnp.where(swap, lo, hi)
    r_j = jnp.asarray(r.astype(np.uint32))
    rc = jnp.asarray(((32 - r) % 32).astype(np.uint32))
    zero_r = jnp.asarray(r == 0)
    out_lo = jnp.where(zero_r, a, (a << r_j) | (b >> rc))
    out_hi = jnp.where(zero_r, b, (b << r_j) | (a >> rc))
    return out_lo, out_hi


def keccak_f1600_device(A_lo: jnp.ndarray, A_hi: jnp.ndarray):
    """One permutation over the 25-lane state given as two (25,) uint32."""
    pi = jnp.asarray(_PI_SRC)
    c1 = jnp.asarray(_CHI_1)
    c2 = jnp.asarray(_CHI_2)
    tm1 = jnp.asarray(_TH_M1)
    tp1 = jnp.asarray(_TH_P1)
    for rnd in range(24):
        # theta: C[x] = xor over the column; D[x] = C[x-1] ^ rotl1(C[x+1])
        g_lo = A_lo.reshape(5, 5)  # [y, x]
        g_hi = A_hi.reshape(5, 5)
        C_lo = g_lo[0] ^ g_lo[1] ^ g_lo[2] ^ g_lo[3] ^ g_lo[4]
        C_hi = g_hi[0] ^ g_hi[1] ^ g_hi[2] ^ g_hi[3] ^ g_hi[4]
        r1_lo, r1_hi = _rotl_vec(C_lo[tp1], C_hi[tp1], np.ones(5, dtype=np.int32))
        D_lo = C_lo[tm1] ^ r1_lo
        D_hi = C_hi[tm1] ^ r1_hi
        A_lo = (g_lo ^ D_lo[None, :]).reshape(25)
        A_hi = (g_hi ^ D_hi[None, :]).reshape(25)
        # rho + pi
        r_lo, r_hi = _rotl_vec(A_lo, A_hi, _ROT)
        B_lo = r_lo[pi]
        B_hi = r_hi[pi]
        # chi
        A_lo = B_lo ^ (~B_lo[c1] & B_lo[c2])
        A_hi = B_hi ^ (~B_hi[c1] & B_hi[c2])
        # iota
        A_lo = A_lo.at[0].set(A_lo[0] ^ jnp.uint32(_RC_LO[rnd]))
        A_hi = A_hi.at[0].set(A_hi[0] ^ jnp.uint32(_RC_HI[rnd]))
    return A_lo, A_hi


def keccak256_device(data: jnp.ndarray, length: int) -> jnp.ndarray:
    """keccak-256 of a ``(length,)`` byte vector (uint32 values in [0, 255]).

    ``length`` is static and must be <= RATE - 1 = 135 (single block) —
    every transcript absorb in this framework fits.  Returns 32 bytes as a
    ``(32,)`` uint32 vector.
    """
    if length > _RATE - 1:
        raise ValueError("single-block keccak only (transcript messages fit)")
    data = data.astype(jnp.uint32)
    block = jnp.zeros((_RATE,), jnp.uint32)
    if length:
        block = block.at[:length].set(data[:length])
    block = block.at[length].set(jnp.uint32(0x01))
    block = block.at[_RATE - 1].set(block[_RATE - 1] | jnp.uint32(0x80))
    lanes = block.reshape(17, 8)
    w = jnp.asarray([1, 1 << 8, 1 << 16, 1 << 24], jnp.uint32)
    lo17 = jnp.sum(lanes[:, :4] * w[None, :], axis=1, dtype=jnp.uint32)
    hi17 = jnp.sum(lanes[:, 4:] * w[None, :], axis=1, dtype=jnp.uint32)
    A_lo = jnp.concatenate([lo17, jnp.zeros(8, jnp.uint32)])
    A_hi = jnp.concatenate([hi17, jnp.zeros(8, jnp.uint32)])
    A_lo, A_hi = keccak_f1600_device(A_lo, A_hi)
    words = jnp.stack([A_lo[:4], A_hi[:4]], axis=1).reshape(8)  # LE word order
    shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    return ((words[:, None] >> shifts[None, :]) & jnp.uint32(0xFF)).reshape(32)
