"""Keccak-256 (pre-NIST padding, a.k.a. "Ethereum keccak").

The reference's Fiat-Shamir transcript is a *keccak256 hash chain* (renegade's
merlin fork, used at reference src/transcript.rs and src/generators.rs) chosen
for bit-compatibility with a Cairo/StarkNet verifier.  StarkNet / Ethereum use
original Keccak-256: rate 1088 (136-byte blocks), capacity 512, multi-rate
padding with domain byte ``0x01`` (NOT the NIST SHA3 ``0x06``).

This is a host-side primitive: it is inherently sequential and operates on a
few dozen bytes at a time, so it does not belong on the TPU (SURVEY.md §2.4).
A pure-Python implementation is used by default; an optional C fallback
(``mpc_bulletproof_tpu.utils.native``) accelerates bulk generator-chain
derivation when built.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1

# Round constants for Keccak-f[1600].
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets, indexed [x][y].
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(value: int, shift: int) -> int:
    return ((value << shift) | (value >> (64 - shift))) & _MASK


def keccak_f1600(lanes: list[int]) -> list[int]:
    """One Keccak-f[1600] permutation over 25 uint64 lanes (x + 5*y order)."""
    a = lanes
    for rc in _RC:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rol(a[x + 5 * y], _ROT[x][y])
        # chi
        a = [
            b[i] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)]) & _MASK) & b[(i + 2) % 5 + 5 * (i // 5)]
            for i in range(25)
        ]
        # iota
        a[0] ^= rc
    return a


_RATE = 136  # bytes; Keccak-256 rate


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (original padding 0x01) of ``data``.

    Dispatches to the native core (utils/native.py) when built; the pure
    Python path below is the reference implementation.
    """
    if _native_keccak is not None:
        return _native_keccak(data)
    return _keccak256_py(data)


def _keccak256_py(data: bytes) -> bytes:
    state = [0] * 25
    # Absorb with multi-rate padding 0x01 .. 0x80.
    padded = bytearray(data)
    pad_len = _RATE - (len(padded) % _RATE)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80

    for off in range(0, len(padded), _RATE):
        block = padded[off : off + _RATE]
        for i in range(_RATE // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        state = keccak_f1600(state)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        out += state[i].to_bytes(8, "little")
    return bytes(out)


def pad_label(label: bytes) -> bytes:
    """Zero-pad a transcript label to the next multiple of 32 bytes.

    Transcript labels are absorbed as felt-aligned (32-byte) words so that a
    Cairo verifier can replay the hash chain over field elements.  Mirrors the
    merlin fork's ``pad_label`` used at reference src/transcript.rs:65-84 and
    src/generators.rs:84.
    """
    rem = (-len(label)) % 32
    return label + b"\x00" * rem


# Optional native backend (resolved lazily at import of this module's users).
_native_keccak = None


def _init_native():
    global _native_keccak
    try:
        from ..utils import native as _native

        if _native.available():
            _native_keccak = _native.keccak256
    except Exception:  # pragma: no cover - fallback to pure python
        _native_keccak = None


_init_native()
