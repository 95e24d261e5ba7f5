"""Keccak-256 known-answer tests (pre-NIST padding, Ethereum/StarkNet flavor)."""

from mpc_bulletproof_tpu.ops.keccak import keccak256, pad_label


def test_keccak256_empty():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak256_abc():
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak256_long_input_multiblock():
    # 200 bytes crosses the 136-byte rate boundary.
    data = bytes(range(200))
    d1 = keccak256(data)
    # Deterministic
    assert d1 == keccak256(data)
    assert len(d1) == 32
    # Known answer for 135/136-byte edge (padding in its own block).
    assert keccak256(b"\x00" * 136) != keccak256(b"\x00" * 135)


def test_pad_label():
    assert pad_label(b"") == b""
    assert pad_label(b"a") == b"a" + b"\x00" * 31
    assert pad_label(b"x" * 32) == b"x" * 32
    assert pad_label(b"x" * 33) == b"x" * 33 + b"\x00" * 31
