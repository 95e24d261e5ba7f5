"""Split-table MSM, fast square roots, and the fabric point wire format.

The split table registers fixed bases with precomputed 2^64/2^128/2^192
shifts so MSMs run as four 64-bit scalar chunks (native/bpcore.cpp
``bp_points_new_split`` / ``bp_ipp_create_table``); the square root uses a
windowed Pohlig-Hellman dlog in the 2-Sylow subgroup (P-1 has 2-adicity
192); the fabric ships points uncompressed on its own wire.  All three are
perf paths whose outputs must be bit-identical to the reference algorithms.
"""

import random

import numpy as np
import pytest

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
    StarkPoint,
)
from mpc_bulletproof_tpu.ops.curve import P, _sqrt_mod_p
from mpc_bulletproof_tpu.utils import native

rng = random.Random(20240817)

needs_native = pytest.mark.skipif(
    not native.available(), reason="native core not built"
)


@needs_native
@pytest.mark.parametrize("k", [1, 2, 16, 65, 129])
def test_split_table_msm_matches_host(k):
    g = StarkPoint.generator()
    pts = [g.scalar_mul(Scalar(rng.getrandbits(64) + 1)) for _ in range(k)]
    if k > 2:
        pts[1] = StarkPoint.identity()  # identity propagates through shifts
    scalars = [Scalar(rng.getrandbits(252)) for _ in range(k)]
    scalars[0] = Scalar(0)  # zero chunks in every window
    want = StarkPoint.msm(scalars, pts)
    table = native.PointTable(pts, split=True)
    got = table.msm(scalars, np.arange(k, dtype=np.uint32))
    assert got == want


@needs_native
def test_split_table_indexed_subset():
    g = StarkPoint.generator()
    pts = [g.scalar_mul(Scalar(i + 2)) for i in range(40)]
    table = native.PointTable(pts, split=True)
    idx = np.asarray([3, 17, 17, 0, 39], dtype=np.uint32)
    scalars = [Scalar(rng.getrandbits(252)) for _ in range(len(idx))]
    want = StarkPoint.msm(scalars, [pts[i] for i in idx])
    assert table.msm(scalars, idx) == want


@needs_native
def test_ipp_create_table_bytes_match_python(monkeypatch):
    """The table-path IPP prover is byte-identical to the pure-python
    prover (same protocol, same transcript mutations)."""
    from mpc_bulletproof_tpu.models.inner_product import InnerProductProof

    n = 32
    pc = PedersenGens()
    bp = BulletproofGens(n, 1)
    G, H = bp.share(0).G(n), bp.share(0).H(n)
    a = [Scalar(rng.getrandbits(250)) for _ in range(n)]
    b = [Scalar(rng.getrandbits(250)) for _ in range(n)]
    Gf = [Scalar(1)] * n
    Hf = [Scalar(rng.getrandbits(250)) for _ in range(n)]
    w = Scalar(rng.getrandbits(250))
    Q = w * pc.B

    table, g_off, h_off, b_idx, _bb = bp.split_table(n, 1, pc)
    t1 = HashChainTranscript(b"split-ipp")
    proof = InnerProductProof.create(
        t1, Q, Gf, Hf, G, H, a, b, table_ctx=(table, g_off, h_off, b_idx, w)
    )

    monkeypatch.setenv("BP_NO_NATIVE", "1")
    native._LIB = None
    native._TRIED = True
    try:
        t2 = HashChainTranscript(b"split-ipp")
        proof2 = InnerProductProof.create(t2, Q, Gf, Hf, G, H, a, b)
    finally:
        native._TRIED = False
        monkeypatch.delenv("BP_NO_NATIVE")
        native._lib()
    assert proof.to_bytes() == proof2.to_bytes()
    assert t1.state == t2.state


def test_sqrt_roots_squares():
    for _ in range(40):
        x = rng.randrange(1, P)
        sq = x * x % P
        r = _sqrt_mod_p(sq)
        assert r is not None
        assert r * r % P == sq


def test_sqrt_zero_and_nonresidues():
    assert _sqrt_mod_p(0) == 0
    seen_none = 0
    for _ in range(60):
        x = rng.randrange(1, P)
        r = _sqrt_mod_p(x)
        if r is None:
            seen_none += 1
            assert pow(x, (P - 1) // 2, P) != 1  # really a non-residue
        else:
            assert r * r % P == x
    assert seen_none > 10  # ~half should be non-residues


def test_sqrt_matches_legendre():
    for _ in range(30):
        x = rng.randrange(1, P)
        is_qr = pow(x, (P - 1) // 2, P) == 1
        assert (_sqrt_mod_p(x) is not None) == is_qr


def test_fabric_point_wire_roundtrip():
    from mpc_bulletproof_tpu.parallel.fabric import _pack_points, _unpack_points

    g = StarkPoint.generator()
    pts = [
        StarkPoint.identity(),
        g,
        g.scalar_mul(Scalar(rng.getrandbits(200))),
        g.scalar_mul(Scalar(3)).neg() if hasattr(g, "neg") else -g.scalar_mul(Scalar(3)),
    ]
    assert _unpack_points(_pack_points(pts)) == pts


def test_fabric_point_wire_rejects_off_curve():
    from mpc_bulletproof_tpu.parallel.fabric import _pack_points, _unpack_points

    g = StarkPoint.generator()
    raw = bytearray(_pack_points([g]))
    raw[4 + 5] ^= 1  # corrupt x
    with pytest.raises(ValueError):
        _unpack_points(bytes(raw))


# ---------------------------------------------------------------------------
# Device split tables (ops/msm.build_split_affine_table + _msm_multi_table_impl)
# — the fused prover's round/commitment MSM path (64-bit chunks against a
# packed affine record table of 2^64-shifted bases).
# ---------------------------------------------------------------------------


def _device_mods():
    import jax
    import jax.numpy as jnp

    from mpc_bulletproof_tpu.ops import curve_jax as cj
    from mpc_bulletproof_tpu.ops import msm

    return jax, jnp, cj, msm


def test_device_split_table_records_match_host_shifts():
    jax, jnp, cj, msm = _device_mods()
    g = StarkPoint.generator()
    pts = [g.scalar_mul(Scalar(i + 2)) for i in range(5)]
    table = jax.jit(msm.build_split_affine_table)(
        jnp.asarray(cj.points_from_host(pts))
    )
    back = cj.points_to_host(
        msm._rows_affine_fetch(table, jnp.arange(4 * 5, dtype=jnp.int32))
    )
    for b in range(4):
        shift = Scalar(pow(2, 64 * b))
        for i, p in enumerate(pts):
            assert back[b * 5 + i] == p.scalar_mul(shift)


def test_device_multi_table_msm_matches_host():
    jax, jnp, cj, msm = _device_mods()
    g = StarkPoint.generator()
    npts = 6
    pts = [g.scalar_mul(Scalar(3 * i + 1)) for i in range(npts)]
    table = jax.jit(msm.build_split_affine_table)(
        jnp.asarray(cj.points_from_host(pts))
    )
    sclA = [Scalar(rng.getrandbits(251)) for _ in range(npts)]
    sclB = [Scalar(rng.getrandbits(251)) for _ in range(npts)]
    s4A = msm.split_scalars_device(jnp.asarray(cj.scalars_from_host(sclA)))
    s4B = msm.split_scalars_device(jnp.asarray(cj.scalars_from_host(sclB)))
    rec = jnp.asarray(
        msm.split_record_indices(np.arange(npts, dtype=np.int32), npts)
    )
    c = msm.select_window(4 * npts, msm.SPLIT_CHUNK_BITS)
    out = jax.jit(
        lambda a, b, r, t: msm._msm_multi_table_impl([(a, r), (b, r)], t, c)
    )(s4A, s4B, rec, table)
    assert cj.points_to_host(out[..., 0:1])[0] == StarkPoint.msm(sclA, pts)
    assert cj.points_to_host(out[..., 1:2])[0] == StarkPoint.msm(sclB, pts)


@needs_native
def test_byte_table_conflict_heavy_scalars():
    """Byte-path worst case: scalars with repeated byte digits force the
    same-bucket deferral path in every vector step (native
    msm_bytes_chunk_ifma); result must still match the host MSM."""
    g = StarkPoint.generator()
    k = 65
    pts = [g.scalar_mul(Scalar(rng.getrandbits(64) + 1)) for _ in range(k)]
    # every byte equal -> 32-way duplicate digits per point
    sames = [Scalar(int.from_bytes(bytes([0x5A]) * 31 + b"\x05", "little"))
             for _ in range(k)]
    # tiny scalars -> all high bytes zero (inactive lanes)
    tinies = [Scalar(i + 1) for i in range(k)]
    for scalars in (sames, tinies):
        want = StarkPoint.msm(scalars, pts)
        table = native.PointTable(pts, split=True)
        got = table.msm(scalars, np.arange(k, dtype=np.uint32))
        assert got == want


@needs_native
def test_byte_table_gate_respects_env(monkeypatch):
    """BP_BYTE_TABLE_MAX=0 disables the byte table; both routes agree."""
    g = StarkPoint.generator()
    k = 33
    pts = [g.scalar_mul(Scalar(3 * i + 2)) for i in range(k)]
    scalars = [Scalar(rng.getrandbits(252)) for _ in range(k)]
    want = StarkPoint.msm(scalars, pts)
    monkeypatch.setenv("BP_BYTE_TABLE_MAX", "0")
    t_split = native.PointTable(pts, split=True)
    monkeypatch.delenv("BP_BYTE_TABLE_MAX")
    t_bytes = native.PointTable(pts, split=True)
    idx = np.arange(k, dtype=np.uint32)
    assert t_split.msm(scalars, idx) == want
    assert t_bytes.msm(scalars, idx) == want
