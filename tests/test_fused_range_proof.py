"""Fused on-device aggregated range prover vs the host party/dealer path.

Same blinding stream -> byte-identical proof and transcript state.  Runs
through the Pallas interpreter on CPU (slow but exact); the TPU benchmarks
exercise the compiled path.
"""

import hashlib
import random

import pytest

from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, PedersenGens, Scalar
from mpc_bulletproof_tpu.models.range_proof import RangeProof
from mpc_bulletproof_tpu.models.range_proof.dealer import Dealer
from mpc_bulletproof_tpu.models.range_proof.fused_device import prove_multiple_device
from mpc_bulletproof_tpu.models.range_proof.party import Party


def det_stream():
    state = {"ctr": 0}

    def rng_bytes(k: int) -> bytes:
        out = b""
        while len(out) < k:
            out += hashlib.sha256(b"fused-test" + state["ctr"].to_bytes(4, "big")).digest()
            state["ctr"] += 1
        return out[:k]

    return rng_bytes


def host_prove(bp_gens, pc_gens, transcript, values, blindings, n, rng_bytes):
    """The party/dealer flow of RangeProof.prove_multiple with injected rng,
    drawing in the same order as the fused prover (party-major phases)."""
    m = len(values)
    dealer = Dealer.new(bp_gens, pc_gens, transcript, n, m)
    parties = [
        Party.new(bp_gens, pc_gens, v, b, n) for v, b in zip(values, blindings)
    ]
    positioned, bit_comms = [], []
    for j, p in enumerate(parties):
        st, bc = p.assign_position(j, rng_bytes=rng_bytes)
        positioned.append(st)
        bit_comms.append(bc)
    dealer, bit_challenge = dealer.receive_bit_commitments(bit_comms)
    polied, poly_comms = [], []
    for p in positioned:
        st, pc = p.apply_challenge(bit_challenge)
        polied.append(st)
        poly_comms.append(pc)
    dealer, poly_challenge = dealer.receive_poly_commitments(poly_comms)
    shares = [p.apply_challenge(poly_challenge) for p in polied]
    proof = dealer.receive_trusted_shares(shares)
    return proof, [bc.V_j for bc in bit_comms]


@pytest.mark.heavy_compile
@pytest.mark.parametrize("n,m", [(8, 2)])
def test_fused_range_prover_matches_host(n, m):
    rng = random.Random(909)
    bp_gens = BulletproofGens(n, m)
    pc_gens = PedersenGens()
    values = [rng.randrange(1 << n) for _ in range(m)]
    blindings = [Scalar(rng.getrandbits(251)) for _ in range(m)]

    t_host = HashChainTranscript(b"fused-rp")
    p_host, v_host = host_prove(
        bp_gens, pc_gens, t_host, values, blindings, n, det_stream()
    )

    t_dev = HashChainTranscript(b"fused-rp")
    p_dev, v_dev = prove_multiple_device(
        bp_gens, pc_gens, t_dev, values, blindings, n, rng_bytes=det_stream()
    )

    assert [v.to_bytes() for v in v_dev] == [v.to_bytes() for v in v_host]
    assert p_dev.to_bytes() == p_host.to_bytes()
    assert t_dev.state == t_host.state


@pytest.mark.heavy_compile
@pytest.mark.parametrize("n,m,ndev", [(8, 2, 2)])
def test_fused_range_prover_sharded_matches_host(n, m, ndev):
    """The SPMD (shard_map) fused prover produces byte-identical proofs:
    per-round pair MSMs shard over mesh lanes with one all_gather each,
    and the replicated transcript chain must stay in lockstep."""
    from mpc_bulletproof_tpu.parallel import sharded

    rng = random.Random(910)
    bp_gens = BulletproofGens(n, m)
    pc_gens = PedersenGens()
    values = [rng.randrange(1 << n) for _ in range(m)]
    blindings = [Scalar(rng.getrandbits(251)) for _ in range(m)]

    t_host = HashChainTranscript(b"fused-rp-sh")
    p_host, v_host = host_prove(
        bp_gens, pc_gens, t_host, values, blindings, n, det_stream()
    )

    mesh = sharded.make_mesh(ndev)
    t_dev = HashChainTranscript(b"fused-rp-sh")
    p_dev, v_dev = prove_multiple_device(
        bp_gens, pc_gens, t_dev, values, blindings, n,
        rng_bytes=det_stream(), mesh=mesh,
    )

    assert [v.to_bytes() for v in v_dev] == [v.to_bytes() for v in v_host]
    assert p_dev.to_bytes() == p_host.to_bytes()
    assert t_dev.state == t_host.state

    # and the proof verifies through the standard verifier (transcript
    # label must match the proving transcript's)
    tv = HashChainTranscript(b"fused-rp-sh")
    p_dev.verify_multiple(bp_gens, pc_gens, tv, v_dev, n)
