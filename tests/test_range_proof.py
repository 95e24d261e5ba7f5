"""Range proof round trips: single + aggregated, README doctest vector,
serialization, negative tests, and faulty-party detection."""

import random

import pytest

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
)
from mpc_bulletproof_tpu.models.range_proof import RangeProof
from mpc_bulletproof_tpu.models.range_proof.dealer import Dealer
from mpc_bulletproof_tpu.models.range_proof.party import Party
from mpc_bulletproof_tpu.utils.errors import MPCError, VerificationError

rng = random.Random(777)
PC = PedersenGens()
BP = BulletproofGens(64, 8)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def test_readme_doctest_vector():
    """Mirrors the reference README example: secret 1037578891 in [0, 2^32)."""
    secret_value = 1037578891
    blinding = rand_scalar()
    t = HashChainTranscript(b"doctest example")
    proof, committed_value = RangeProof.prove_single(BP, PC, t, secret_value, blinding, 32)

    t2 = HashChainTranscript(b"doctest example")
    proof.verify_single(BP, PC, t2, committed_value, 32)  # raises on failure

    # serialization round trip
    restored = RangeProof.from_bytes(proof.to_bytes())
    assert restored == proof
    t3 = HashChainTranscript(b"doctest example")
    restored.verify_single(BP, PC, t3, committed_value, 32)


@pytest.mark.parametrize("n", [8, 16, 32, 64])
def test_single_roundtrip_sizes(n):
    v = rng.randrange(0, 1 << n)
    t = HashChainTranscript(b"rp")
    proof, V = RangeProof.prove_single(BP, PC, t, v, rand_scalar(), n)
    # proof size = (9 + 2 log2 n) * 32
    k = n.bit_length() - 1
    assert len(proof.to_bytes()) == (9 + 2 * k) * 32
    t2 = HashChainTranscript(b"rp")
    proof.verify_single(BP, PC, t2, V, n)


@pytest.mark.parametrize("m", [1, 2, 4, 8])
def test_aggregated_roundtrip(m):
    n = 16
    values = [rng.randrange(0, 1 << n) for _ in range(m)]
    blindings = [rand_scalar() for _ in range(m)]
    t = HashChainTranscript(b"agg")
    proof, comms = RangeProof.prove_multiple(BP, PC, t, values, blindings, n)
    t2 = HashChainTranscript(b"agg")
    proof.verify_multiple(BP, PC, t2, comms, n)


def test_out_of_range_value_rejected_at_party():
    with pytest.raises(MPCError):
        Party.new(BP, PC, 1 << 16, rand_scalar(), 16)


def test_wrong_commitment_fails():
    n = 16
    t = HashChainTranscript(b"rp")
    proof, V = RangeProof.prove_single(BP, PC, t, 123, rand_scalar(), n)
    bad_V = V + PC.B
    t2 = HashChainTranscript(b"rp")
    with pytest.raises(VerificationError):
        proof.verify_single(BP, PC, t2, bad_V, n)


def test_tampered_proof_fails():
    n = 16
    t = HashChainTranscript(b"rp")
    proof, V = RangeProof.prove_single(BP, PC, t, 123, rand_scalar(), n)
    proof.t_x = proof.t_x + Scalar(1)
    t2 = HashChainTranscript(b"rp")
    with pytest.raises(VerificationError):
        proof.verify_single(BP, PC, t2, V, n)


def test_wrong_n_fails():
    t = HashChainTranscript(b"rp")
    proof, V = RangeProof.prove_single(BP, PC, t, 123, rand_scalar(), 16)
    t2 = HashChainTranscript(b"rp")
    with pytest.raises(VerificationError):
        proof.verify_single(BP, PC, t2, V, 32)


def test_dealer_detects_faulty_party():
    """A party sending a corrupted ProofShare is identified by index."""
    n, m = 16, 4
    values = [rng.randrange(0, 1 << n) for _ in range(m)]
    blindings = [rand_scalar() for _ in range(m)]
    t = HashChainTranscript(b"audit")
    dealer = Dealer.new(BP, PC, t, n, m)
    parties = [Party.new(BP, PC, v, b, n) for v, b in zip(values, blindings)]
    positioned, bcs = zip(*(p.assign_position(j) for j, p in enumerate(parties)))
    dealer, bit_ch = dealer.receive_bit_commitments(list(bcs))
    polied, pcs = zip(*(p.apply_challenge(bit_ch) for p in positioned))
    dealer, poly_ch = dealer.receive_poly_commitments(list(pcs))
    shares = [p.apply_challenge(poly_ch) for p in polied]
    # Party 2 corrupts its share.
    shares[2].t_x = shares[2].t_x + Scalar(1)
    with pytest.raises(MPCError, match=r"\[2\]"):
        dealer.receive_shares(shares)


def test_party_states_are_one_shot():
    p = Party.new(BP, PC, 5, rand_scalar(), 16)
    st, _ = p.assign_position(0)
    with pytest.raises(MPCError):
        p.assign_position(1)


def test_batch_verification():
    """verify_batch: one MSM over many independent proofs."""
    from mpc_bulletproof_tpu.models.range_proof import RangeProof

    proofs, transcripts, comm_lists = [], [], []
    for k in range(3):
        values = [rng.getrandbits(32) for _ in range(4)]
        blinds = [rand_scalar() for _ in range(4)]
        t = HashChainTranscript(b"batch-%d" % k)
        proof, comms = RangeProof.prove_multiple(BP, PC, t, values, blinds, 32)
        proofs.append(proof)
        transcripts.append(HashChainTranscript(b"batch-%d" % k))
        comm_lists.append(comms)
    RangeProof.verify_batch(proofs, BP, PC, transcripts, comm_lists, 32)


def test_batch_verification_rejects_bad_proof():
    from mpc_bulletproof_tpu.models.range_proof import RangeProof

    proofs, transcripts, comm_lists = [], [], []
    for k in range(3):
        t = HashChainTranscript(b"batchbad-%d" % k)
        proof, comms = RangeProof.prove_multiple(
            BP, PC, t, [5, 6, 7, 8], [rand_scalar() for _ in range(4)], 32
        )
        proofs.append(proof)
        transcripts.append(HashChainTranscript(b"batchbad-%d" % k))
        comm_lists.append(comms)
    # corrupt one commitment in the middle proof
    comm_lists[1] = list(comm_lists[1])
    from mpc_bulletproof_tpu import StarkPoint

    comm_lists[1][2] = comm_lists[1][2] + StarkPoint.generator()
    with pytest.raises(VerificationError):
        RangeProof.verify_batch(proofs, BP, PC, transcripts, comm_lists, 32)
