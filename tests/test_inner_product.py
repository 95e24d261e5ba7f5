"""IPP create/verify round trips, mirroring reference inner_product_proof.rs
tests (make_ipp_1/2/4/32/64, serialization round trip)."""

import random

import pytest

from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, Scalar, StarkPoint
from mpc_bulletproof_tpu.models.inner_product import InnerProductProof
from mpc_bulletproof_tpu.ops.field import inner_product, scalar_powers
from mpc_bulletproof_tpu.utils.errors import VerificationError

rng = random.Random(42)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def setup(n):
    bp_gens = BulletproofGens(n, 1)
    G = bp_gens.share(0).G(n)
    H = bp_gens.share(0).H(n)
    Q = StarkPoint.random()
    a = [rand_scalar() for _ in range(n)]
    b = [rand_scalar() for _ in range(n)]
    G_factors = [Scalar(1)] * n
    y_inv = rand_scalar()
    H_factors = scalar_powers(y_inv, n)
    # P = <a, G> + <b o y^-n, H> + <a,b> Q
    b_prime = [bi * yi for bi, yi in zip(b, H_factors)]
    c = inner_product(a, b)
    P = StarkPoint.msm(a + b_prime + [c], G + H + [Q])
    return Q, G_factors, H_factors, G, H, a, b, P


@pytest.mark.parametrize("n", [1, 2, 4, 32, 64])
def test_create_and_verify(n):
    Q, Gf, Hf, G, H, a, b, P = setup(n)
    t = HashChainTranscript(b"innerproducttest")
    proof = InnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    assert len(proof.L_vec) == max(0, n.bit_length() - 1)

    t2 = HashChainTranscript(b"innerproducttest")
    proof.verify(n, t2, Gf, Hf, P, Q, G, H)  # raises on failure

    # serialization round trip then verify again
    proof2 = InnerProductProof.from_bytes(proof.to_bytes())
    assert proof2 == proof
    t3 = HashChainTranscript(b"innerproducttest")
    proof2.verify(n, t3, Gf, Hf, P, Q, G, H)


def test_verify_rejects_wrong_statement():
    n = 4
    Q, Gf, Hf, G, H, a, b, P = setup(n)
    t = HashChainTranscript(b"innerproducttest")
    proof = InnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    bad_P = P + StarkPoint.generator()
    t2 = HashChainTranscript(b"innerproducttest")
    with pytest.raises(VerificationError):
        proof.verify(n, t2, Gf, Hf, bad_P, Q, G, H)


def test_verify_rejects_tampered_proof():
    n = 4
    Q, Gf, Hf, G, H, a, b, P = setup(n)
    t = HashChainTranscript(b"innerproducttest")
    proof = InnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    proof.a = proof.a + Scalar(1)
    t2 = HashChainTranscript(b"innerproducttest")
    with pytest.raises(VerificationError):
        proof.verify(n, t2, Gf, Hf, P, Q, G, H)


def test_wrong_transcript_label_fails():
    n = 2
    Q, Gf, Hf, G, H, a, b, P = setup(n)
    t = HashChainTranscript(b"innerproducttest")
    proof = InnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    t2 = HashChainTranscript(b"different")
    with pytest.raises(VerificationError):
        proof.verify(n, t2, Gf, Hf, P, Q, G, H)


def test_folding_and_coefficient_provers_agree():
    """The classic folding prover (reference structure) and the
    coefficient-tracking prover are algebraically identical: same
    transcript, same proof bytes."""
    from mpc_bulletproof_tpu.models.inner_product import (
        _create_host,
        _create_host_folding,
    )

    n = 16
    Q, Gf, Hf, G, H, a, b, P = setup(n)
    t1 = HashChainTranscript(b"agree")
    t1.innerproduct_domain_sep(n)
    p1 = _create_host_folding(t1, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    t2 = HashChainTranscript(b"agree")
    t2.innerproduct_domain_sep(n)
    p2 = _create_host(t2, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    assert p1.to_bytes() == p2.to_bytes()
    assert t1.state == t2.state
