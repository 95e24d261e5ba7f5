"""Single-prover R1CS suite, mirroring reference tests/r1cs.rs:
shuffle gadget round trips, example gadget positive/negative + serialization,
range gadget, and the constraint-weights IR export."""

import random

import pytest

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
)
from mpc_bulletproof_tpu.models.r1cs import (
    CircuitWeights,
    Prover,
    R1CSProof,
    Verifier,
)
from mpc_bulletproof_tpu.models.r1cs.gadgets import (
    example_gadget,
    range_check_gadget,
    shuffle_gadget,
)
from mpc_bulletproof_tpu.utils.errors import (
    MissingAssignmentError,
    R1CSError,
    VerificationError,
)

rng = random.Random(2024)
PC_GENS = PedersenGens()
BP_GENS = BulletproofGens(128, 1)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


# ---------------------------------------------------------------------------
# shuffle gadget (2-phase randomized constraints)
# ---------------------------------------------------------------------------

def shuffle_prove(inputs, outputs):
    transcript = HashChainTranscript(b"ShuffleProofTest")
    transcript.append_message(b"dom-sep", b"ShuffleProof")
    transcript.append_u64(b"k", len(inputs))
    prover = Prover(PC_GENS, transcript)
    in_pairs = [prover.commit(v, rand_scalar()) for v in inputs]
    out_pairs = [prover.commit(v, rand_scalar()) for v in outputs]
    shuffle_gadget(prover, [p[1] for p in in_pairs], [p[1] for p in out_pairs])
    proof = prover.prove(BP_GENS)
    return proof, [p[0] for p in in_pairs], [p[0] for p in out_pairs]


def shuffle_verify(proof, in_comms, out_comms):
    transcript = HashChainTranscript(b"ShuffleProofTest")
    transcript.append_message(b"dom-sep", b"ShuffleProof")
    transcript.append_u64(b"k", len(in_comms))
    verifier = Verifier(PC_GENS, transcript)
    in_vars = [verifier.commit(c) for c in in_comms]
    out_vars = [verifier.commit(c) for c in out_comms]
    shuffle_gadget(verifier, in_vars, out_vars)
    verifier.verify(proof, BP_GENS)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 7, 24])
def test_shuffle_roundtrip(k):
    inputs = [rand_scalar() for _ in range(k)]
    outputs = list(inputs)
    rng.shuffle(outputs)
    proof, in_c, out_c = shuffle_prove(inputs, outputs)
    shuffle_verify(proof, in_c, out_c)


def test_shuffle_rejects_non_permutation():
    k = 5
    inputs = [rand_scalar() for _ in range(k)]
    outputs = [rand_scalar() for _ in range(k)]  # almost surely not a perm
    proof, in_c, out_c = shuffle_prove(inputs, outputs)
    with pytest.raises(VerificationError):
        shuffle_verify(proof, in_c, out_c)


# ---------------------------------------------------------------------------
# example gadget (a1+a2)*(b1+b2) = (c1+c2)
# ---------------------------------------------------------------------------

def example_prove(a1, a2, b1, b2, c1, c2):
    transcript = HashChainTranscript(b"R1CSExampleGadget")
    prover = Prover(PC_GENS, transcript)
    pairs = [prover.commit(Scalar(v), rand_scalar()) for v in (a1, a2, b1, b2, c1)]
    vars_ = [p[1] for p in pairs]
    example_gadget(
        prover,
        vars_[0].to_lc(), vars_[1].to_lc(), vars_[2].to_lc(),
        vars_[3].to_lc(), vars_[4].to_lc(), Scalar(c2) * __import__(
            "mpc_bulletproof_tpu.models.r1cs.linear_combination", fromlist=["Variable"]
        ).Variable.one(),
    )
    proof = prover.prove(BP_GENS)
    return proof, [p[0] for p in pairs]


def example_verify(c2, proof, commitments):
    transcript = HashChainTranscript(b"R1CSExampleGadget")
    verifier = Verifier(PC_GENS, transcript)
    from mpc_bulletproof_tpu.models.r1cs.linear_combination import Variable

    vars_ = [verifier.commit(c) for c in commitments]
    example_gadget(
        verifier,
        vars_[0].to_lc(), vars_[1].to_lc(), vars_[2].to_lc(),
        vars_[3].to_lc(), vars_[4].to_lc(), Scalar(c2) * Variable.one(),
    )
    verifier.verify(proof, BP_GENS)


def test_example_gadget_roundtrip():
    # (3 + 4) * (6 + 1) = (40 + 9)
    proof, comms = example_prove(3, 4, 6, 1, 40, 9)
    example_verify(9, proof, comms)


def test_example_gadget_wrong_statement_fails():
    # (3 + 4) * (6 + 1) != (40 + 10)
    proof, comms = example_prove(3, 4, 6, 1, 40, 10)
    with pytest.raises(VerificationError):
        example_verify(10, proof, comms)


def test_example_gadget_serialization_roundtrip():
    proof, comms = example_prove(3, 4, 6, 1, 40, 9)
    data = proof.to_bytes()
    restored = R1CSProof.from_bytes(data)
    assert restored == proof
    example_verify(9, restored, comms)
    # one-phase proof: version byte 0, 11 elements + ipp
    assert data[0] == 0
    assert len(data) == proof.serialized_size()


def test_two_phase_proof_has_version_byte_one():
    inputs = [rand_scalar() for _ in range(4)]
    outputs = list(inputs)
    rng.shuffle(outputs)
    proof, _, _ = shuffle_prove(inputs, outputs)
    assert proof.to_bytes()[0] == 1
    assert not proof.missing_phase2_commitments()
    restored = R1CSProof.from_bytes(proof.to_bytes())
    assert restored == proof


# ---------------------------------------------------------------------------
# range gadget
# ---------------------------------------------------------------------------

def range_helper(v_val, n):
    transcript = HashChainTranscript(b"RangeProofTest")
    prover = Prover(PC_GENS, transcript)
    com, var = prover.commit(Scalar(v_val), rand_scalar())
    range_check_gadget(prover, var.to_lc(), v_val, n)
    if not prover.constraints_satisfied():
        raise VerificationError("constraints unsatisfied")
    proof = prover.prove(BP_GENS)

    vt = HashChainTranscript(b"RangeProofTest")
    verifier = Verifier(PC_GENS, vt)
    vvar = verifier.commit(com)
    range_check_gadget(verifier, vvar.to_lc(), None, n)
    verifier.verify(proof, BP_GENS)


@pytest.mark.parametrize("n", [2, 10, 32, 63])
def test_range_gadget(n):
    maxv = (1 << n) - 1
    for v in [rng.randrange(0, maxv) for _ in range(2)]:
        range_helper(v, n)
    with pytest.raises((VerificationError, R1CSError)):
        range_helper(maxv + 1, n)


# ---------------------------------------------------------------------------
# weights IR export
# ---------------------------------------------------------------------------

def test_weights_ir_prover_verifier_match():
    """Prover and verifier derive identical CircuitWeights; JSON round trips."""
    def build(cs, vars_):
        from mpc_bulletproof_tpu.models.r1cs.linear_combination import Variable

        example_gadget(
            cs,
            vars_[0].to_lc(), vars_[1].to_lc(), vars_[2].to_lc(),
            vars_[3].to_lc(), vars_[4].to_lc(), Scalar(9) * Variable.one(),
        )

    tp = HashChainTranscript(b"ir")
    prover = Prover(PC_GENS, tp)
    pairs = [prover.commit(Scalar(v), rand_scalar()) for v in (3, 4, 6, 1, 40)]
    build(prover, [p[1] for p in pairs])
    pw = prover.get_weights()

    tv = HashChainTranscript(b"ir")
    verifier = Verifier(PC_GENS, tv)
    vvars = [verifier.commit(p[0]) for p in pairs]
    build(verifier, vvars)
    vw = verifier.get_weights()

    assert pw == vw
    assert CircuitWeights.from_json(pw.to_json()) == pw

    # Hand-derived structure: the single multiply adds 2 constraints
    # (left/right wiring) + 1 output constraint.
    assert len(pw.w_l.rows) == 3
    # first constraint: a1 + a2 - aL_0 = 0 -> w_l row [(0, -1)], w_v [(0,-1),(1,-1)]
    assert pw.w_l.rows[0].entries == [(0, Scalar(-1))]
    assert pw.w_v.rows[0].entries == [(0, Scalar(-1)), (1, Scalar(-1))]
    # second: b1 + b2 - aR_0 = 0
    assert pw.w_r.rows[1].entries == [(0, Scalar(-1))]
    # third: c1 + c2 - aO_0 = 0 -> w_o [(0,-1)], w_v [(4,-1)], c = 9
    assert pw.w_o.rows[2].entries == [(0, Scalar(-1))]
    # Constant terms are negated in the IR (moved to the RHS of lc = 0).
    assert pw.c.entries == [(2, Scalar(-9))]


def test_prover_missing_assignment():
    transcript = HashChainTranscript(b"x")
    prover = Prover(PC_GENS, transcript)
    with pytest.raises(MissingAssignmentError):
        prover.allocate(None)


def test_lc_one_minus_one_is_zero():
    """Mirrors reference linear_combination.rs:309-335: eval(1*One - 1) == 0."""
    from mpc_bulletproof_tpu.models.r1cs.linear_combination import Variable

    transcript = HashChainTranscript(b"lc")
    prover = Prover(PC_GENS, transcript)
    lc = Variable.one() - 1
    assert prover.eval(lc).is_zero()


def test_shuffle_k42():
    inputs = [rand_scalar() for _ in range(42)]
    outputs = list(inputs)
    rng.shuffle(outputs)
    proof, in_c, out_c = shuffle_prove(inputs, outputs)
    shuffle_verify(proof, in_c, out_c)


def test_zero_multiplier_circuit():
    """Constraints over committed variables only (no multiplication gates)."""
    transcript = HashChainTranscript(b"nogates")
    prover = Prover(PC_GENS, transcript)
    c1, v1 = prover.commit(Scalar(5), rand_scalar())
    c2, v2 = prover.commit(Scalar(5), rand_scalar())
    prover.constrain(v1 - v2)
    proof = prover.prove(BP_GENS)

    vt = HashChainTranscript(b"nogates")
    verifier = Verifier(PC_GENS, vt)
    w1, w2 = verifier.commit(c1), verifier.commit(c2)
    verifier.constrain(w1 - w2)
    verifier.verify(proof, BP_GENS)


def test_odd_allocate_pending_multiplier():
    """allocate() an odd number of variables: the half-assigned multiplier
    pairs with an implicit zero (reference constraint_system.rs:98-108)."""
    transcript = HashChainTranscript(b"odd")
    prover = Prover(PC_GENS, transcript)
    vals = [Scalar(2), Scalar(3), Scalar(4)]
    vars_ = [prover.allocate(v) for v in vals]
    # 2 + 3 + 4 = 9
    prover.constrain(vars_[0] + vars_[1] + vars_[2] - 9)
    proof = prover.prove(BP_GENS)

    vt = HashChainTranscript(b"odd")
    verifier = Verifier(PC_GENS, vt)
    wvars = [verifier.allocate() for _ in range(3)]
    verifier.constrain(wvars[0] + wvars[1] + wvars[2] - 9)
    verifier.verify(proof, BP_GENS)
