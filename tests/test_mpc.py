"""Two-party MPC tests: fabric primitives, shared IPP, collaborative R1CS.

Both parties run as threads over the in-process transport — the same
coverage as the reference's 2-process integration suite
(integration/mpc_inner_product.rs, integration/mpc_prover.rs), including
transcript synchronization and malleability (MAC-failure) tests.
"""

import random
import threading

import pytest

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
    StarkPoint,
)
from mpc_bulletproof_tpu.models.inner_product import InnerProductProof
from mpc_bulletproof_tpu.models.r1cs import Prover, Verifier
from mpc_bulletproof_tpu.models.r1cs.gadgets import example_gadget
from mpc_bulletproof_tpu.models.r1cs_mpc import MpcProver, SharedInnerProductProof
from mpc_bulletproof_tpu.ops.field import inner_product, scalar_powers
from mpc_bulletproof_tpu.parallel.beaver import PartyIdBeaverSource
from mpc_bulletproof_tpu.parallel.fabric import AuthenticatedScalarVector, MpcFabric
from mpc_bulletproof_tpu.parallel.network import make_local_pair
from mpc_bulletproof_tpu.transcript import MpcTranscript
from mpc_bulletproof_tpu.utils.errors import AuthenticationError

rng = random.Random(31337)
PC = PedersenGens()
BP = BulletproofGens(64, 1)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def run_two_parties(fn0, fn1):
    """Run both party closures over a local transport; returns [res0, res1]."""
    net0, net1 = make_local_pair()
    fabrics = [
        MpcFabric(net0, PartyIdBeaverSource(0)),
        MpcFabric(net1, PartyIdBeaverSource(1)),
    ]
    results = [None, None]
    errors = [None, None]

    def runner(i, fn):
        try:
            results[i] = fn(fabrics[i])
        except Exception as exc:  # noqa: BLE001 - surfaced below
            errors[i] = exc

    threads = [
        threading.Thread(target=runner, args=(0, fn0)),
        threading.Thread(target=runner, args=(1, fn1)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    for err in errors:
        if err is not None:
            raise err
    return results


# ---------------------------------------------------------------------------
# fabric primitives
# ---------------------------------------------------------------------------

def test_share_and_open():
    values = [rand_scalar() for _ in range(5)]

    def party0(fabric):
        shared = fabric.batch_share_scalars(values, owner=0)
        return shared.open_authenticated()

    def party1(fabric):
        shared = fabric.batch_share_scalars(None, owner=0, count=5)
        return shared.open_authenticated()

    r0, r1 = run_two_parties(party0, party1)
    assert r0 == values and r1 == values


def test_beaver_mul():
    xs = [rand_scalar() for _ in range(4)]
    ys = [rand_scalar() for _ in range(4)]

    def party(owner_vals):
        def fn(fabric):
            x = fabric.batch_share_scalars(
                xs if fabric.party_id == 0 else None, owner=0, count=4
            )
            y = fabric.batch_share_scalars(
                ys if fabric.party_id == 1 else None, owner=1, count=4
            )
            z = fabric.beaver_mul(x, y)
            return z.open_authenticated()

        return fn

    r0, r1 = run_two_parties(party(0), party(1))
    expect = [a * b for a, b in zip(xs, ys)]
    assert r0 == expect and r1 == expect


def test_linear_ops_and_inner_product():
    xs = [Scalar(i + 1) for i in range(6)]
    ys = [Scalar(2 * i + 1) for i in range(6)]

    def fn(fabric):
        x = fabric.batch_share_scalars(xs if fabric.party_id == 0 else None, 0, count=6)
        y = fabric.batch_share_scalars(ys if fabric.party_id == 1 else None, 1, count=6)
        combo = (x + y).mul_public(Scalar(3)) - y
        opened_combo = combo.open_authenticated()
        ip = fabric.inner_product(x, y).open_authenticated()[0]
        return opened_combo, ip

    (c0, ip0), (c1, ip1) = run_two_parties(fn, fn)
    expect_combo = [(a + b) * Scalar(3) - b for a, b in zip(xs, ys)]
    assert c0 == expect_combo == c1
    assert ip0 == inner_product(xs, ys) == ip1


def test_mac_check_fails_on_tampered_share():
    def party0(fabric):
        shared = fabric.batch_share_scalars([Scalar(42)], owner=0)
        shared.shares[0] = shared.shares[0] + Scalar(1)  # malleate
        with pytest.raises(AuthenticationError):
            shared.open_authenticated()
        return True

    def party1(fabric):
        shared = fabric.batch_share_scalars(None, owner=0, count=1)
        with pytest.raises(AuthenticationError):
            shared.open_authenticated()
        return True

    assert run_two_parties(party0, party1) == [True, True]


def test_rushing_adversary_cannot_forge_mac_check():
    """A malicious party that malleates its share, then *waits* for the
    honest sigma and replies with its negation, must still fail the open:
    the commit-then-reveal round binds its sigma before the honest value is
    revealed (ADVICE round 1 / SPDZ commit-reveal requirement)."""
    from mpc_bulletproof_tpu.ops.keccak import keccak256
    from mpc_bulletproof_tpu.parallel.fabric import _pack_scalars, _unpack_scalars

    def honest(fabric):
        shared = fabric.batch_share_scalars([Scalar(42)], owner=0)
        with pytest.raises(AuthenticationError):
            shared.open_authenticated()
        return True

    def rushing(fabric):
        shared = fabric.batch_share_scalars(None, owner=0, count=1)
        # Malleate, then speak the open protocol raw, rushing every round.
        tampered = shared.shares[0] + Scalar(1)
        net = fabric.net
        # open_batch share exchange (send the tampered share).
        net.send_bytes(_pack_scalars([tampered]))
        opened = tampered + _unpack_scalars(net.recv_bytes())[0]
        # Commitment round: commit to garbage before seeing the honest sigma
        # (the hash hides it, so there is nothing useful to adapt to).
        salt = b"\xAA" * 32
        garbage = _pack_scalars([Scalar(0)])
        _honest_commit = net.recv_bytes()
        net.send_bytes(keccak256(garbage + salt))
        # Reveal round: now we see the honest sigma and reply with its
        # negation — exactly the forgery that passes a commitment-free check.
        honest_blob = net.recv_bytes()
        honest_sigma = _unpack_scalars(honest_blob[:-32])[0]
        net.send_bytes(_pack_scalars([-honest_sigma]) + salt)
        return opened

    results = run_two_parties(honest, rushing)
    assert results[0] is True


def test_shared_point_msm_and_open():
    g = StarkPoint.generator()
    pts = [g.scalar_mul(Scalar(i + 2)) for i in range(3)]
    scalars = [Scalar(5), Scalar(7), Scalar(9)]

    def fn(fabric):
        s = fabric.batch_share_scalars(
            scalars if fabric.party_id == 0 else None, 0, count=3
        )
        shared_pt = fabric.shared_msm(s, pts)
        return shared_pt.open_authenticated()

    r0, r1 = run_two_parties(fn, fn)
    expect = StarkPoint.msm(scalars, pts)
    assert r0 == expect == r1


# ---------------------------------------------------------------------------
# shared inner-product proof (integration/mpc_inner_product.rs analogue)
# ---------------------------------------------------------------------------

def shared_ipp_helper(n, tamper=False):
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0xABCDEF))
    a = [rand_scalar() for _ in range(n)]
    b = [rand_scalar() for _ in range(n)]
    y_inv = rand_scalar()
    G_factors = [Scalar(1)] * n
    H_factors = scalar_powers(y_inv, n)

    def fn(fabric):
        a_sh = fabric.batch_share_scalars(a if fabric.party_id == 0 else None, 0, count=n)
        b_sh = fabric.batch_share_scalars(b if fabric.party_id == 1 else None, 1, count=n)
        t = MpcTranscript(HashChainTranscript(b"ipptest"))
        proof = SharedInnerProductProof.create(
            t, Q, G_factors, H_factors, list(G), list(H), a_sh, b_sh, fabric
        )
        if tamper and fabric.party_id == 0:
            proof.a.shares[0] = proof.a.shares[0] + Scalar(1)
        return proof.open()

    return run_two_parties(fn, fn)


@pytest.mark.parametrize("n", [2, 8, 32])
def test_shared_ipp_roundtrip(n):
    p0, p1 = shared_ipp_helper(n)
    assert p0 == p1  # both parties assemble the same opened proof

    # Verify against P built from the plain witness.
    a = None
    # recompute the same witness deterministically is awkward; instead verify
    # the algebraic relation via the proof's own verify with P reconstructed
    # from the opened a,b is not possible — so verify like the reference
    # does: construct P from the original inputs.


def test_shared_ipp_verifies():
    n = 8
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0xABCDEF))
    a = [rand_scalar() for _ in range(n)]
    b = [rand_scalar() for _ in range(n)]
    y_inv = rand_scalar()
    G_factors = [Scalar(1)] * n
    H_factors = scalar_powers(y_inv, n)

    def fn(fabric):
        a_sh = fabric.batch_share_scalars(a if fabric.party_id == 0 else None, 0, count=n)
        b_sh = fabric.batch_share_scalars(b if fabric.party_id == 1 else None, 1, count=n)
        t = MpcTranscript(HashChainTranscript(b"ipptest"))
        proof = SharedInnerProductProof.create(
            t, Q, G_factors, H_factors, list(G), list(H), a_sh, b_sh, fabric
        )
        return proof.open()

    p0, p1 = run_two_parties(fn, fn)
    assert p0 == p1

    b_prime = [bi * yi for bi, yi in zip(b, H_factors)]
    c = inner_product(a, b)
    P = StarkPoint.msm(a + b_prime + [c], G + H + [Q])
    t = HashChainTranscript(b"ipptest")
    p0.verify(n, t, G_factors, H_factors, P, Q, G, H)


def test_shared_ipp_malleability_detected():
    with pytest.raises(AuthenticationError):
        shared_ipp_helper(4, tamper=True)


# ---------------------------------------------------------------------------
# collaborative R1CS (integration/mpc_prover.rs analogue)
# ---------------------------------------------------------------------------

def test_mpc_r1cs_simple_circuit():
    """(a1+a2)*(b1+b2) = (c1+c2) with interleaved witness ownership; the
    opened proof verifies under the plain single-prover verifier."""
    a1, b1, c1 = 3, 6, 40   # party 0's witness
    a2, b2 = 4, 1           # party 1's witness
    c2 = 9                  # public

    blind = [rand_scalar() for _ in range(5)]

    def fn(fabric):
        transcript = HashChainTranscript(b"mpc-example")
        prover = MpcProver(fabric, PC, transcript)
        if fabric.party_id == 0:
            comms0, vars0 = prover.batch_commit(
                0, [Scalar(a1), Scalar(b1), Scalar(c1)], blind[:3]
            )
            comms1, vars1 = prover.batch_commit(1, None, None, count=2)
        else:
            comms0, vars0 = prover.batch_commit(0, None, None, count=3)
            comms1, vars1 = prover.batch_commit(
                1, [Scalar(a2), Scalar(b2)], blind[3:]
            )
        va1, vb1, vc1 = vars0
        va2, vb2 = vars1
        example_gadget(
            prover,
            va1.to_lc(), va2.to_lc(), vb1.to_lc(), vb2.to_lc(),
            vc1.to_lc(), _const_lc(c2),
        )
        shared_proof = prover.prove(BP)
        proof = shared_proof.open()
        return proof, comms0 + comms1

    (proof0, comms0), (proof1, comms1) = run_two_parties(fn, fn)
    assert proof0 == proof1
    assert comms0 == comms1

    # Plain single-prover verification (the compatibility invariant).
    vt = HashChainTranscript(b"mpc-example")
    verifier = Verifier(PC, vt)
    vvars = [verifier.commit(c) for c in comms0]
    example_gadget(
        verifier,
        vvars[0].to_lc(), vvars[3].to_lc(), vvars[1].to_lc(), vvars[4].to_lc(),
        vvars[2].to_lc(), _const_lc(c2),
    )
    verifier.verify(proof0, BP)


def test_mpc_r1cs_false_statement_rejected():
    blind = [rand_scalar() for _ in range(5)]

    def fn(fabric):
        transcript = HashChainTranscript(b"mpc-false")
        prover = MpcProver(fabric, PC, transcript)
        if fabric.party_id == 0:
            comms0, vars0 = prover.batch_commit(0, [Scalar(3), Scalar(6), Scalar(40)], blind[:3])
            comms1, vars1 = prover.batch_commit(1, None, None, count=2)
        else:
            comms0, vars0 = prover.batch_commit(0, None, None, count=3)
            comms1, vars1 = prover.batch_commit(1, [Scalar(4), Scalar(1)], blind[3:])
        example_gadget(
            prover,
            vars0[0].to_lc(), vars1[0].to_lc(), vars0[1].to_lc(), vars1[1].to_lc(),
            vars0[2].to_lc(), _const_lc(10),  # wrong: c2 should be 9
        )
        return prover.prove(BP).open(), comms0 + comms1

    (proof, comms), _ = run_two_parties(fn, fn)
    vt = HashChainTranscript(b"mpc-false")
    verifier = Verifier(PC, vt)
    vvars = [verifier.commit(c) for c in comms]
    example_gadget(
        verifier,
        vvars[0].to_lc(), vvars[3].to_lc(), vvars[1].to_lc(), vvars[4].to_lc(),
        vvars[2].to_lc(), _const_lc(10),
    )
    from mpc_bulletproof_tpu.utils.errors import VerificationError

    with pytest.raises(VerificationError):
        verifier.verify(proof, BP)


def _const_lc(value):
    from mpc_bulletproof_tpu.models.r1cs.linear_combination import (
        LinearCombination,
        Variable,
    )

    return LinearCombination({Variable.one(): Scalar(value)})


def test_shared_ipp_interleaved_ownership():
    """Alternating per-element witness ownership (mirrors the reference's
    interleaved-ownership integration case)."""
    n = 8
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0x1111))
    a = [rand_scalar() for _ in range(n)]
    b = [rand_scalar() for _ in range(n)]

    def fn(fabric):
        parts_a = []
        parts_b = []
        for i in range(n):
            owner = i % 2
            val_a = [a[i]] if fabric.party_id == owner else None
            val_b = [b[i]] if fabric.party_id == owner else None
            parts_a.append(fabric.batch_share_scalars(val_a, owner, count=1))
            parts_b.append(fabric.batch_share_scalars(val_b, owner, count=1))
        a_sh = AuthenticatedScalarVector.concat(parts_a)
        b_sh = AuthenticatedScalarVector.concat(parts_b)
        t = MpcTranscript(HashChainTranscript(b"interleave"))
        proof = SharedInnerProductProof.create(
            t, Q, [Scalar(1)] * n, [Scalar(1)] * n, list(G), list(H), a_sh, b_sh, fabric
        )
        return proof.open()

    p0, p1 = run_two_parties(fn, fn)
    assert p0 == p1
    from mpc_bulletproof_tpu.ops.field import inner_product

    P = StarkPoint.msm(a + b + [inner_product(a, b)], G + H + [Q])
    t = HashChainTranscript(b"interleave")
    p0.verify(n, t, [Scalar(1)] * n, [Scalar(1)] * n, P, Q, G, H)


def test_authenticated_poly_matches_plain():
    """AuthenticatedVecPoly3.special_inner_product over shares equals the
    plain VecPoly3 result (reference authenticated_poly.rs unit tests)."""
    from mpc_bulletproof_tpu.models.r1cs_mpc.authenticated_poly import (
        AuthenticatedVecPoly3,
    )
    from mpc_bulletproof_tpu.ops.poly import VecPoly3

    n = 4
    coeffs = [[rand_scalar() for _ in range(n)] for _ in range(8)]
    l_plain = VecPoly3([Scalar(0)] * n, coeffs[1], coeffs[2], coeffs[3])
    r_plain = VecPoly3(coeffs[4], coeffs[5], [Scalar(0)] * n, coeffs[7])
    t_plain = VecPoly3.special_inner_product(l_plain, r_plain)
    x = rand_scalar()
    expect_t = [t_plain.t1, t_plain.t2, t_plain.t3, t_plain.t4, t_plain.t5, t_plain.t6]
    expect_l = l_plain.eval(x)

    def fn(fabric):
        def share(vals, owner):
            return fabric.batch_share_scalars(
                vals if fabric.party_id == owner else None, owner, count=n
            )

        zeros = fabric.zeros_authenticated(n)
        l_poly = AuthenticatedVecPoly3(zeros, share(coeffs[1], 0), share(coeffs[2], 1), share(coeffs[3], 0))
        r_poly = AuthenticatedVecPoly3(share(coeffs[4], 1), share(coeffs[5], 0), zeros, share(coeffs[7], 1))
        t_poly = AuthenticatedVecPoly3.special_inner_product(l_poly, r_poly)
        opened_t = AuthenticatedScalarVector.concat(
            [t_poly.t1, t_poly.t2, t_poly.t3, t_poly.t4, t_poly.t5, t_poly.t6]
        ).open_authenticated()
        opened_l = l_poly.eval(x).open_authenticated()
        return opened_t, opened_l

    (t0, l0), (t1, l1) = run_two_parties(fn, fn)
    assert t0 == expect_t == t1
    assert l0 == expect_l == l1


def test_share_point_and_preshared_commit():
    g = StarkPoint.generator()
    secret_pt = g.scalar_mul(Scalar(0xDEADBEEF))
    val = Scalar(777)

    def fn(fabric):
        # share a point owned by party 1
        shared_pt = fabric.share_point(
            secret_pt if fabric.party_id == 1 else None, owner=1
        )
        opened = shared_pt.open_authenticated()
        # authenticate preshared scalar shares: 777 = 700 + 77
        my_raw = [Scalar(700)] if fabric.party_id == 0 else [Scalar(77)]
        auth = fabric.authenticate_preshared(my_raw)
        opened_val = auth.open_authenticated()[0]
        return opened, opened_val

    (p0, v0), (p1, v1) = run_two_parties(fn, fn)
    assert p0 == secret_pt == p1
    assert v0 == val == v1


def test_mpc_commit_preshared_roundtrip():
    """Preshared-witness commit path produces a verifying proof."""
    def fn(fabric):
        transcript = HashChainTranscript(b"preshared")
        prover = MpcProver(fabric, PC, transcript)
        # witness 42 = 40 + 2, blinding 9 = 4 + 5, both preshared
        v_raw = [Scalar(40)] if fabric.party_id == 0 else [Scalar(2)]
        b_raw = [Scalar(4)] if fabric.party_id == 0 else [Scalar(5)]
        comms, variables = prover.batch_commit_preshared(v_raw, b_raw)
        # constrain v * 1 = 42
        _, _, o = prover.multiply(variables[0].to_lc(), _const_lc(1))
        prover.constrain(o.to_lc() - _const_lc(42))
        proof = prover.prove(BP).open()
        return proof, comms[0]

    (proof, comm), _ = run_two_parties(fn, fn)
    vt = HashChainTranscript(b"preshared")
    verifier = Verifier(PC, vt)
    var = verifier.commit(comm)
    _, _, o = verifier.multiply(var.to_lc(), _const_lc(1))
    verifier.constrain(o.to_lc() - _const_lc(42))
    verifier.verify(proof, BP)


def test_tcp_large_batch_exchange_no_deadlock():
    """Exchange payloads larger than socket buffers over real TCP."""
    import threading

    from mpc_bulletproof_tpu.parallel.network import TcpTwoPartyNet

    port = 9871
    n0 = TcpTwoPartyNet(0, ("127.0.0.1", port), ("127.0.0.1", port))
    n1 = TcpTwoPartyNet(1, ("127.0.0.1", port), ("127.0.0.1", port))
    results = [None, None]

    def party(i, net):
        net.connect()
        payload = bytes([i]) * (4 * 1024 * 1024)  # 4 MiB each way
        results[i] = net.exchange_bytes(payload)
        net.close()

    threads = [
        threading.Thread(target=party, args=(0, n0)),
        threading.Thread(target=party, args=(1, n1)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    assert results[0] == bytes([1]) * (4 * 1024 * 1024)
    assert results[1] == bytes([0]) * (4 * 1024 * 1024)


def test_mpc_range_gadget():
    """Collaborative bit-decomposition range proof: the owner shares its
    value and bit assignments; constraints run over shared values; the
    opened proof verifies under the plain verifier with the public gadget."""
    from mpc_bulletproof_tpu.models.r1cs.gadgets import range_check_gadget

    n_bits = 8
    v = 173  # in [0, 2^8)
    v_blind = rand_scalar()

    def fn(fabric):
        transcript = HashChainTranscript(b"mpc-range")
        prover = MpcProver(fabric, PC, transcript)
        if fabric.party_id == 0:
            comms, variables = prover.batch_commit(0, [Scalar(v)], [v_blind])
        else:
            comms, variables = prover.batch_commit(0, None, None, count=1)
        v_var = variables[0]

        # Owner shares each bit pair (1-b, b); both parties allocate them.
        lc = v_var.to_lc()
        exp_2 = Scalar(1)
        for i in range(n_bits):
            bit = (v >> i) & 1
            pair = fabric.batch_share_scalars(
                [Scalar(1 - bit), Scalar(bit)] if fabric.party_id == 0 else None,
                owner=0, count=2,
            )
            a_var, b_var, o_var = prover.allocate_multiplier((pair[0], pair[1]))
            prover.constrain(o_var.to_lc())
            prover.constrain(a_var + (b_var - 1))
            lc = lc - b_var * exp_2
            exp_2 = exp_2 + exp_2
        prover.constrain(lc)
        return prover.prove(BP).open(), comms[0]

    (proof, comm), _ = run_two_parties(fn, fn)

    vt = HashChainTranscript(b"mpc-range")
    verifier = Verifier(PC, vt)
    v_var = verifier.commit(comm)
    from mpc_bulletproof_tpu.models.r1cs.gadgets import range_check_gadget as rg

    rg(verifier, v_var.to_lc(), None, n_bits)
    verifier.verify(proof, BP)


@pytest.mark.heavy_compile
def test_mpc_prover_device_data_plane(monkeypatch):
    """The collaborative prover with the device MPC data plane active
    (BP_FORCE_BACKEND=device): the t-polynomial Beaver round and l/r
    evaluation run on device limb tensors with raw-limb openings
    (authenticated_poly.py device path; parallel/device_shares.py), and the
    opened proof still verifies under the plain host verifier."""
    monkeypatch.setenv("BP_FORCE_BACKEND", "device")
    from mpc_bulletproof_tpu.models.r1cs.gadgets import range_check_gadget as rg

    n_bits = 32  # 32 multipliers -> clears the >=16 device-path threshold
    v = 0xDEADBEEF % (1 << n_bits)
    v_blind = rand_scalar()
    bp_gens = BulletproofGens(64, 1)

    def fn(fabric):
        pt = HashChainTranscript(b"mpc-dev-range")
        prover = MpcProver(fabric, PC, MpcTranscript(pt))
        comms, v_var = prover.commit(0, Scalar(v) if fabric.party_id == 0 else None,
                                     v_blind if fabric.party_id == 0 else None)
        lc = v_var.to_lc()
        exp_2 = Scalar(1)
        for i in range(n_bits):
            bit = (v >> i) & 1
            pair = fabric.batch_share_scalars(
                [Scalar(1 - bit), Scalar(bit)] if fabric.party_id == 0 else None,
                owner=0, count=2,
            )
            a_var, b_var, o_var = prover.allocate_multiplier((pair[0], pair[1]))
            prover.constrain(o_var.to_lc())
            prover.constrain(a_var + (b_var - 1))
            lc = lc - b_var * exp_2
            exp_2 = exp_2 + exp_2
        prover.constrain(lc)
        return prover.prove(bp_gens).open(), comms

    (proof, comm), _ = run_two_parties(fn, fn)

    vt = HashChainTranscript(b"mpc-dev-range")
    verifier = Verifier(PC, vt)
    v_var = verifier.commit(comm)
    rg(verifier, v_var.to_lc(), None, n_bits)
    verifier.verify(proof, bp_gens)


def test_local_pair_latency_injection():
    """make_local_pair(latency_s=...) delays delivery by the one-way latency
    (the bench uses this to price synchronous MPC rounds on a real link)."""
    import time as _time

    net0, net1 = make_local_pair(latency_s=0.05)
    t0 = _time.monotonic()
    out = [None]

    def peer():
        out[0] = net1.exchange_bytes(b"from1")

    th = threading.Thread(target=peer)
    th.start()
    got = net0.exchange_bytes(b"from0")
    th.join(timeout=10)
    dt = _time.monotonic() - t0
    assert got == b"from1" and out[0] == b"from0"
    assert dt >= 0.05, f"latency not injected (exchange took {dt * 1e3:.1f} ms)"
