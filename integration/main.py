#!/usr/bin/env python
"""Two-process MPC integration harness.

Mirrors the reference's custom no-harness integration binary
(integration/main.rs:101-199): both parties run this program as separate OS
processes, connect over TCP (the QUIC net's role), register tests in a
registry, filter by name, and party 0 prints colored pass/fail.

Usage (two shells or run_integration.sh):
    python integration/main.py --party 0 --port 9850 [--test NAME]
    python integration/main.py --party 1 --port 9850 [--test NAME]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The MPC integration suite targets the protocol layers on the host path;
# the axon TPU plugin overrides JAX_PLATFORMS and its tunnel is
# single-tenant, so force the host backend before anything touches jax.
os.environ.setdefault("BP_FORCE_BACKEND", "host")
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # already initialized
    pass

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
    StarkPoint,
)
from mpc_bulletproof_tpu.models.r1cs import Verifier
from mpc_bulletproof_tpu.models.r1cs.gadgets import example_gadget, shuffle_gadget
from mpc_bulletproof_tpu.models.r1cs_mpc import MpcProver, SharedInnerProductProof
from mpc_bulletproof_tpu.models.r1cs.linear_combination import LinearCombination, Variable
from mpc_bulletproof_tpu.ops.field import inner_product, scalar_powers
from mpc_bulletproof_tpu.parallel.beaver import PartyIdBeaverSource
from mpc_bulletproof_tpu.parallel.fabric import AuthenticatedScalarVector, MpcFabric
from mpc_bulletproof_tpu.parallel.network import TcpTwoPartyNet
from mpc_bulletproof_tpu.transcript import MpcTranscript
from mpc_bulletproof_tpu.utils.errors import AuthenticationError

TESTS: dict[str, callable] = {}


def integration_test(name):
    def register(fn):
        TESTS[name] = fn
        return fn

    return register


PC = PedersenGens()
BP = BulletproofGens(32, 1)


def det_scalar(i):
    return Scalar(0x1234567 + i * 0xDEAD + i * i)


# ---------------------------------------------------------------------------


@integration_test("transcript_sync")
def test_transcript_sync(fabric: MpcFabric):
    """Both parties absorb opened shared values and squeeze equal challenges
    (reference integration/transcript.rs:15-92)."""
    shared = fabric.batch_share_scalars(
        [det_scalar(i) for i in range(4)] if fabric.party_id == 0 else None,
        owner=0,
        count=4,
    )
    opened = shared.open_authenticated()
    t = MpcTranscript(HashChainTranscript(b"sync-test"))
    for v in opened:
        t.append_scalar(b"v", v)
    mine = t.challenge_scalar(b"c")
    theirs = fabric.exchange_scalars([mine])[0]
    assert mine == theirs, "challenge desync between parties"


@integration_test("shared_ipp")
def test_shared_ipp(fabric: MpcFabric):
    """Shared IPP with interleaved ownership; opened proof verifies."""
    n = 8
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0xABC))
    a = [det_scalar(i) for i in range(n)]
    b = [det_scalar(100 + i) for i in range(n)]
    Gf = [Scalar(1)] * n
    Hf = scalar_powers(Scalar(3), n)

    a_sh = fabric.batch_share_scalars(a if fabric.party_id == 0 else None, 0, count=n)
    b_sh = fabric.batch_share_scalars(b if fabric.party_id == 1 else None, 1, count=n)
    t = MpcTranscript(HashChainTranscript(b"ipp-integration"))
    proof = SharedInnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), a_sh, b_sh, fabric)
    opened = proof.open()

    b_prime = [bi * yi for bi, yi in zip(b, Hf)]
    c = inner_product(a, b)
    P = StarkPoint.msm(a + b_prime + [c], G + H + [Q])
    vt = HashChainTranscript(b"ipp-integration")
    opened.verify(n, vt, Gf, Hf, P, Q, G, H)


@integration_test("ipp_malleability")
def test_ipp_malleability(fabric: MpcFabric):
    """A malleated IPP share must fail the MAC-checked opening
    (reference integration/mpc_inner_product.rs:336-416)."""
    n = 4
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator()
    a = [det_scalar(i) for i in range(n)]
    b = [det_scalar(7 * i) for i in range(n)]
    a_sh = fabric.batch_share_scalars(a if fabric.party_id == 0 else None, 0, count=n)
    b_sh = fabric.batch_share_scalars(b if fabric.party_id == 1 else None, 1, count=n)
    t = MpcTranscript(HashChainTranscript(b"malleable"))
    proof = SharedInnerProductProof.create(
        t, Q, [Scalar(1)] * n, [Scalar(1)] * n, list(G), list(H), a_sh, b_sh, fabric
    )
    if fabric.party_id == 0:
        proof.a.shares[0] = proof.a.shares[0] + Scalar(1)
    # party 1 adds zero to stay synchronized (same number of rounds)
    try:
        proof.open()
    except AuthenticationError:
        return
    raise AssertionError("malleated share was not detected")


@integration_test("mpc_prover_simple")
def test_mpc_prover_simple(fabric: MpcFabric):
    """Collaborative example-gadget proof verified by the plain verifier
    (reference integration/mpc_prover.rs:198-260)."""
    transcript = HashChainTranscript(b"mpc-int")
    prover = MpcProver(fabric, PC, transcript)
    blind = [det_scalar(1000 + i) for i in range(5)]
    if fabric.party_id == 0:
        comms0, vars0 = prover.batch_commit(0, [Scalar(3), Scalar(6), Scalar(40)], blind[:3])
        comms1, vars1 = prover.batch_commit(1, None, None, count=2)
    else:
        comms0, vars0 = prover.batch_commit(0, None, None, count=3)
        comms1, vars1 = prover.batch_commit(1, [Scalar(4), Scalar(1)], blind[3:])
    c2 = LinearCombination({Variable.one(): Scalar(9)})
    example_gadget(
        prover,
        vars0[0].to_lc(), vars1[0].to_lc(), vars0[1].to_lc(),
        vars1[1].to_lc(), vars0[2].to_lc(), c2,
    )
    proof = prover.prove(BP).open()

    vt = HashChainTranscript(b"mpc-int")
    verifier = Verifier(PC, vt)
    vvars = [verifier.commit(c) for c in comms0 + comms1]
    example_gadget(
        verifier,
        vvars[0].to_lc(), vvars[3].to_lc(), vvars[1].to_lc(),
        vvars[4].to_lc(), vvars[2].to_lc(), c2,
    )
    verifier.verify(proof, BP)


@integration_test("mpc_shuffle_proof")
def test_mpc_shuffle(fabric: MpcFabric):
    """Collaborative shuffle proof (randomized 2-phase constraints)."""
    k = 3
    inputs = [det_scalar(i) for i in range(k)]
    outputs = [inputs[2], inputs[0], inputs[1]]
    blind = [det_scalar(50 + i) for i in range(2 * k)]

    transcript = HashChainTranscript(b"mpc-shuffle")
    transcript.append_message(b"dom-sep", b"ShuffleProof")
    transcript.append_u64(b"k", k)
    prover = MpcProver(fabric, PC, transcript)
    if fabric.party_id == 0:
        in_c, in_v = prover.batch_commit(0, inputs, blind[:k])
        out_c, out_v = prover.batch_commit(1, None, None, count=k)
    else:
        in_c, in_v = prover.batch_commit(0, None, None, count=k)
        out_c, out_v = prover.batch_commit(1, outputs, blind[k:])
    shuffle_gadget(prover, in_v, out_v)
    proof = prover.prove(BP).open()

    vt = HashChainTranscript(b"mpc-shuffle")
    vt.append_message(b"dom-sep", b"ShuffleProof")
    vt.append_u64(b"k", k)
    verifier = Verifier(PC, vt)
    iv = [verifier.commit(c) for c in in_c]
    ov = [verifier.commit(c) for c in out_c]
    shuffle_gadget(verifier, iv, ov)
    verifier.verify(proof, BP)


@integration_test("mpc_prover_malleability")
def test_mpc_prover_malleability(fabric: MpcFabric):
    """A party that malleates its share of the IPP tail after proving must
    be caught by the MAC-checked opening
    (reference integration/mpc_prover.rs:336-351)."""
    transcript = HashChainTranscript(b"mpc-malleate")
    prover = MpcProver(fabric, PC, transcript)
    blind = [det_scalar(2000 + i) for i in range(5)]
    if fabric.party_id == 0:
        comms0, vars0 = prover.batch_commit(0, [Scalar(3), Scalar(6), Scalar(40)], blind[:3])
        comms1, vars1 = prover.batch_commit(1, None, None, count=2)
    else:
        comms0, vars0 = prover.batch_commit(0, None, None, count=3)
        comms1, vars1 = prover.batch_commit(1, [Scalar(4), Scalar(1)], blind[3:])
    c2 = LinearCombination({Variable.one(): Scalar(9)})
    example_gadget(
        prover,
        vars0[0].to_lc(), vars1[0].to_lc(), vars0[1].to_lc(),
        vars1[1].to_lc(), vars0[2].to_lc(), c2,
    )
    partial = prover.prove(BP)
    if fabric.party_id == 1:
        partial.ipp_proof.a.shares[0] = partial.ipp_proof.a.shares[0] + Scalar(5)
    # party 0 adds zero to stay round-synchronized
    try:
        partial.open()
    except AuthenticationError:
        return
    raise AssertionError("malleated R1CS proof share was not detected")


@integration_test("mpc_prover_false_statement")
def test_mpc_prover_false_statement(fabric: MpcFabric):
    """A collaboratively-proved *false* statement must fail plain
    verification (reference integration/mpc_prover.rs:262-334)."""
    transcript = HashChainTranscript(b"mpc-false")
    prover = MpcProver(fabric, PC, transcript)
    blind = [det_scalar(3000 + i) for i in range(5)]
    # (3 + 4)(6 + 1) = 49 but c1 + c2 = 41 + 9 = 50: the gadget cannot hold.
    if fabric.party_id == 0:
        comms0, vars0 = prover.batch_commit(0, [Scalar(3), Scalar(6), Scalar(41)], blind[:3])
        comms1, vars1 = prover.batch_commit(1, None, None, count=2)
    else:
        comms0, vars0 = prover.batch_commit(0, None, None, count=3)
        comms1, vars1 = prover.batch_commit(1, [Scalar(4), Scalar(1)], blind[3:])
    c2 = LinearCombination({Variable.one(): Scalar(9)})
    example_gadget(
        prover,
        vars0[0].to_lc(), vars1[0].to_lc(), vars0[1].to_lc(),
        vars1[1].to_lc(), vars0[2].to_lc(), c2,
    )
    proof = prover.prove(BP).open()

    vt = HashChainTranscript(b"mpc-false")
    verifier = Verifier(PC, vt)
    vvars = [verifier.commit(c) for c in comms0 + comms1]
    example_gadget(
        verifier,
        vvars[0].to_lc(), vvars[3].to_lc(), vvars[1].to_lc(),
        vvars[4].to_lc(), vvars[2].to_lc(), c2,
    )
    try:
        verifier.verify(proof, BP)
    except Exception:
        return
    raise AssertionError("false statement verified")


@integration_test("shared_ipp_random_ownership")
def test_shared_ipp_random_ownership(fabric: MpcFabric):
    """Shared IPP over a 2x16 vector with per-index randomized ownership
    (reference integration/mpc_inner_product.rs:208-306)."""
    import random as _random

    n = 16
    G = BP.share(0).G(n)
    H = BP.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0x17))
    a = [det_scalar(31 * i + 5) for i in range(n)]
    b = [det_scalar(17 * i + 3) for i in range(n)]
    # both parties derive the same deterministic ownership map
    owners = [_random.Random(777 + i).randrange(2) for i in range(2 * n)]

    def share_elementwise(vals, base):
        parts = []
        for i, v in enumerate(vals):
            owner = owners[base + i]
            parts.append(
                fabric.batch_share_scalars(
                    [v] if fabric.party_id == owner else None, owner, count=1
                )
            )
        return AuthenticatedScalarVector.concat(parts)

    a_sh = share_elementwise(a, 0)
    b_sh = share_elementwise(b, n)
    t = MpcTranscript(HashChainTranscript(b"ipp-rand-own"))
    proof = SharedInnerProductProof.create(
        t, Q, [Scalar(1)] * n, [Scalar(1)] * n, list(G), list(H), a_sh, b_sh, fabric
    )
    opened = proof.open()

    c = inner_product(a, b)
    P = StarkPoint.msm(a + b + [c], G + H + [Q])
    vt = HashChainTranscript(b"ipp-rand-own")
    opened.verify(n, vt, [Scalar(1)] * n, [Scalar(1)] * n, P, Q, G, H)


# ---------------------------------------------------------------------------


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--party", type=int, required=True, choices=(0, 1))
    parser.add_argument("--port", type=int, default=9850)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--test", default=None, help="substring filter")
    args = parser.parse_args()

    net = TcpTwoPartyNet(
        args.party,
        local_addr=("0.0.0.0", args.port),
        peer_addr=(args.host, args.port),
    )
    net.connect()
    fabric = MpcFabric(net, PartyIdBeaverSource(args.party))

    selected = {
        name: fn
        for name, fn in sorted(TESTS.items())
        if args.test is None or args.test in name
    }
    failures = 0
    for name, fn in selected.items():
        try:
            fn(fabric)
            status = "\x1b[32mPASS\x1b[0m"
        except Exception as exc:  # noqa: BLE001
            status = f"\x1b[31mFAIL\x1b[0m ({exc})"
            failures += 1
        if args.party == 0:
            print(f"[{status}] {name}", flush=True)

    fabric.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
