#!/usr/bin/env python
"""Benchmark suite sweeping the reference's criterion configs (SURVEY.md §6):

* inner-product prover, n = 2^1 .. 2^K           (benches/inner_product.rs)
* R1CS prover/verifier, squaring-chain circuit,
  n = 2^1 .. 2^10 multiplication gates           (benches/r1cs.rs)
* k-shuffle prove/verify, k = 2 .. 2^10          (benches/shuffle.rs)
* generator setup, sizes 2 .. 1024               (benches/generators.rs)
* single + aggregated 64-bit range proofs        (BASELINE.md north star)

Prints a markdown table; writes JSON results next to this file.

    python benches/run_benches.py [--max-ipp 16] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# This suite measures the host+native path; the device path is benchmarked
# separately (bench.py aux metrics, scaling_bench.py).  Opt out with
# BENCH_BACKEND=device.
os.environ.setdefault(
    "BP_FORCE_BACKEND",
    "device" if os.environ.get("BENCH_BACKEND") == "device" else "host",
)

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
    StarkPoint,
)
from mpc_bulletproof_tpu.models.inner_product import InnerProductProof
from mpc_bulletproof_tpu.models.r1cs import Prover, Verifier
from mpc_bulletproof_tpu.models.r1cs.gadgets import shuffle_gadget
from mpc_bulletproof_tpu.models.range_proof import RangeProof
from mpc_bulletproof_tpu.ops.field import scalar_powers

rng = random.Random(0xBE7C4)
PC = PedersenGens()

RESULTS = []


def record(group, config, seconds, extra=None):
    RESULTS.append(
        {"group": group, "config": config, "ms": round(seconds * 1e3, 3), **(extra or {})}
    )
    print(f"| {group} | {config} | {seconds * 1e3:10.2f} ms |", flush=True)


def timeit(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def rand_scalar():
    return Scalar(rng.getrandbits(260))


# ---------------------------------------------------------------------------

def bench_ipp(max_ln, reps):
    n_max = 1 << max_ln
    gens = BulletproofGens(n_max, 1)
    for ln in range(1, max_ln + 1):
        n = 1 << ln
        G = gens.share(0).G(n)
        H = gens.share(0).H(n)
        Q = StarkPoint.random()
        Gf = [Scalar(1)] * n
        Hf = scalar_powers(rand_scalar(), n)
        a = [rand_scalar() for _ in range(n)]
        b = [rand_scalar() for _ in range(n)]

        def prove():
            t = HashChainTranscript(b"bench-ipp")
            InnerProductProof.create(t, Q, Gf, Hf, list(G), list(H), list(a), list(b))

        record("ipp-prover", f"n=2^{ln}", timeit(prove, reps))


def _squaring_chain(cs, n_constraints, value):
    var = cs.commit_public(value)
    for _ in range(n_constraints):
        _, _, var = cs.multiply(var.to_lc(), var.to_lc())


def bench_r1cs(max_ln, reps):
    gens = BulletproofGens(1 << max_ln, 1)
    for ln in range(1, max_ln + 1):
        n = 1 << ln
        val = rand_scalar()

        def prove():
            t = HashChainTranscript(b"bench-r1cs")
            prover = Prover(PC, t)
            _squaring_chain(prover, n, val)
            return prover.prove(gens)

        record("r1cs-prover", f"n=2^{ln}", timeit(prove, reps))

        proof = prove()

        def verify():
            t = HashChainTranscript(b"bench-r1cs")
            verifier = Verifier(PC, t)
            _squaring_chain(verifier, n, val)
            verifier.verify(proof, gens)

        record("r1cs-verifier", f"n=2^{ln}", timeit(verify, reps))


def bench_shuffle(max_k_ln, reps):
    gens = BulletproofGens(1 << (max_k_ln + 2), 1)
    for ln in range(1, max_k_ln + 1):
        k = 1 << ln
        inputs = [rand_scalar() for _ in range(k)]
        outputs = list(inputs)
        rng.shuffle(outputs)

        def prove():
            t = HashChainTranscript(b"bench-shuffle")
            prover = Prover(PC, t)
            iv = [prover.commit(v, rand_scalar())[1] for v in inputs]
            ov = [prover.commit(v, rand_scalar())[1] for v in outputs]
            shuffle_gadget(prover, iv, ov)
            prover.prove(gens)

        record("shuffle-prover", f"k=2^{ln}", timeit(prove, reps))

        # one proof for the verifier sweep (reference benches/shuffle.rs
        # times prove and verify separately over the same k sweep)
        t = HashChainTranscript(b"bench-shuffle")
        prover = Prover(PC, t)
        in_pairs = [prover.commit(v, rand_scalar()) for v in inputs]
        out_pairs = [prover.commit(v, rand_scalar()) for v in outputs]
        shuffle_gadget(prover, [v for _, v in in_pairs], [v for _, v in out_pairs])
        proof = prover.prove(gens)
        in_pts = [p for p, _ in in_pairs]
        out_pts = [p for p, _ in out_pairs]

        def verify():
            t = HashChainTranscript(b"bench-shuffle")
            verifier = Verifier(PC, t)
            iv = [verifier.commit(p) for p in in_pts]
            ov = [verifier.commit(p) for p in out_pts]
            shuffle_gadget(verifier, iv, ov)
            verifier.verify(proof, gens)

        record("shuffle-verifier", f"k=2^{ln}", timeit(verify, reps))


def bench_generators(reps):
    for size in (2, 8, 64, 256, 1024):
        record(
            "generators",
            f"BulletproofGens::new({size},1)",
            timeit(lambda: BulletproofGens(size, 1), reps),
        )


def bench_rangeproof(reps):
    gens = BulletproofGens(64, 64)
    # single 32-bit (README doctest config)
    def single32():
        t = HashChainTranscript(b"bench-rp")
        RangeProof.prove_single(gens, PC, t, 1037578891, rand_scalar(), 32)

    record("rangeproof-prove", "single n=32", timeit(single32, reps))

    for m in (1, 4, 16, 64):
        values = [rng.randrange(0, 1 << 64) for _ in range(m)]
        blinds = [rand_scalar() for _ in range(m)]

        def prove():
            t = HashChainTranscript(b"bench-rp-agg")
            return RangeProof.prove_multiple(gens, PC, t, values, blinds, 64)

        dt = timeit(prove, reps)
        record(
            "rangeproof-prove", f"n=64 m={m}", dt,
            {"us_per_proof": round(dt / m * 1e6, 1)},
        )
        proof, comms = prove()

        def verify():
            t = HashChainTranscript(b"bench-rp-agg")
            proof.verify_multiple(gens, PC, t, comms, 64)

        if m == 1:
            # The BASELINE headline verify metric (1,040 us AVX2 dalek,
            # README.md:76): record min AND median over >= 20 runs so the
            # claim holds at the typical case, not only best-case
            # (VERDICT r3 ask #5).
            times = []
            for _ in range(max(20, reps)):
                t = HashChainTranscript(b"bench-rp-agg")
                t0 = time.perf_counter()
                proof.verify_multiple(gens, PC, t, comms, 64)
                times.append(time.perf_counter() - t0)
            times.sort()
            dt = times[0]
            med = times[len(times) // 2]
            record(
                "rangeproof-verify", f"n=64 m={m}", dt,
                {"us_per_proof": round(dt / m * 1e6, 1),
                 "median_ms": round(med * 1e3, 3),
                 "median_us_per_proof": round(med / m * 1e6, 1),
                 "runs": len(times)},
            )
        else:
            dt = timeit(verify, reps)
            record(
                "rangeproof-verify", f"n=64 m={m}", dt,
                {"us_per_proof": round(dt / m * 1e6, 1)},
            )


def bench_mpc(reps):
    """2-party collaborative proof over the in-process transport
    (the reference measures this with its integration harness)."""
    import threading

    from mpc_bulletproof_tpu.models.r1cs import Verifier
    from mpc_bulletproof_tpu.models.r1cs.gadgets import example_gadget
    from mpc_bulletproof_tpu.models.r1cs_mpc import MpcProver
    from mpc_bulletproof_tpu.models.r1cs.linear_combination import (
        LinearCombination, Variable,
    )
    from mpc_bulletproof_tpu.parallel.beaver import PartyIdBeaverSource
    from mpc_bulletproof_tpu.parallel.fabric import MpcFabric
    from mpc_bulletproof_tpu.parallel.network import make_local_pair

    gens = BulletproofGens(16, 1)
    blind = [rand_scalar() for _ in range(5)]
    c2 = LinearCombination({Variable.one(): Scalar(9)})

    def one_round():
        net0, net1 = make_local_pair()
        fabrics = [MpcFabric(net0, PartyIdBeaverSource(0)),
                   MpcFabric(net1, PartyIdBeaverSource(1))]
        results = [None, None]

        def party(i):
            fabric = fabrics[i]
            t = HashChainTranscript(b"bench-mpc")
            prover = MpcProver(fabric, PC, t)
            if fabric.party_id == 0:
                c0, v0 = prover.batch_commit(0, [Scalar(3), Scalar(6), Scalar(40)], blind[:3])
                c1, v1 = prover.batch_commit(1, None, None, count=2)
            else:
                c0, v0 = prover.batch_commit(0, None, None, count=3)
                c1, v1 = prover.batch_commit(1, [Scalar(4), Scalar(1)], blind[3:])
            example_gadget(prover, v0[0].to_lc(), v1[0].to_lc(), v0[1].to_lc(),
                           v1[1].to_lc(), v0[2].to_lc(), c2)
            results[i] = (prover.prove(gens).open(), c0 + c1)

        threads = [threading.Thread(target=party, args=(i,)) for i in (0, 1)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return results[0]

    record("mpc-r1cs-prove", "example circuit, 2 parties", timeit(one_round, reps))
    proof, comms = one_round()

    def verify():
        vt = HashChainTranscript(b"bench-mpc")
        verifier = Verifier(PC, vt)
        vvars = [verifier.commit(c) for c in comms]
        example_gadget(verifier, vvars[0].to_lc(), vvars[3].to_lc(), vvars[1].to_lc(),
                       vvars[4].to_lc(), vvars[2].to_lc(), c2)
        verifier.verify(proof, gens)

    record("mpc-r1cs-verify", "opened proof, plain verifier", timeit(verify, reps))

    # Aggregated-scale collaborative shuffle (k=256 -> ~510 multipliers,
    # 1024-slot circuit): the configuration where the MPC commitment MSMs
    # (fabric.shared_msm, now routed through dispatch_msm) are large enough
    # for the device/mesh plane to matter.  Run on the device data plane by
    # benching with a live TPU backend (dispatch_msm routes automatically).
    from mpc_bulletproof_tpu.models.r1cs.gadgets import shuffle_gadget

    k = 256
    gens_big = BulletproofGens(1024, 1)
    s_inputs = [rand_scalar() for _ in range(k)]
    s_outputs = s_inputs[1:] + s_inputs[:1]
    s_blind = [rand_scalar() for _ in range(2 * k)]

    def shuffle_round():
        net0, net1 = make_local_pair()
        fabrics = [MpcFabric(net0, PartyIdBeaverSource(0)),
                   MpcFabric(net1, PartyIdBeaverSource(1))]
        results = [None, None]

        def party(i):
            fabric = fabrics[i]
            t = HashChainTranscript(b"bench-mpc-shuffle")
            prover = MpcProver(fabric, PC, t)
            if fabric.party_id == 0:
                in_c, in_v = prover.batch_commit(0, s_inputs, s_blind[:k])
                out_c, out_v = prover.batch_commit(1, None, None, count=k)
            else:
                in_c, in_v = prover.batch_commit(0, None, None, count=k)
                out_c, out_v = prover.batch_commit(1, s_outputs, s_blind[k:])
            shuffle_gadget(prover, in_v, out_v)
            results[i] = (prover.prove(gens_big).open(), in_c + out_c)

        threads = [threading.Thread(target=party, args=(i,)) for i in (0, 1)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return results[0]

    record("mpc-r1cs-prove", "shuffle k=256, 2 parties",
           timeit(shuffle_round, max(1, reps // 3)))

    # Device data plane (VERDICT r3 ask #8): the same collaborative shuffle
    # with the shared-phase MSMs (fabric.shared_msm -> dispatch_msm) routed
    # to the TPU.  Opt-in (BENCH_MPC_DEVICE=1): needs the live chip, which
    # the host suite must not touch by default (single-tenant tunnel).
    if os.environ.get("BENCH_MPC_DEVICE") == "1":
        os.environ["BP_FORCE_BACKEND"] = "device"
        try:
            record("mpc-r1cs-prove", "shuffle k=256, 2 parties, device plane",
                   timeit(shuffle_round, max(1, reps // 3)))
        finally:
            os.environ["BP_FORCE_BACKEND"] = "host"

    s_proof, s_comms = shuffle_round()

    def shuffle_verify():
        vt = HashChainTranscript(b"bench-mpc-shuffle")
        verifier = Verifier(PC, vt)
        vs = [verifier.commit(c) for c in s_comms]
        shuffle_gadget(verifier, vs[:k], vs[k:])
        verifier.verify(s_proof, gens_big)

    record("mpc-r1cs-verify", "shuffle k=256, opened proof",
           timeit(shuffle_verify, reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-ipp", type=int, default=16)
    ap.add_argument("--max-r1cs", type=int, default=10)
    ap.add_argument("--max-shuffle", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--only",
        help="comma-separated subset of {generators,ipp,r1cs,shuffle,"
        "rangeproof,mpc}: rerun just those groups and merge into the "
        "existing results.json (other groups' rows are kept)",
    )
    args = ap.parse_args()
    if args.quick:
        args.max_ipp, args.max_r1cs, args.max_shuffle, args.reps = 8, 6, 5, 1
    known_groups = {"generators", "ipp", "r1cs", "shuffle", "rangeproof", "mpc"}
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        unknown = only - known_groups
        if unknown:
            ap.error(
                f"--only: unknown group(s) {sorted(unknown)}; "
                f"choose from {sorted(known_groups)}"
            )

    def want(name):
        return only is None or name in only

    print("| group | config | time |")
    print("|---|---|---|")
    if want("generators"):
        bench_generators(args.reps)
    if want("ipp"):
        bench_ipp(args.max_ipp, args.reps)
    if want("r1cs"):
        bench_r1cs(args.max_r1cs, args.reps)
    if want("shuffle"):
        bench_shuffle(args.max_shuffle, args.reps)
    if want("rangeproof"):
        bench_rangeproof(args.reps)
    if want("mpc"):
        bench_mpc(args.reps)

    out = os.path.join(os.path.dirname(__file__), "results.json")
    rows = RESULTS
    if only is not None:
        try:
            with open(out) as fh:
                prev = json.load(fh)
        except (OSError, json.JSONDecodeError):
            prev = []
        fresh = {(r["group"], r["config"]) for r in RESULTS}
        # tolerate malformed pre-existing rows; keep a canonical group order
        # so partial reruns don't scramble the file
        kept = [
            r for r in prev if (r.get("group"), r.get("config")) not in fresh
        ]
        order = {g: i for i, g in enumerate(
            ["generators", "ipp", "r1cs", "shuffle", "rangeproof", "mpc"])}
        merged = kept + RESULTS
        rows = sorted(
            range(len(merged)),
            key=lambda i: (order.get(merged[i].get("group"), 99), i),
        )
        rows = [merged[i] for i in rows]
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"\nwrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
