#!/usr/bin/env python
"""Generate the committed fused-prover equivalence artifact.

Runs the SAME checks as the ``heavy_compile`` tier of
tests/test_fused_range_proof.py — the fused single-program device prover
and the SPMD (shard_map) sharded variant against the host party/dealer
path with an injected deterministic blinding stream — and records the
byte-level evidence (proof / commitment / transcript SHA-256) in
``benches/fused_equivalence.json``.  The default test suite deselects the
heavy tier (its one-time XLA CPU compiles cost many minutes); this
artifact is the per-round green record that the equivalence actually ran.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python benches/fused_equivalence.py
"""
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def main():
    import random

    from mpc_bulletproof_tpu import (
        BulletproofGens, HashChainTranscript, PedersenGens, Scalar,
    )
    from mpc_bulletproof_tpu.models.range_proof.fused_device import (
        prove_multiple_device,
    )
    from mpc_bulletproof_tpu.parallel import sharded
    from tests.test_fused_range_proof import det_stream, host_prove

    artifact = {
        "generated_unix": time.time(),
        "generated": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "git_head": subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True).stdout.strip(),
        "cases": [],
    }

    def run_case(label, n, m, mesh=None):
        rng = random.Random(909 if mesh is None else 910)
        bp_gens = BulletproofGens(n, m)
        pc_gens = PedersenGens()
        values = [rng.randrange(1 << n) for _ in range(m)]
        blindings = [Scalar(rng.getrandbits(251)) for _ in range(m)]
        tag = b"fused-rp" if mesh is None else b"fused-rp-sh"

        t_host = HashChainTranscript(tag)
        p_host, v_host = host_prove(
            bp_gens, pc_gens, t_host, values, blindings, n, det_stream()
        )
        t0 = time.time()
        t_dev = HashChainTranscript(tag)
        p_dev, v_dev = prove_multiple_device(
            bp_gens, pc_gens, t_dev, values, blindings, n,
            rng_bytes=det_stream(), mesh=mesh,
        )
        elapsed = time.time() - t0
        proof_eq = p_dev.to_bytes() == p_host.to_bytes()
        comm_eq = [v.to_bytes() for v in v_dev] == [v.to_bytes() for v in v_host]
        transcript_eq = t_dev.state == t_host.state
        # the opened proof must also verify under the plain verifier
        tv = HashChainTranscript(tag)
        p_dev.verify_multiple(bp_gens, pc_gens, tv, v_dev, n)
        case = {
            "case": label,
            "n": n,
            "m": m,
            "ndev": None if mesh is None else int(mesh.devices.size),
            "proof_sha256": sha(p_dev.to_bytes()),
            "host_proof_sha256": sha(p_host.to_bytes()),
            "transcript_sha256": sha(t_dev.state),
            "proof_bytes_equal": proof_eq,
            "commitments_equal": comm_eq,
            "transcript_equal": transcript_eq,
            "plain_verify_ok": True,
            "device_prove_wall_s": round(elapsed, 1),
        }
        artifact["cases"].append(case)
        ok = proof_eq and comm_eq and transcript_eq
        print(f"{label}: {'PASS' if ok else 'FAIL'} ({elapsed:.0f}s)", flush=True)
        if not ok:
            raise SystemExit(f"{label}: equivalence FAILED")

    run_case("fused_vs_host", 8, 2)
    run_case("fused_sharded_vs_host", 8, 2, mesh=sharded.make_mesh(2))

    out = os.path.join(REPO, "benches", "fused_equivalence.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
