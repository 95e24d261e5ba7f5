#!/usr/bin/env python
"""Single + aggregated range proofs (the reference README's doctest flow)."""

import os
import sys

# Demos run the host/native backend; set BP_FORCE_BACKEND=device on a TPU pod.
os.environ.setdefault("BP_FORCE_BACKEND", "host")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    RangeProof,
    Scalar,
)

pc_gens = PedersenGens()
bp_gens = BulletproofGens(64, 16)

# --- single 32-bit proof -------------------------------------------------
secret_value = 1037578891
blinding = Scalar.random()
prover_transcript = HashChainTranscript(b"doctest example")
proof, committed_value = RangeProof.prove_single(
    bp_gens, pc_gens, prover_transcript, secret_value, blinding, 32
)
verifier_transcript = HashChainTranscript(b"doctest example")
proof.verify_single(bp_gens, pc_gens, verifier_transcript, committed_value, 32)
print(f"single 32-bit proof: {len(proof.to_bytes())} bytes, verified")

# --- aggregated 64-bit proofs -------------------------------------------
values = [0, 1, (1 << 64) - 1, 2**32]
blindings = [Scalar.random() for _ in values]
t = HashChainTranscript(b"aggregated example")
agg_proof, commitments = RangeProof.prove_multiple(
    bp_gens, pc_gens, t, values, blindings, 64
)
tv = HashChainTranscript(b"aggregated example")
agg_proof.verify_multiple(bp_gens, pc_gens, tv, commitments, 64)
print(f"aggregated m={len(values)} proof: {len(agg_proof.to_bytes())} bytes, verified")
