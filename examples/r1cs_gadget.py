#!/usr/bin/env python
"""A constraint-system proof: prove knowledge of a factorization p*q = N
without revealing p, q."""

import os
import sys

# Demos run the host/native backend; set BP_FORCE_BACKEND=device on a TPU pod.
os.environ.setdefault("BP_FORCE_BACKEND", "host")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Prover,
    Scalar,
    Verifier,
)

pc_gens = PedersenGens()
bp_gens = BulletproofGens(8, 1)

p_val, q_val = 2003, 7919
N = p_val * q_val

# Prover side: commit the secret factors, constrain p*q - N = 0.
t = HashChainTranscript(b"factoring")
prover = Prover(pc_gens, t)
(comm_p, var_p) = prover.commit(Scalar(p_val), Scalar.random())
(comm_q, var_q) = prover.commit(Scalar(q_val), Scalar.random())
_, _, product = prover.multiply(var_p.to_lc(), var_q.to_lc())
prover.constrain(product - N)
proof = prover.prove(bp_gens)
print(f"proof: {len(proof.to_bytes())} bytes; circuit weights:")
print(" ", prover.get_weights().to_json()[:96], "...")

# Verifier side: rebuild the same circuit from the commitments.
tv = HashChainTranscript(b"factoring")
verifier = Verifier(pc_gens, tv)
vp = verifier.commit(comm_p)
vq = verifier.commit(comm_q)
_, _, vproduct = verifier.multiply(vp.to_lc(), vq.to_lc())
verifier.constrain(vproduct - N)
verifier.verify(proof, bp_gens)
print(f"verified: {p_val} * {q_val} = {N} (factors hidden)")
