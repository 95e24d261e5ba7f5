#!/usr/bin/env python
"""Two-party collaborative proof: parties hold shares of a witness and
jointly prove (a + b)^2 = c without revealing a or b to each other."""

import os
import sys

# Demos run the host/native backend; set BP_FORCE_BACKEND=device on a TPU pod.
os.environ.setdefault("BP_FORCE_BACKEND", "host")
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    MpcProver,
    PedersenGens,
    Scalar,
    Verifier,
)
from mpc_bulletproof_tpu.parallel.beaver import PartyIdBeaverSource
from mpc_bulletproof_tpu.parallel.fabric import MpcFabric
from mpc_bulletproof_tpu.parallel.network import make_local_pair

pc_gens = PedersenGens()
bp_gens = BulletproofGens(8, 1)

a_val, b_val = 15, 27          # party 0's / party 1's secrets
c_val = (a_val + b_val) ** 2   # public statement
blind = [Scalar.random(), Scalar.random()]

net0, net1 = make_local_pair()
results = [None, None]


def party(pid, net):
    fabric = MpcFabric(net, PartyIdBeaverSource(pid))
    transcript = HashChainTranscript(b"mpc example")
    prover = MpcProver(fabric, pc_gens, transcript)
    if pid == 0:
        comms_a, vars_a = prover.batch_commit(0, [Scalar(a_val)], [blind[0]])
        comms_b, vars_b = prover.batch_commit(1, None, None, count=1)
    else:
        comms_a, vars_a = prover.batch_commit(0, None, None, count=1)
        comms_b, vars_b = prover.batch_commit(1, [Scalar(b_val)], [blind[1]])
    total = vars_a[0] + vars_b[0]
    _, _, sq = prover.multiply(total, total.copy())
    prover.constrain(sq - c_val)
    results[pid] = (prover.prove(bp_gens).open(), comms_a + comms_b)


threads = [
    threading.Thread(target=party, args=(0, net0)),
    threading.Thread(target=party, args=(1, net1)),
]
for th in threads:
    th.start()
for th in threads:
    th.join()

proof, comms = results[0]

# Anyone can verify with the plain single-prover verifier.
tv = HashChainTranscript(b"mpc example")
verifier = Verifier(pc_gens, tv)
va = verifier.commit(comms[0])
vb = verifier.commit(comms[1])
total = va + vb
_, _, sq = verifier.multiply(total, total.copy())
verifier.constrain(sq - c_val)
verifier.verify(proof, bp_gens)
print(f"collaborative proof verified: (a + b)^2 = {c_val}, shares never revealed")
