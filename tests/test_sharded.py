"""Multi-chip sharding: sharded_msm across device counts + mega-check routing.

Runs on the virtual 8-device CPU mesh (conftest).  Pins: correctness of the
per-device-Pippenger + all-gather MSM at multiple shard counts (including
non-divisible sizes -> padding), and that the protocol-level dispatcher
(ops.backend.dispatch_msm) actually routes a verifier mega-check through the
mesh when one is installed.
"""

import random

import jax.numpy as jnp
import pytest

from mpc_bulletproof_tpu import (
    BulletproofGens,
    HashChainTranscript,
    PedersenGens,
    Scalar,
    StarkPoint,
)
from mpc_bulletproof_tpu.models.range_proof import RangeProof
from mpc_bulletproof_tpu.ops import backend as bp_backend
from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.parallel import sharded

rng = random.Random(4242)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_msm_device_counts(ndev):
    g = StarkPoint.generator()
    k = 37  # non-divisible by either device count
    scalars = [Scalar(rng.getrandbits(251)) for _ in range(k)]
    pts = [g.scalar_mul(Scalar(i + 2)) for i in range(k)]
    mesh = sharded.make_mesh(ndev)
    out = sharded.sharded_msm(
        jnp.asarray(cj.scalars_from_host(scalars)),
        jnp.asarray(cj.points_from_host(pts)),
        mesh,
    )
    assert cj.points_to_host(out[..., None])[0] == StarkPoint.msm(scalars, pts)


def _proof_and_counter(monkeypatch):
    bp_gens = BulletproofGens(8, 2)
    pc_gens = PedersenGens()
    values = [201, 77]
    blinds = [Scalar(5), Scalar(9)]
    t = HashChainTranscript(b"mesh-verify")
    proof, comms = RangeProof.prove_multiple(bp_gens, pc_gens, t, values, blinds, 8)

    calls = {"n": 0}
    orig = sharded.sharded_msm

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(sharded, "sharded_msm", counting)
    monkeypatch.setenv("BP_FORCE_BACKEND", "device")
    return bp_gens, pc_gens, proof, comms, calls


def test_mega_check_routes_through_mesh(monkeypatch):
    """A range-proof verify with a mesh installed must run its mega-check
    through sharded_msm (and still accept/reject correctly)."""
    bp_gens, pc_gens, proof, comms, calls = _proof_and_counter(monkeypatch)
    # The small proof's ~87-point mega-check clears the 16/device threshold
    # at 2 devices; drop the split-table crossover so it also prefers the
    # mesh over the cached native split table.
    monkeypatch.setattr(bp_backend, "_MESH_OVER_SPLIT_MIN", 0)
    bp_backend.set_mesh(sharded.make_mesh(2))
    try:
        tv = HashChainTranscript(b"mesh-verify")
        proof.verify_multiple(bp_gens, pc_gens, tv, comms, 8)
    finally:
        bp_backend.set_mesh(None)
    assert calls["n"] >= 1, "mega-check did not route through the mesh"


def test_small_mega_check_keeps_split_table(monkeypatch):
    """Below the split-table crossover a mesh must NOT steal a small
    mega-check from the cached native split table (the mesh collective is
    slower there) — the over_split routing gate."""
    bp_gens, pc_gens, proof, comms, calls = _proof_and_counter(monkeypatch)
    if bp_gens.split_table(8, 2, pc_gens) is None:
        import pytest as _pytest

        _pytest.skip("native split table unavailable")
    bp_backend.set_mesh(sharded.make_mesh(2))
    try:
        tv = HashChainTranscript(b"mesh-verify")
        proof.verify_multiple(bp_gens, pc_gens, tv, comms, 8)
    finally:
        bp_backend.set_mesh(None)
    assert calls["n"] == 0, "small mega-check abandoned the split table"


def test_verify_batch_routes_through_mesh(monkeypatch):
    """The batched mega-check's mesh path (uniq + b_acc/bb_acc + g_acc/h_acc
    assembly) must route through sharded_msm and still verify."""
    bp_gens, pc_gens, proof, comms, calls = _proof_and_counter(monkeypatch)
    t2 = HashChainTranscript(b"mesh-verify-2")
    proof2, comms2 = RangeProof.prove_multiple(
        bp_gens, pc_gens, t2, [33, 150], [Scalar(11), Scalar(12)], 8
    )
    monkeypatch.setattr(bp_backend, "_MESH_OVER_SPLIT_MIN", 0)
    bp_backend.set_mesh(sharded.make_mesh(2))
    try:
        tv1 = HashChainTranscript(b"mesh-verify")
        tv2 = HashChainTranscript(b"mesh-verify-2")
        RangeProof.verify_batch(
            [proof, proof2], bp_gens, pc_gens, [tv1, tv2], [comms, comms2], 8
        )
    finally:
        bp_backend.set_mesh(None)
    assert calls["n"] >= 1, "batched mega-check did not route through the mesh"
