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


def test_mega_check_routes_through_mesh(monkeypatch):
    """A range-proof verify with a mesh installed must run its mega-check
    through sharded_msm (and still accept/reject correctly)."""
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
    # 2 devices: the small proof's ~55-point mega-check must clear the
    # per-device sharding threshold (16/device)
    bp_backend.set_mesh(sharded.make_mesh(2))
    try:
        tv = HashChainTranscript(b"mesh-verify")
        proof.verify_multiple(bp_gens, pc_gens, tv, comms, 8)
    finally:
        bp_backend.set_mesh(None)
    assert calls["n"] >= 1, "mega-check did not route through the mesh"
