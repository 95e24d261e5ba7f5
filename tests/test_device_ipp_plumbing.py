"""Device-IPP plumbing test.

Full-speed device MSMs only run on TPU (the Pallas interpreter is too slow
for CPU CI), so this test validates everything *around* them: the round
scalar construction (gathers, coefficient updates, folds — all small XLA
ops that do run here) by monkeypatching ``msm_device`` with an exact
host-arithmetic equivalent.  Combined with the element-wise kernel tests
(test_limb/test_curve_jax) and the MSM algorithm test
(test_msm_algorithm), this pins the whole device path up to Mosaic
execution, which the TPU benchmarks exercise.
"""

import random

import numpy as np
import pytest

from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, Scalar, StarkPoint
from mpc_bulletproof_tpu.models import inner_product as ipp_mod
from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import msm as msm_mod
from mpc_bulletproof_tpu.ops.field import scalar_powers

rng = random.Random(808)


def _host_msm_device(scalars, points, c=None):
    """Exact stand-in for msm_device: same signature, host arithmetic."""
    s = cj.scalars_to_host(scalars)
    p = cj.points_to_host(points)
    result = StarkPoint.msm(s, p)
    return cj.points_from_host([result])[..., 0]


@pytest.mark.parametrize("n", [8, 16])
def test_device_ipp_matches_host(n, monkeypatch):
    monkeypatch.setattr(msm_mod, "msm_device", _host_msm_device)

    gens = BulletproofGens(n, 1)
    G, H = gens.share(0).G(n), gens.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0x5555))
    a = [Scalar(rng.getrandbits(260)) for _ in range(n)]
    b = [Scalar(rng.getrandbits(260)) for _ in range(n)]
    Gf = [Scalar(7)] * n
    Hf = scalar_powers(Scalar(rng.getrandbits(251)), n)

    t_dev = HashChainTranscript(b"plumb")
    t_dev.innerproduct_domain_sep(n)
    p_dev = ipp_mod._create_device(t_dev, Q, Gf, Hf, list(G), list(H), list(a), list(b))

    t_host = HashChainTranscript(b"plumb")
    t_host.innerproduct_domain_sep(n)
    p_host = ipp_mod._create_host(t_host, Q, Gf, Hf, list(G), list(H), list(a), list(b))

    assert p_dev.to_bytes() == p_host.to_bytes()
    assert t_dev.state == t_host.state


@pytest.mark.heavy_compile
@pytest.mark.parametrize("n", [8])
def test_fused_device_ipp_matches_host(n):
    """The fused single-program prover (device keccak transcript, in-graph
    MSMs through the Pallas interpreter) must be byte-identical to the host
    prover, including the final transcript state."""
    gens = BulletproofGens(n, 1)
    G, H = gens.share(0).G(n), gens.share(0).H(n)
    Q = StarkPoint.generator().scalar_mul(Scalar(0xABCD))
    a = [Scalar(rng.getrandbits(260)) for _ in range(n)]
    b = [Scalar(rng.getrandbits(260)) for _ in range(n)]
    Gf = scalar_powers(Scalar(rng.getrandbits(251)), n)
    Hf = scalar_powers(Scalar(rng.getrandbits(251)), n)

    t_dev = HashChainTranscript(b"fused")
    t_dev.innerproduct_domain_sep(n)
    p_dev = ipp_mod._create_device_fused(t_dev, Q, Gf, Hf, list(G), list(H), list(a), list(b))

    t_host = HashChainTranscript(b"fused")
    t_host.innerproduct_domain_sep(n)
    p_host = ipp_mod._create_host(t_host, Q, Gf, Hf, list(G), list(H), list(a), list(b))

    assert p_dev.to_bytes() == p_host.to_bytes()
    assert t_dev.state == t_host.state
