"""Fixed-base window tables and the merged L/R pair MSM (ops/msm.py).

``fixed_base_table`` / ``fixed_commit`` replace the 252-step Shamir
double-and-add scans for every Pedersen commitment inside the fused
provers (reference call sites: PedersenGens::commit,
src/generators.rs:41-43, used by prover.rs phase commitments);
``_msm_batched_pair_impl`` fuses the per-round L/R MSM pair of the IPP
(src/inner_product_proof.rs:90-114) into one program.  Both are exact
point algebra — validated here against the host curve implementation
through the Pallas interpreter.
"""

import random

import numpy as np
import pytest

from mpc_bulletproof_tpu import Scalar, StarkPoint
from mpc_bulletproof_tpu.constants import R

rng = random.Random(99)


@pytest.mark.heavy_compile
def test_fixed_commit_matches_host():
    import jax.numpy as jnp

    from mpc_bulletproof_tpu.ops import curve_jax as cj
    from mpc_bulletproof_tpu.ops import msm as msm_mod

    B = StarkPoint.generator()
    Bb = B.scalar_mul(Scalar(987654321))
    table = jnp.concatenate(
        [
            msm_mod.fixed_base_table(jnp.asarray(cj.points_from_host([B]))),
            msm_mod.fixed_base_table(jnp.asarray(cj.points_from_host([Bb]))),
        ],
        axis=0,
    )
    stride = msm_mod.FB_WINDOWS * msm_mod.FB_TABLE

    k = 5
    sl = [rng.getrandbits(251) % R for _ in range(k)]
    sr = [rng.getrandbits(251) % R for _ in range(k)]
    sl[0] = 0  # zero scalar -> identity table rows
    sr[1] = 0
    off_l = jnp.asarray([0, 0, stride, 0, stride], dtype=jnp.int32)
    off_r = jnp.full((k,), stride, dtype=jnp.int32)
    out = msm_mod.fixed_commit(
        table,
        off_l,
        jnp.asarray(cj.scalars_from_host([Scalar(v) for v in sl])),
        off_r,
        jnp.asarray(cj.scalars_from_host([Scalar(v) for v in sr])),
    )
    got = cj.points_to_host(out)
    for i in range(k):
        base_l = B if int(off_l[i]) == 0 else Bb
        expect = base_l.scalar_mul(Scalar(sl[i])) + Bb.scalar_mul(Scalar(sr[i]))
        assert got[i] == expect, f"lane {i}"


@pytest.mark.heavy_compile
def test_pair_msm_matches_separate():
    import jax
    import jax.numpy as jnp

    from mpc_bulletproof_tpu.ops import curve_jax as cj
    from mpc_bulletproof_tpu.ops import msm as msm_mod
    from mpc_bulletproof_tpu.ops.limb import NL

    nprng = np.random.default_rng(3)
    n = 96
    sA = jnp.asarray(nprng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
    sB = jnp.asarray(nprng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
    pA = jnp.asarray(
        cj.points_from_host(
            [StarkPoint.generator().scalar_mul(Scalar(i + 2)) for i in range(n)]
        )
    )
    pB = jnp.asarray(
        cj.points_from_host(
            [StarkPoint.generator().scalar_mul(Scalar(3 * i + 5)) for i in range(n)]
        )
    )
    c = 9
    pair = jax.jit(
        lambda a, b, x, y: msm_mod._msm_batched_pair_impl(a, x, b, y, c)
    )(sA, sB, pA, pB)
    got = cj.points_to_host(pair)
    one = jax.jit(lambda s, p: msm_mod._msm_device_impl(s, p, c))
    assert got[0] == cj.points_to_host(one(sA, pA)[..., None])[0]
    assert got[1] == cj.points_to_host(one(sB, pB)[..., None])[0]
