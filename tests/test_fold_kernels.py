"""Device fold kernels vs host arithmetic.

``fold_points`` scans over the scalar bits, so the tests use short bit
vectors (small scalars) to keep the Pallas interpreter fast on CPU; the
kernel is bit-length generic.
"""

import random

import jax.numpy as jnp
import numpy as np

from mpc_bulletproof_tpu import Scalar, StarkPoint
from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import fold as fold_mod
from mpc_bulletproof_tpu.ops import limb

rng = random.Random(4242)


def test_fold_scalars_matches_host():
    n = 8
    u = Scalar(rng.getrandbits(251))
    u_inv = u.inverse()
    left = [Scalar(rng.getrandbits(251)) for _ in range(n)]
    right = [Scalar(rng.getrandbits(251)) for _ in range(n)]
    out = fold_mod.fold_scalars(
        jnp.asarray(limb.int_to_limbs_np(u.value)),
        jnp.asarray(limb.int_to_limbs_np(u_inv.value)),
        jnp.asarray(cj.scalars_from_host(left)),
        jnp.asarray(cj.scalars_from_host(right)),
    )
    expect = [u * a + u_inv * b for a, b in zip(left, right)]
    assert cj.scalars_to_host(out) == expect


def test_fold_points_matches_host_short_scalars():
    n = 4
    bits_len = 12  # short scan keeps the interpreter fast
    ul = [rng.getrandbits(bits_len) for _ in range(n)]
    ur = [rng.getrandbits(bits_len) for _ in range(n)]
    g = StarkPoint.generator()
    L = [g.scalar_mul(Scalar(rng.getrandbits(200))) for _ in range(n)]
    R = [g.scalar_mul(Scalar(rng.getrandbits(200))) for _ in range(n)]

    bl = np.array([[(u >> i) & 1 for u in ul] for i in range(bits_len)], dtype=np.int32)
    br = np.array([[(u >> i) & 1 for u in ur] for i in range(bits_len)], dtype=np.int32)
    out = fold_mod.fold_points(
        jnp.asarray(bl), jnp.asarray(br),
        jnp.asarray(cj.points_from_host(L)), jnp.asarray(cj.points_from_host(R)),
    )
    expect = [
        StarkPoint.msm([Scalar(a), Scalar(b)], [x, y])
        for a, b, x, y in zip(ul, ur, L, R)
    ]
    assert cj.points_to_host(out) == expect
