"""Device limb arithmetic vs. exact host (python-int) golden reference."""

import random

import numpy as np
import pytest

from mpc_bulletproof_tpu.constants import P, R
from mpc_bulletproof_tpu.ops import limb

rng = random.Random(1234)


def rand_elems(n, mod):
    return [rng.getrandbits(280) % mod for _ in range(n)]


@pytest.mark.parametrize("mp,mod", [(limb.FP, P), (limb.FR, R)])
def test_roundtrip(mp, mod):
    vals = rand_elems(8, mod) + [0, 1, mod - 1]
    arr = limb.ints_to_limbs(vals)
    assert limb.limbs_to_ints(arr) == vals


@pytest.mark.parametrize("mp,mod", [(limb.FP, P), (limb.FR, R)])
def test_mod_mul(mp, mod):
    a = rand_elems(16, mod) + [0, 1, mod - 1, mod - 1]
    b = rand_elems(16, mod) + [mod - 1, mod - 1, mod - 1, 0]
    out = limb.mod_mul(limb.ints_to_limbs(a), limb.ints_to_limbs(b), mp)
    got = limb.limbs_to_ints(out)
    expect = [(x * y) % mod for x, y in zip(a, b)]
    assert got == expect


@pytest.mark.parametrize("mp,mod", [(limb.FP, P), (limb.FR, R)])
def test_mod_add_sub_neg(mp, mod):
    a = rand_elems(12, mod) + [0, mod - 1]
    b = rand_elems(12, mod) + [0, mod - 1]
    A, B = limb.ints_to_limbs(a), limb.ints_to_limbs(b)
    assert limb.limbs_to_ints(limb.mod_add(A, B, mp)) == [(x + y) % mod for x, y in zip(a, b)]
    assert limb.limbs_to_ints(limb.mod_sub(A, B, mp)) == [(x - y) % mod for x, y in zip(a, b)]
    assert limb.limbs_to_ints(limb.mod_neg(A, mp)) == [(-x) % mod for x in a]


def test_inner_product_mod():
    n = 100
    a = rand_elems(n, R)
    b = rand_elems(n, R)
    out = limb.inner_product_mod(limb.ints_to_limbs(a), limb.ints_to_limbs(b), limb.FR)
    expect = sum(x * y for x, y in zip(a, b)) % R
    assert limb.limbs_to_ints(out[:, None])[0] == expect


def test_inner_product_mod_large_chunked():
    n = (1 << 16) + 7  # crosses the accumulation chunk boundary
    a_np = np.zeros((limb.NL, n), dtype=np.int32)
    a_np[0, :] = 3
    b_np = np.zeros((limb.NL, n), dtype=np.int32)
    b_np[0, :] = 5
    out = limb.inner_product_mod(a_np, b_np, limb.FR)
    assert limb.limbs_to_ints(out[:, None])[0] == (15 * n) % R


def test_sum_mod():
    vals = rand_elems(1000, R)
    out = limb.sum_mod(limb.ints_to_limbs(vals), limb.FR)
    assert limb.limbs_to_ints(out[:, None])[0] == sum(vals) % R


def test_powers():
    x = rand_elems(1, R)[0]
    out = limb.powers(limb.ints_to_limbs([x])[:, 0], 13, limb.FR)
    got = limb.limbs_to_ints(out)
    assert got == [pow(x, i, R) for i in range(13)]


def test_mod_inverse():
    vals = rand_elems(4, R)
    out = limb.mod_inverse(limb.ints_to_limbs(vals), limb.FR)
    got = limb.limbs_to_ints(out)
    assert got == [pow(v, -1, R) for v in vals]


def test_mod_pow_matches():
    vals = rand_elems(3, P)
    out = limb.mod_pow(limb.ints_to_limbs(vals), 65537, limb.FP)
    assert limb.limbs_to_ints(out) == [pow(v, 65537, P) for v in vals]


def test_jit_compatibility():
    import jax

    a = limb.ints_to_limbs(rand_elems(4, R))
    b = limb.ints_to_limbs(rand_elems(4, R))
    f = jax.jit(lambda x, y: limb.mod_mul(x, y, limb.FR))
    assert limb.limbs_to_ints(f(a, b)) == limb.limbs_to_ints(limb.mod_mul(a, b, limb.FR))
