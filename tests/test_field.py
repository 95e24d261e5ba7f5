import random

from mpc_bulletproof_tpu import R, Scalar
from mpc_bulletproof_tpu.ops.field import (
    add_vec,
    exp_iter,
    inner_product,
    scalar_exp_vartime,
    scalar_powers,
    sum_of_powers,
)

rng = random.Random(7)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def test_basic_arithmetic():
    a, b = rand_scalar(), rand_scalar()
    assert (a + b).value == (a.value + b.value) % R
    assert (a - b).value == (a.value - b.value) % R
    assert (a * b).value == (a.value * b.value) % R
    assert (-a).value == (R - a.value) % R
    assert a + Scalar.zero() == a
    assert a * Scalar.one() == a


def test_inverse():
    a = rand_scalar()
    assert a * a.inverse() == Scalar.one()


def test_batch_inverse():
    vals = [rand_scalar() for _ in range(17)]
    invs = Scalar.batch_inverse(vals)
    for v, i in zip(vals, invs):
        assert v * i == Scalar.one()


def test_bytes_roundtrip():
    a = rand_scalar()
    assert Scalar.from_be_bytes_mod_order(a.to_bytes_be()) == a
    assert len(a.to_bytes_be()) == 32


def test_exp_iter_powers_of_two():
    # Mirrors reference util.rs test `exp_2_is_powers_of_2`.
    it = exp_iter(Scalar(2))
    vals = [next(it) for _ in range(4)]
    assert vals == [Scalar(1), Scalar(2), Scalar(4), Scalar(8)]
    assert scalar_powers(Scalar(2), 4) == vals


def test_inner_product_golden():
    # Mirrors reference inner_product test: <1..4, 2..5> = 40.
    a = [Scalar(i) for i in (1, 2, 3, 4)]
    b = [Scalar(i) for i in (2, 3, 4, 5)]
    assert inner_product(a, b) == Scalar(40)


def test_sum_of_powers():
    # Mirrors reference util.rs tests.
    x = Scalar(10)
    for n in (0, 1, 2, 4, 8, 16, 32, 64, 3, 5, 6):
        slow = Scalar(sum(s.value for s in scalar_powers(x, n)))
        assert sum_of_powers(x, n) == slow
    assert sum_of_powers(x, 3) == Scalar(111)


def test_scalar_exp_vartime():
    x = rand_scalar()
    assert scalar_exp_vartime(x, 5) == x * x * x * x * x


def test_add_vec():
    a = [Scalar(1), Scalar(2)]
    b = [Scalar(3), Scalar(4)]
    assert add_vec(a, b) == [Scalar(4), Scalar(6)]
