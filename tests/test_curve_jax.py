"""Device complete-addition formulas vs. exact host curve arithmetic."""

import random

import numpy as np

from mpc_bulletproof_tpu import Scalar, StarkPoint
from mpc_bulletproof_tpu.ops import curve_jax as cj

rng = random.Random(99)


def rand_points(n):
    g = StarkPoint.generator()
    return [g.scalar_mul(Scalar(rng.getrandbits(260))) for _ in range(n)]


def test_roundtrip_host_device():
    pts = rand_points(5) + [StarkPoint.identity()]
    arr = cj.points_from_host(pts)
    assert cj.points_to_host(arr) == pts


def test_point_add_matches_host():
    a = rand_points(8)
    b = rand_points(8)
    out = cj.point_add(cj.points_from_host(a), cj.points_from_host(b))
    assert cj.points_to_host(out) == [x + y for x, y in zip(a, b)]


def test_point_add_edge_cases():
    g = StarkPoint.generator()
    p = rand_points(1)[0]
    ident = StarkPoint.identity()
    cases = [
        (p, p),            # doubling through the unified formula
        (p, -p),           # inverse -> identity
        (p, ident),        # right identity
        (ident, p),        # left identity
        (ident, ident),    # identity + identity
        (g, g.double()),   # generic
    ]
    a = cj.points_from_host([c[0] for c in cases])
    b = cj.points_from_host([c[1] for c in cases])
    out = cj.points_to_host(cj.point_add(a, b))
    assert out == [x + y for x, y in cases]


def test_point_double_and_neg():
    pts = rand_points(4) + [StarkPoint.identity()]
    arr = cj.points_from_host(pts)
    assert cj.points_to_host(cj.point_double(arr)) == [p.double() for p in pts]
    assert cj.points_to_host(cj.point_neg(arr)) == [-p for p in pts]


def test_point_reduce_sum():
    for n in (1, 2, 3, 7, 16):
        pts = rand_points(n)
        expect = StarkPoint.identity()
        for p in pts:
            expect = expect + p
        got = cj.points_to_host(cj.point_reduce_sum(cj.points_from_host(pts))[None])[0]
        assert got == expect


def test_is_identity():
    pts = [StarkPoint.identity(), rand_points(1)[0]]
    flags = np.asarray(cj.is_identity(cj.points_from_host(pts)))
    assert flags.tolist() == [True, False]
