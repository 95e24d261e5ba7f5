import random

from mpc_bulletproof_tpu import R, Scalar, StarkPoint
from mpc_bulletproof_tpu.constants import ALPHA, BETA, GEN_X, GEN_Y, P
from mpc_bulletproof_tpu.ops.curve import stark_point_to_transcript_bytes

rng = random.Random(11)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def test_curve_constants_consistent():
    # Generator is on the curve.
    assert (GEN_Y * GEN_Y - (GEN_X**3 + ALPHA * GEN_X + BETA)) % P == 0
    # Group order: R * G = identity.
    assert StarkPoint.generator().scalar_mul(Scalar(0)) == StarkPoint.identity()
    g = StarkPoint.generator()
    assert (g.scalar_mul(Scalar(R - 1)) + g) == StarkPoint.identity()


def test_add_double_consistency():
    g = StarkPoint.generator()
    assert g + g == g.double()
    assert g + g + g == g.scalar_mul(Scalar(3))
    assert g + StarkPoint.identity() == g
    assert StarkPoint.identity() + g == g
    assert g - g == StarkPoint.identity()


def test_scalar_mul_distributes():
    g = StarkPoint.generator()
    a, b = rand_scalar(), rand_scalar()
    assert g.scalar_mul(a) + g.scalar_mul(b) == g.scalar_mul(a + b)


def test_msm_matches_naive():
    g = StarkPoint.generator()
    pts = [g.scalar_mul(rand_scalar()) for _ in range(20)]
    scalars = [rand_scalar() for _ in range(20)]
    naive = StarkPoint.identity()
    for s, p in zip(scalars, pts):
        naive = naive + p.scalar_mul(s)
    assert StarkPoint.msm(scalars, pts) == naive


def test_msm_empty_and_zero():
    assert StarkPoint.msm([], []) == StarkPoint.identity()
    g = StarkPoint.generator()
    assert StarkPoint.msm([Scalar(0)] * 6, [g] * 6) == StarkPoint.identity()


def test_point_serialization_roundtrip():
    g = StarkPoint.generator()
    for s in [Scalar(1), Scalar(2), rand_scalar(), rand_scalar()]:
        p = g.scalar_mul(s)
        data = p.to_bytes()
        assert len(data) == 32
        assert StarkPoint.from_bytes(data) == p
    # identity
    ident = StarkPoint.identity()
    assert StarkPoint.from_bytes(ident.to_bytes()) == ident
    # negation gives a different encoding
    p = g.scalar_mul(rand_scalar())
    assert (-p).to_bytes() != p.to_bytes()
    assert StarkPoint.from_bytes((-p).to_bytes()) == -p


def test_transcript_bytes_encoding():
    g = StarkPoint.generator()
    data = stark_point_to_transcript_bytes(g)
    assert len(data) == 64
    assert int.from_bytes(data[:32], "little") == GEN_X
    assert int.from_bytes(data[32:], "little") == GEN_Y
    assert stark_point_to_transcript_bytes(StarkPoint.identity()) == b"\x00" * 64


def test_msm_bucket_edge_cases():
    """Duplicate points in one bucket (forces the batch-affine doubling
    branch) and P,-P pairs in one bucket (forces cancellation)."""
    g = StarkPoint.generator()
    p = g.scalar_mul(Scalar(12345))
    # same scalar + same point 8x -> all in one bucket, repeated doubling/adds
    scalars = [Scalar(5)] * 8
    pts = [p] * 8
    naive = StarkPoint.identity()
    for s, q in zip(scalars, pts):
        naive = naive + q.scalar_mul(s)
    assert StarkPoint.msm(scalars, pts) == naive

    # P and -P with the same scalar -> cancellation inside a bucket
    scalars = [Scalar(7), Scalar(7), Scalar(7)]
    pts = [p, -p, g]
    naive = g.scalar_mul(Scalar(7))
    assert StarkPoint.msm(scalars, pts) == naive

    # cancellation then refill
    scalars = [Scalar(3)] * 4
    pts = [p, -p, p, p]
    naive = p.scalar_mul(Scalar(6))
    assert StarkPoint.msm(scalars, pts) == naive
