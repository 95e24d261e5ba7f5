from mpc_bulletproof_tpu import BulletproofGens, PedersenGens, Scalar, StarkPoint
from mpc_bulletproof_tpu.generators import GeneratorsChain


def test_pedersen_default_bases():
    pc = PedersenGens()
    g = StarkPoint.generator()
    assert pc.B == g and pc.B_blinding == g
    # commit(v, b) = B*v + B~*b
    v, b = Scalar(5), Scalar(7)
    assert pc.commit(v, b) == g.scalar_mul(Scalar(12))


def test_chain_determinism():
    c1 = GeneratorsChain(b"test").take(4)
    c2 = GeneratorsChain(b"test").take(4)
    assert c1 == c2
    assert GeneratorsChain(b"other").take(1) != c1[:1]
    # fast_forward(n) skips exactly n outputs
    skipped = GeneratorsChain(b"test").fast_forward(2).take(2)
    assert skipped == c1[2:]


def test_aggregated_gens_iter_matches_flat_map():
    # Mirrors reference generators.rs:352-391 (smaller sizes for speed).
    gens = BulletproofGens(16, 4)
    for n in (16, 8, 4):
        for m in (4, 2, 1):
            flat_G = [p for Gj in gens.G_vec[:m] for p in Gj[:n]]
            flat_H = [p for Hj in gens.H_vec[:m] for p in Hj[:n]]
            assert gens.G(n, m) == flat_G
            assert gens.H(n, m) == flat_H


def test_resizing_matches_bigger_gens():
    # Mirrors reference generators.rs:393-414.
    gens = BulletproofGens(16, 2)
    resized = BulletproofGens(8, 2)
    resized.increase_capacity(16)
    for n in (16, 8, 4):
        assert gens.G(n, 2) == resized.G(n, 2)
        assert gens.H(n, 2) == resized.H(n, 2)


def test_party_chains_are_namespaced():
    gens = BulletproofGens(2, 2)
    assert gens.G_vec[0] != gens.G_vec[1]
    assert gens.H_vec[0] != gens.H_vec[1]
    assert gens.G_vec[0] != gens.H_vec[0]


def test_commit_table_cache_rotation():
    """Fixed-base table cache: >8 distinct base pairs force eviction; the
    two tables of one commit call must never alias (regression: pair
    eviction clobbered the first table's slot)."""
    import random

    from mpc_bulletproof_tpu import PedersenGens, Scalar, StarkPoint

    rng = random.Random(9)
    g = StarkPoint.generator()
    for k in range(12):
        B = g.scalar_mul(Scalar(rng.getrandbits(200)))
        Bb = g.scalar_mul(Scalar(rng.getrandbits(200)))
        pc = PedersenGens(B, Bb)
        v, b = Scalar(rng.getrandbits(251)), Scalar(rng.getrandbits(251))
        assert pc.commit(v, b) == B.scalar_mul(v) + Bb.scalar_mul(b), k


def test_commit_batch_matches_singles():
    import random

    from mpc_bulletproof_tpu import PedersenGens, Scalar, StarkPoint

    rng = random.Random(10)
    pc = PedersenGens()
    vs = [Scalar(rng.getrandbits(251)) for _ in range(9)]
    bs = [Scalar(rng.getrandbits(251)) for _ in range(9)]
    batch = pc.commit_batch(vs, bs)
    for v, b, got in zip(vs, bs, batch):
        assert got == StarkPoint.msm([v, b], [pc.B, pc.B_blinding])
    assert pc.commit_batch([], []) == []
    assert pc.commit(Scalar(0), Scalar(0)).is_identity()
