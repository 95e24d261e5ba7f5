import time, random, numpy as np, jax
print("backend:", jax.default_backend(), flush=True)
import mpc_bulletproof_tpu as bp
from mpc_bulletproof_tpu.models.inner_product import _create_device, _create_host
from mpc_bulletproof_tpu.ops.field import scalar_powers
rng = random.Random(21)
for n in (64, 1024):
    gens = bp.BulletproofGens(n, 1)
    G, H = gens.share(0).G(n), gens.share(0).H(n)
    Q = bp.StarkPoint.generator().scalar_mul(bp.Scalar(0x99))
    a = [bp.Scalar(rng.getrandbits(251)) for _ in range(n)]
    b = [bp.Scalar(rng.getrandbits(251)) for _ in range(n)]
    Gf = [bp.Scalar(1)] * n
    Hf = scalar_powers(bp.Scalar(rng.getrandbits(251)), n)
    t0 = time.time()
    t1 = bp.HashChainTranscript(b"dev"); t1.innerproduct_domain_sep(n)
    p_dev = _create_device(t1, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    dt1 = time.time() - t0
    t2 = bp.HashChainTranscript(b"dev"); t2.innerproduct_domain_sep(n)
    p_host = _create_host(t2, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    same = p_dev.to_bytes() == p_host.to_bytes() and t1.state == t2.state
    # warm second run
    t0 = time.time()
    t3 = bp.HashChainTranscript(b"dev"); t3.innerproduct_domain_sep(n)
    _create_device(t3, Q, Gf, Hf, list(G), list(H), list(a), list(b))
    dt2 = time.time() - t0
    print(f"device IPP n={n}: first {dt1:.1f}s warm {dt2:.1f}s identical={same}", flush=True)
