import time, random, numpy as np, jax
import jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from mpc_bulletproof_tpu import Scalar, StarkPoint
from mpc_bulletproof_tpu.ops import curve_jax as cj, msm

rng = random.Random(5)
g = StarkPoint.generator()
base = [g.scalar_mul(Scalar(rng.getrandbits(251))) for _ in range(256)]

for n in (1 << 18, 1 << 20):
    pts_h = (base * (n // 256))[:n]
    scl_h = [Scalar(rng.getrandbits(251)) for _ in range(n)]
    pts = jnp.asarray(cj.points_from_host(pts_h))
    scl = jnp.asarray(cj.scalars_from_host(scl_h))
    t0 = time.time()
    r = msm.msm_device(scl, pts)
    _ = np.asarray(r[0, 0:1])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(2):
        r = msm.msm_device(scl, pts)
    _ = np.asarray(r[0, 0:1])
    dt = (time.time() - t0) / 2
    print(f"msm n=2^{n.bit_length()-1}: compile {compile_s:.1f}s warm {dt*1e3:.1f}ms -> {n/dt/1e6:.3f} Mpoints/s", flush=True)
