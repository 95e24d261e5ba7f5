#!/usr/bin/env python
"""Time the fused prover's building blocks standalone (warm, net of the
~55 ms tunnel readback, via the run-twice-minus-once chain trick)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from mpc_bulletproof_tpu.models import inner_product as ipmod
from mpc_bulletproof_tpu.ops import kernels, limb, msm
from mpc_bulletproof_tpu.ops import transcript_jax as tj
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

rng = np.random.default_rng(7)
n_bits, m = 64, 64
nm = n_bits * m


def sync(x):
    jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf).reshape(-1)[:1]
        break


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)
    return best


scl = lambda n: jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
pts = lambda n: jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))

# the phase-1 S commitment MSM (2nm+1 points)
c_big = msm.select_window(2 * nm)
f = jax.jit(lambda s, p: msm._msm_device_impl(s, p, c_big, affine=False))
timeit(f"msm n={2*nm} (S commit)", f, scl(2 * nm), pts(2 * nm))

# A = reduce over 2nm selected points
f2 = jax.jit(lambda p: msm._reduce_sum(p))
timeit(f"reduce_sum n={2*nm} (A commit)", f2, pts(2 * nm))

# pair MSM at IPP round-0 width
c_ipp = msm.select_window(nm + 1)
f3 = jax.jit(
    lambda sa, pa, sb, pb: msm._msm_batched_pair_impl(sa, pa, sb, pb, c_ipp)
)
timeit(
    f"pair msm n={nm+1} (IPP round)", f3,
    scl(nm + 1), pts(nm + 1), scl(nm + 1), pts(nm + 1),
)

# inner products / scalar vector work at nm
f4 = jax.jit(lambda a, b: limb._inner_product_mod(a, b, limb.FR))
timeit(f"inner_product n={nm}", f4, scl(nm), scl(nm))

f5 = jax.jit(lambda a, b: limb._mod_mul(a, b, limb.FR))
timeit(f"vec mod_mul n={nm} (XLA)", f5, scl(nm), scl(nm))

f5k = lambda a, b: kernels.vec_mul(a, b)
timeit(f"vec mod_mul n={nm} (pallas)", f5k, scl(nm), scl(nm))

# powers ladder
f6 = jax.jit(lambda x: limb._powers(x[:, 0], nm, limb.FR))
timeit(f"powers n={nm}", f6, scl(1))

# scalar inversion ladder
from mpc_bulletproof_tpu.constants import R
f7 = lambda x: kernels.mod_pow_static(x, R - 2, limb.FR)
timeit("mod_pow_static (inverse)", f7, scl(1))

# keccak absorb chain (64 sequential point absorbs like the V loop)
state0 = jnp.asarray(rng.integers(0, 255, (200,), dtype=np.int32).astype(np.uint32))
enc = jnp.asarray(rng.integers(0, 255, (64,), dtype=np.int32).astype(np.uint32))


def absorb_chain(k):
    @jax.jit
    def f(st, e):
        for _ in range(k):
            st = tj.absorb(st, b"V", e, 64)
        return st
    return f


a1 = absorb_chain(1)
a65 = absorb_chain(65)
sync(a1(state0, enc)); sync(a65(state0, enc))
t0 = time.time(); sync(a1(state0, enc)); d1 = time.time() - t0
t0 = time.time(); sync(a65(state0, enc)); d65 = time.time() - t0
print(f"{'absorb (net, per point)':34s} {(d65-d1)/64*1e3:9.2f} ms", flush=True)

# challenge_scalar
f8 = jax.jit(lambda st: tj.challenge_scalar(st, b"y"))
timeit("challenge_scalar", f8, state0)

# lazy_points_to_affine at 2 lanes (the per-round L/R convert)
f9 = jax.jit(lambda p: tj.lazy_points_to_affine(p))
timeit("points_to_affine (2 lanes)", f9, pts(2))

# full fused IPP at nm
ipp = ipmod.fused_ipp_body(nm)
ippj = jax.jit(ipp)
wG = jnp.asarray(limb.ints_to_limbs([1] * nm))
timeit(
    f"fused IPP n={nm}", ippj,
    state0[:50], scl(nm), scl(nm), wG, scl(nm), pts(2 * nm + 1),
)
