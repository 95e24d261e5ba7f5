#!/usr/bin/env python
"""Stage breakdown of the fused device range prover at (n_bits, m).

Times, as separate jits: the round-MSM shape the fused IPP uses (full
width n+1 per round), the S commitment MSM (2n), the Shamir point-fold
scan, the in-kernel pow ladder, the t-poly inner products, one full
fused-IPP run, and the end-to-end fused prove.  Identifies which stage
of the 25 ms/value device prove to attack.

Usage: python benches/tpu_prover_stages.py [n_bits] [m]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mpc_bulletproof_tpu.ops import msm, kernels, fold as fold_mod, limb
from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import transcript_jax as tj
from mpc_bulletproof_tpu.ops.limb import NL, NLZ, FR, FP
from mpc_bulletproof_tpu.constants import R, P

DISPATCH_S = 0.05


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    sync(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    net = max(min(ts) - DISPATCH_S, 0.0)
    print(f"{name:34s} {net*1e3:9.1f} ms   (compile {comp:.1f}s)", flush=True)
    return net


def main():
    n_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nm = n_bits * m
    print(f"backend={jax.default_backend()} n_bits={n_bits} m={m} nm={nm}", flush=True)

    rng = np.random.default_rng(5)
    scl = lambda k: jnp.asarray(rng.integers(0, 1 << 13, (NL, k), dtype=np.int32))
    pts = lambda k: jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, k), dtype=np.int32))

    c_round = msm.select_window(nm + 1)
    c_big = msm.select_window(2 * nm)
    nw = -(-252 // c_round)
    print(f"round MSM: width {nm+1} c={c_round} nw={nw}; S MSM: width {2*nm} c={c_big}")

    # one full-width round MSM (the fused IPP runs 2*log2(nm) of these)
    f_round = jax.jit(lambda s, p: msm._msm_device_impl(s, p, c_round))
    t_round = timeit("round MSM (nm+1)", f_round, scl(nm + 1), pts(nm + 1))

    f_big = jax.jit(lambda s, p: msm._msm_device_impl(s, p, c_big))
    t_big = timeit("S MSM (2nm)", f_big, scl(2 * nm), pts(2 * nm))

    # A = reduce_sum over 2nm selected points
    f_red = jax.jit(lambda p: msm._reduce_sum(p))
    timeit("A reduce_sum (2nm)", f_red, pts(2 * nm))

    # Shamir fold scan at m+2 lanes (V/A/S blinds)
    bl = fold_mod.scalar_bits(scl(m + 2))
    br = fold_mod.scalar_bits(scl(m + 2))
    timeit("fold_points scan (m+2 lanes)", fold_mod.fold_points, bl, br, pts(m + 2), pts(m + 2))

    # in-kernel pow ladder (u_inv per round; z-inv per affine convert)
    timeit("mod_pow_static R-2 (1 lane)", lambda x: kernels.mod_pow_static(x, R - 2, FR), scl(1))

    # lazy->affine (per round for L/R, plus V/A/S/T absorbs)
    f_aff = jax.jit(lambda p: tj.lazy_points_to_affine(p))
    timeit("lazy_points_to_affine (2 pts)", f_aff, pts(2))

    # t-poly inner products (3 of these at nm)
    f_ip = jax.jit(lambda a, b: limb._inner_product_mod(a, b, FR))
    timeit("inner_product_mod (nm)", f_ip, scl(nm), scl(nm))

    # transcript absorb + challenge
    state = jnp.asarray(rng.integers(0, 256, (32,), dtype=np.int32)).astype(jnp.uint32)
    f_ch = jax.jit(lambda s: tj.challenge_scalar(s, b"u"))
    timeit("challenge_scalar", f_ch, state)

    # full fused IPP at nm
    from mpc_bulletproof_tpu.models.inner_product import fused_ipp_body
    run = jax.jit(fused_ipp_body(nm))
    wG = scl(nm)
    t_ipp = timeit("fused IPP (log2 nm rounds)", run, state, scl(nm), scl(nm), wG, wG, pts(nm + 1), reps=2)

    lg = nm.bit_length() - 1
    print(f"\nIPP = {lg} rounds; 2 round-MSMs/round -> {2*lg} x {t_round*1e3:.1f} ms "
          f"= {2*lg*t_round*1e3:.0f} ms predicted vs {t_ipp*1e3:.0f} ms measured")

    # end-to-end fused prove
    from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, PedersenGens, Scalar
    from mpc_bulletproof_tpu.models.range_proof.fused_device import prove_multiple_device
    import random
    prng = random.Random(1234)
    values = [prng.randrange(0, 1 << n_bits) for _ in range(m)]
    blindings = [Scalar(prng.getrandbits(260)) for _ in range(m)]
    pc = PedersenGens()
    bp = BulletproofGens(n_bits, m)

    def prove():
        t = HashChainTranscript(b"bench")
        return prove_multiple_device(bp, pc, t, values, blindings, n_bits)

    t0 = time.time(); prove(); comp = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time(); prove(); ts.append(time.time() - t0)
    tot = min(ts)
    print(f"{'fused prove end-to-end':34s} {tot*1e3:9.1f} ms   (first {comp:.1f}s)  "
          f"{tot/m*1e6:.0f} us/value", flush=True)


if __name__ == "__main__":
    main()
