#!/usr/bin/env python
"""Stage breakdown of the on-chip MSM at one size (dispatch-corrected).

Times, as separate jits: digit decomposition + per-window argsort, the
sorted gather, the bucket scan phase (windowed prefix + suffix-sum
reduction), the Horner window combine, and the full MSM.  Identifies
which stage to attack next.

Usage: python benches/tpu_msm_stages.py [log2_n] [c]
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

from mpc_bulletproof_tpu.ops import msm, kernels, curve_jax as cj
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

DISPATCH_S = 0.05


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def timeit(fn, *args, reps=3):
    t0 = time.time()
    sync(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    return max(min(ts) - DISPATCH_S, 0.0), comp


def main():
    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << ln
    c = int(sys.argv[2]) if len(sys.argv) > 2 else msm.select_window(n)
    nw = -(-msm.FIELD_BITS // c)
    print(f"backend={jax.default_backend()} n=2^{ln} c={c} nw={nw}", flush=True)

    rng = np.random.default_rng(3)
    scl = jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
    pts = jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))

    @jax.jit
    def stage_digits_sort(s):
        digits = msm._signed_digits(s, c)
        keys = jnp.abs(digits)
        order = jnp.argsort(keys, axis=-1)
        d_sorted = jnp.take_along_axis(keys, order, axis=-1)
        return order, d_sorted

    @jax.jit
    def stage_gather(s, p):
        digits = msm._signed_digits(s, c)
        keys = jnp.abs(digits)
        order = jnp.argsort(keys, axis=-1)
        wg = msm._window_group(nw, n)
        out = p[:, :, order[:wg]]
        return out

    @jax.jit
    def stage_scan(p):
        # bucket scan phase alone on a (3, NLZ, wg, n) block
        wg = msm._window_group(nw, n)
        B = (1 << (c - 1)) + 1
        blk = jnp.broadcast_to(p[:, :, None, :], (3, NLZ, wg, n))
        pos = jnp.broadcast_to(
            jnp.linspace(0, n - 1, B - 1).astype(jnp.int32)[None, :], (wg, B - 1)
        )
        return msm._windowed_bucket_sums(blk, pos, B)

    @jax.jit
    def full(s, p):
        return msm._msm_device_impl(s, p, c)

    for name, fn, args in [
        ("digits+argsort", stage_digits_sort, (scl,)),
        ("sorted gather ", stage_gather, (scl, pts)),
        ("bucket scan   ", stage_scan, (pts,)),
        ("full msm      ", full, (scl, pts)),
    ]:
        net, comp = timeit(fn, *args)
        print(f"{name}: {net * 1e3:8.1f} ms  (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
