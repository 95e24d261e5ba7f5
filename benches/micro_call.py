"""Microbenchmark: fixed cost of a pallas_call inside one jitted program.

The fused prover issues ~10-15 pallas calls per IPP round (scans, boundary
adds, reduce trees, horner).  Round-2 notes measured "~4-5 ms per call" for
the XLA halving tree; this pins the number down for the current stack by
timing chains of k point_add pallas calls (small width, so VPU work is
negligible) and k-step grid scans, inside ONE jit.

Run on the live chip: prints per-call / per-grid-step costs.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mpc_bulletproof_tpu.ops import kernels
from mpc_bulletproof_tpu.ops.limb import NL, NLZ


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def timeit(f, *args, reps=5):
    sync(f(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rand_pts(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))


def bench_call_chain(n):
    a, b = rand_pts(n, 0), rand_pts(n, 1)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(a, b, r):
        out = a
        for _ in range(r):
            out = kernels.point_add(out, b)
        return out

    t_lo = timeit(lambda x, y: chain(x, y, 2), a, b)
    t_hi = timeit(lambda x, y: chain(x, y, 22), a, b)
    per_call = (t_hi - t_lo) / 20
    print(f"pallas point_add call n={n:6d}: {per_call*1e6:8.1f} us/call "
          f"(t2={t_lo*1e3:.2f} ms t22={t_hi*1e3:.2f} ms)")
    return per_call


def bench_grid_steps(L):
    # same VPU work per step as a point_add of L lanes, but as grid steps
    for T_lo, T_hi in ((8, 64),):
        x_lo = rand_pts(L * T_lo).reshape(3, NLZ, T_lo, L).transpose(0, 2, 1, 3)
        x_hi = rand_pts(L * T_hi).reshape(3, NLZ, T_hi, L).transpose(0, 2, 1, 3)
        f = jax.jit(kernels.point_scan_steps)
        t_lo = timeit(f, x_lo)
        t_hi = timeit(f, x_hi)
        per_step = (t_hi - t_lo) / (T_hi - T_lo)
        print(f"scan grid step L={L:5d}: {per_step*1e6:8.1f} us/step "
              f"(T{T_lo}={t_lo*1e3:.2f} ms T{T_hi}={t_hi*1e3:.2f} ms)")


if __name__ == "__main__":
    print(f"device={jax.devices()[0]}")
    for n in (1024, 8192, 65536):
        bench_call_chain(n)
    for L in (1024, 5376):
        bench_grid_steps(L)
