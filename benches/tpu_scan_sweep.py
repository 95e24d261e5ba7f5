#!/usr/bin/env python
"""Round-5 scan-width sweep: per-step latency of point_scan_steps vs lane
count, measured with chained in-program iterations (dispatch-free).

The round-4 numbers (kernel_profile.json) mixed 1024-aligned and unaligned
lane counts; this sweep pins T and walks L over granule multiples only,
plus the plain point_add chain at matching widths as the throughput
ceiling.  net/iter = (t(K=K1) - t(K=1)) / (K1 - 1).
"""
import json
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

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mpc_bulletproof_tpu.ops import kernels
from mpc_bulletproof_tpu.ops.limb import NLZ


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x).reshape(-1)[:1]


def chain_time(make_fn, x, K):
    """Total wall time of K dependent in-program iterations of make_fn."""

    @jax.jit
    def f(x):
        def body(c, _):
            out = make_fn(x + (c & 1))
            # real dependency: fold one element back into the carry
            return out.reshape(-1)[0].astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return c

    sync(f(x))  # compile + warm
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    out = {}
    T = 16
    for L in (2048, 4096, 8192, 16384, 32768):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 13, (3, T, NLZ, L), dtype=np.int32)
        )
        t1 = chain_time(kernels.point_scan_steps, x, 1)
        tK = chain_time(kernels.point_scan_steps, x, 5)
        net = (tK - t1) / 4
        per_step_us = net / T * 1e6
        mads = T * L / net / 1e6
        out[f"scan_T{T}_L{L}"] = {
            "net_ms": net * 1e3,
            "us_per_step": per_step_us,
            "Madds_per_s": mads,
        }
        print(f"L={L:6d} S={L//128:4d}: {per_step_us:8.1f} us/step, "
              f"{mads:7.1f} Madds/s", flush=True)

    # plain point_add ceiling at a comparable total size
    for n in (1 << 18,):
        a = jnp.asarray(
            np.random.default_rng(1).integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32)
        )
        b = jnp.asarray(
            np.random.default_rng(2).integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32)
        )
        t1 = chain_time(lambda x: kernels.point_add(x, b), a, 1)
        tK = chain_time(lambda x: kernels.point_add(x, b), a, 5)
        net = (tK - t1) / 4
        out[f"point_add_n{n}"] = {"net_ms": net * 1e3, "Madds_per_s": n / net / 1e6}
        print(f"point_add n={n}: {n / net / 1e6:7.1f} Madds/s", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "scan_sweep.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
