#!/usr/bin/env python
"""Grid-scan step latency on chip: wall time vs (T steps, L lanes).

The MSM bucket phase is T sequential grid steps of an L-lane point add;
its per-step latency bounds every large MSM.  Reports ms per step and the
implied adds/sec so lane-count and kernel-overhead changes are measurable
in isolation (a fused-prover compile takes ~25 min; this takes ~2)."""
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

from mpc_bulletproof_tpu.ops import kernels
from mpc_bulletproof_tpu.ops.limb import NLZ

DISPATCH_S = 0.05


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x).reshape(-1)[:1]


def bench(T, L, reps=3):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 13, (3, T, NLZ, L), dtype=np.int32))

    @jax.jit
    def f(x):
        # reduce on device: only 32 bytes cross the tunnel
        return kernels.point_scan_steps(x)[:, -1, :, 0]
    t0 = time.time()
    sync(f(x))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(f(x))
        ts.append(time.time() - t0)
    net = max(min(ts) - DISPATCH_S, 1e-9)
    print(
        f"T={T:5d} L={L:5d}: net {net * 1e3:8.1f} ms -> {net / T * 1e6:7.1f} us/step,"
        f" {T * L / net / 1e6:6.2f} Madds/s (compile {comp:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    cases = [(128, 896), (128, 1792), (128, 2688)] if not args else [
        (int(args[i]), int(args[i + 1])) for i in range(0, len(args), 2)
    ]
    print("backend:", jax.default_backend(), flush=True)
    for T, L in cases:
        bench(T, L)
