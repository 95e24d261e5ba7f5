#!/usr/bin/env python
"""On-chip MSM throughput on the live TPU (dispatch-corrected).

Methodology (see docs/tpu-design.md): the axon tunnel adds a flat ~50 ms
dispatch latency and ships host operands at ~100 MB/s, so operands are
generated ON-DEVICE inside the jit and 50 ms is subtracted from wall time.
Random limb tensors are field-valid inputs for throughput purposes (every
kernel is branchless/constant-time in the data).

Usage: python benches/tpu_msm_bench.py [log2_sizes...]   (default 12 16 18 20)
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

from mpc_bulletproof_tpu.ops import msm
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

DISPATCH_S = 0.05


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def gen_scalars(key, n):
    s = jax.random.randint(key, (NL, n), 0, 1 << 13, jnp.int32)
    return s.at[NL - 1].set(s[NL - 1] & 0xF)  # < 2^251


def gen_points(key, n):
    return jax.random.randint(key, (3, NLZ, n), 0, 1 << 13, jnp.int32)


def bench_msm(n, reps=3, affine=True):
    """Affine=True matches real workloads: every host-fed MSM (verifier
    mega-check, IPP inputs, generators) carries affine-or-identity points."""
    c = msm.select_window(n)

    from mpc_bulletproof_tpu.ops import curve_jax as cj

    @jax.jit
    def run(key):
        s = gen_scalars(key, n)
        p = gen_points(jax.random.fold_in(key, 1), n)
        if affine:
            one = cj.identity(())[1]  # mont_one limbs
            p = p.at[2].set(jnp.broadcast_to(one[:, None], (NLZ, n)))
        return msm._msm_device_impl(s, p, c, affine=affine)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    sync(run(key))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(run(key))
        ts.append(time.time() - t0)
    net = min(ts) - DISPATCH_S
    print(
        f"MSM n=2^{n.bit_length() - 1} ({n}) c={c} affine={affine}:"
        f" net {net * 1e3:.0f} ms"
        f" -> {n / max(net, 1e-9) / 1e6:.3f} Mpoints/s (compile {comp:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    affine = os.environ.get("BENCH_AFFINE", "1") != "0"
    sizes = [int(a) for a in sys.argv[1:]] or [12, 16, 18, 20]
    print("backend:", jax.default_backend(), flush=True)
    for ln in sizes:
        bench_msm(1 << ln, affine=affine)
