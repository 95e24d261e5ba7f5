#!/usr/bin/env python
"""Window-size sweep for the fused prover's pair MSM at the m=64 shape.

With the round-5 wide grid scan, per-window scan work is cheap (~7 ns/lane)
while per-bucket boundary work (gathers + suffix machinery) is not; the
optimal c moves DOWN.  Chained in-program iterations, net/iter.
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

from mpc_bulletproof_tpu.ops import msm
from mpc_bulletproof_tpu.ops.limb import NL

rng = np.random.default_rng(7)
nm = 4096
LANES = msm.SPLIT_CHUNKS * (nm + 1)
N_TABLE = 2 * nm + 1


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x).reshape(-1)[:1]


def chain_time(fn, x, K):
    @jax.jit
    def f(x):
        def body(c, _):
            out = fn(x + (c & 1))
            return out.reshape(-1)[0].astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return c

    sync(f(x))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    s4 = jnp.asarray(rng.integers(0, 1 << 13, (NL, LANES), dtype=np.int32))
    table = jnp.asarray(rng.integers(0, 1 << 13, (msm.SPLIT_CHUNKS * N_TABLE, 16), dtype=np.int32))
    rec = jnp.asarray(
        msm.split_record_indices(
            rng.integers(0, N_TABLE, (nm + 1,), dtype=np.int32).astype(np.int32),
            N_TABLE,
        )
    )
    out = {}
    for c in (11, 8, 6, 5):
        nt, T = msm._chunk_shape(2 * (-(-64 // c)), LANES)
        t1 = chain_time(lambda s, c=c: msm._msm_multi_table_impl(
            [(s, rec), (s + 1, rec)], table, c), s4, 1)
        t5 = chain_time(lambda s, c=c: msm._msm_multi_table_impl(
            [(s, rec), (s + 1, rec)], table, c), s4, 5)
        net = (t5 - t1) / 4
        out[f"pair_c{c}"] = net * 1e3
        print(f"c={c:2d} (nt={nt} T={T}): pair msm {net * 1e3:7.2f} ms/iter",
              flush=True)
    with open(os.path.join(os.path.dirname(__file__), "c_sweep.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
