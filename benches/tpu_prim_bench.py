#!/usr/bin/env python
"""On-chip microbench of the reorder primitives the MSM can build on:
argsort, 1-D gather, 1-D scatter, cumsum, one-hot histogram matmul,
chunked equality run-counts.  Decides the sortless-rank design."""
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

DISPATCH_S = 0.05
LN = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LN
B = 2049
CH = 256


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def timeit(name, f, *args, reps=3):
    t0 = time.time()
    sync(f(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(f(*args))
        ts.append(time.time() - t0)
    net = max(min(ts) - DISPATCH_S, 0.0)
    print(f"{name:28s}: {net * 1e3:9.2f} ms (compile {comp:.0f}s)", flush=True)


rng = np.random.default_rng(2)
keys = jnp.asarray(rng.integers(0, B, (N,), dtype=np.int32))
vals = jnp.asarray(rng.integers(0, 1 << 13, (N,), dtype=np.int32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))

iota = jnp.arange(N, dtype=jnp.int32)

timeit("argsort n", jax.jit(lambda k: jnp.argsort(k)[:1]), keys)
timeit("take 1d n", jax.jit(lambda v, p: jnp.take(v, p)[:1]), vals, perm)
timeit("scatter-set 1d n",
       jax.jit(lambda p: jnp.zeros(N, jnp.int32).at[p].set(iota)[:1]), perm)
timeit("cumsum n", jax.jit(lambda v: jnp.cumsum(v)[-1:]), vals)


@jax.jit
def hist_onehot(k):
    kc = k.reshape(-1, CH)

    def body(acc, row):
        oh = (row[:, None] == jnp.arange(B, dtype=row.dtype)[None, :])
        return acc + jnp.sum(oh.astype(jnp.int32), axis=0), None

    out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.int32), kc)
    return out[:1]


timeit("histogram one-hot scan", hist_onehot, keys)


@jax.jit
def run_counts(k):
    kc = k.reshape(-1, CH)
    tril = (jnp.arange(CH)[:, None] > jnp.arange(CH)[None, :])

    def body(_, row):
        eq = (row[:, None] == row[None, :]) & tril
        return None, jnp.sum(eq.astype(jnp.int32), axis=1)

    _, runs = jax.lax.scan(body, None, kc)
    return runs.reshape(-1)[:1]


timeit("chunk equality run-counts", run_counts, keys)

# gather of 63 point rows by a permutation (the post-rank reorder)
rows = jnp.asarray(rng.integers(0, 1 << 13, (63, N), dtype=np.int32))
timeit("take 63-row by perm",
       jax.jit(lambda r, p: jnp.take(r, p, axis=1)[:, :1]), rows, perm)
