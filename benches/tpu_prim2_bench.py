#!/usr/bin/env python
"""Batched/2-D variants of the reorder primitives (1-D ops hit a ~9 ms
layout floor on this backend; confirm 2-D shapes dodge it)."""
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
NW = 21
B = 2049


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
    print(f"{name:34s}: {net * 1e3:9.2f} ms (compile {comp:.0f}s)", flush=True)


rng = np.random.default_rng(2)
keys = jnp.asarray(rng.integers(0, B, (NW, N), dtype=np.int32))
perm = jnp.asarray(
    np.stack([rng.permutation(N) for _ in range(NW)]).astype(np.int32)
)
vals2 = jnp.asarray(rng.integers(0, 1 << 13, (NW, N), dtype=np.int32))

timeit("argsort (nw, n) axis=-1",
       jax.jit(lambda k: jnp.argsort(k, axis=-1)[:, :1]), keys)
timeit("take_along_axis (nw, n)",
       jax.jit(lambda v, p: jnp.take_along_axis(v, p, axis=-1)[:, :1]),
       vals2, perm)
timeit("cumsum (nw, n) axis=-1",
       jax.jit(lambda v: jnp.cumsum(v, axis=-1)[:, -1:]), vals2)
timeit("cumsum 2d-reshaped one row",
       jax.jit(lambda v: jnp.cumsum(v[0].reshape(-1, 512), axis=0)[-1, :1]),
       vals2)

# batched 63-row gather: (63, n) rows selected by ONE window's permutation
rows = jnp.asarray(rng.integers(0, 1 << 13, (63, N), dtype=np.int32))
timeit("rows[:, perm0] (63, n)",
       jax.jit(lambda r, p: jnp.take(r, p[0], axis=1)[:, :1]), rows, perm)

# scatter in 2d batch
iota2 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (NW, N))
timeit("scatter-set (nw, n) along -1",
       jax.jit(lambda p: jnp.zeros((NW, N), jnp.int32).at[
           jnp.arange(NW)[:, None], p].set(iota2)[:, :1]), perm)
