#!/usr/bin/env python
"""VPU multiply-throughput microbench: int32 vs f32 (vs int16-ish patterns).

Decides whether the limb layer's convolution should move from int32
multiplies (possibly emulated on the VPU) to f32 FMAs (native).  Each
kernel runs REPS chained multiply-adds over an (8, 512) VMEM tile inside a
fori_loop; data dependencies prevent folding.

Usage: python benches/tpu_mul_bench.py [reps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
SHAPE = (8, 512)


def make_kernel(dtype, op):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[...]
        y = y_ref[...]

        def body(i, acc):
            return op(acc, y)

        o_ref[...] = jax.lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(x, y)

    return run


def timeit(name, fn, x, y, n_ops):
    fn(x, y).block_until_ready()  # compile
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn(x, y)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    lanes = SHAPE[0] * SHAPE[1]
    total = lanes * REPS * n_ops
    print(f"{name:34s} {dt*1e6:9.1f} us  {total/dt/1e9:8.2f} Gop/s", flush=True)


def main():
    print(f"backend={jax.default_backend()} reps={REPS} tile={SHAPE}", flush=True)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(1, 1 << 12, SHAPE, dtype=np.int32))
    yi = jnp.asarray(rng.integers(1, 1 << 12, SHAPE, dtype=np.int32))
    xf = xi.astype(jnp.float32)
    yf = yi.astype(jnp.float32)

    timeit("int32 mul        (acc*y)", make_kernel(jnp.int32, lambda a, y: a * y), xi, yi, 1)
    timeit("int32 mul-add    (acc*y+y)", make_kernel(jnp.int32, lambda a, y: a * y + y), xi, yi, 2)
    timeit("int32 add        (acc+y)", make_kernel(jnp.int32, lambda a, y: a + y), xi, yi, 1)
    timeit("int32 shift+mask (sweep step)", make_kernel(
        jnp.int32, lambda a, y: (a & 0x1FFF) + (a >> 13) + y), xi, yi, 3)
    timeit("f32 mul          (acc*y)", make_kernel(jnp.float32, lambda a, y: a * y), xf, yf, 1)
    timeit("f32 fma          (acc*y+y)", make_kernel(jnp.float32, lambda a, y: a * y + y), xf, yf, 2)
    timeit("f32 add          (acc+y)", make_kernel(jnp.float32, lambda a, y: a + y), xf, yf, 1)
    # f32 carry step: r = x - floor(x * inv) * base  (3 ops)
    inv = jnp.full(SHAPE, 1.0 / 512.0, jnp.float32)
    timeit("f32 carry (floor-div-mulsub)", make_kernel(
        jnp.float32, lambda a, y: a - jnp.floor(a * (1.0 / 512.0)) * 512.0 + y), xf, yf, 4)


if __name__ == "__main__":
    main()
