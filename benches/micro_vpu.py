#!/usr/bin/env python
"""VPU primitive microbenchmarks: what does one int32 multiply actually cost?

The point-add kernel spends its cycles in limb convolutions (441 int32
multiplies per modular multiply).  Whether to re-emit the convolution in
f32 (split 13-bit limbs into 7/6-bit halves, 3-4 partial convolutions,
all exact) hinges on the relative VPU cost of int32 vs f32 multiplies —
Mosaic may lower int32 multiply to a multi-op sequence on v5e.

Method: one pallas kernel per op; the body repeats the op REPS times on a
(8, 256) f32/int32 block with a data dependence so nothing folds; grid
walks STEPS blocks.  Throughput = REPS * STEPS * 2048 ops / time.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 256
STEPS = 2048
REPS_LO, REPS_HI = 512, 4096  # throughput from the delta (cancels ~55 ms
                              # tunnel-readback + dispatch fixed cost)


def make_kernel(op, dtype, reps):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        # xor/add a varying constant between ops so no reassociation /
        # strength reduction can collapse the chain
        if dtype == jnp.int32:
            for i in range(reps):
                acc = op(acc, x) ^ i
        else:
            for i in range(reps):
                acc = op(acc, x) + float(i & 3)
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((STEPS, SUB, LANE), dtype),
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    return run


OPS = {
    "baseline_xor": (lambda a, b: a, jnp.int32),  # chain = xor only
    "i32_mul": (lambda a, b: a * b, jnp.int32),
    "i32_add": (lambda a, b: a + b, jnp.int32),
    "i32_mul_mask": (lambda a, b: (a * b) & 0x1FFF, jnp.int32),
    "i32_shift": (lambda a, b: (a >> 13) + b, jnp.int32),
    "f32_mul": (lambda a, b: a * b, jnp.float32),
    "f32_add": (lambda a, b: a + b, jnp.float32),
    "f32_fma": (lambda a, b: a * b + b, jnp.float32),
    # the f32-conv candidate primitive: int32 -> f32 convert
    "i32_to_f32": (lambda a, b: (a.astype(jnp.float32) + b.astype(jnp.float32)).astype(jnp.int32), jnp.int32),
    "f32_floor": (lambda a, b: jnp.floor(a * 0.5) + b, jnp.float32),
}


def main():
    names = sys.argv[1:] or list(OPS)
    key = jax.random.PRNGKey(0)
    for name in names:
        op, dtype = OPS[name]
        if dtype == jnp.int32:
            x = jax.random.randint(key, (STEPS, SUB, LANE), 1, 8191, jnp.int32)
        else:
            x = jax.random.uniform(key, (STEPS, SUB, LANE), dtype, 0.5, 1.5)
        def sync(v):
            jax.block_until_ready(v)
            import numpy as np
            np.asarray(v[0, 0, :1])  # force a real device->host readback

        times = {}
        for reps in (REPS_LO, REPS_HI):
            run = make_kernel(op, dtype, reps)
            sync(run(x))  # compile
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                sync(run(x))
                best = min(best, time.time() - t0)
            times[reps] = best
        net = times[REPS_HI] - times[REPS_LO]
        tot = (REPS_HI - REPS_LO) * STEPS * SUB * LANE
        print(f"{name:14s} net {net*1e3:8.2f} ms  {tot/net/1e9:8.2f} Gchain-iter/s",
              flush=True)


if __name__ == "__main__":
    main()
