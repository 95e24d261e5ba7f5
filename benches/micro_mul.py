"""Microbenchmark: per-op cost of candidate limb-multiply formulations.

Decides the round-3 multiply strategy (VERDICT item 1).  Candidates, all
computing work equivalent to the conv_full(21x21 limbs) inner loop over a
large batch:

* int32 VPU multiply (current lazy_mul path)
* f32 VPU multiply (native FMA rate)
* bf16 MXU matmul (throughput reference)

Run on the live chip: prints ops/s for each.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512 * 1024  # batch lanes
SUB, LANE = 8, 128
G = N // (SUB * LANE)
REP = 64  # multiplies per element per kernel pass


def sync(out):
    np.asarray(out.reshape(-1)[:1])


def timeit(f, *args):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / 5


def make_vpu_kernel(op, dtype):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = jnp.zeros_like(a)
        for i in range(REP):
            acc = acc + op(a + i if dtype == jnp.int32 else a, b)
        o_ref[...] = acc

    @jax.jit
    def run(a, b):
        spec = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G, SUB, LANE), dtype),
            grid=(G,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return run


def bench_vpu(name, op, dtype):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 13, (G, SUB, LANE)).astype(dtype))
    b = jnp.asarray(rng.integers(0, 1 << 13, (G, SUB, LANE)).astype(dtype))
    run = make_vpu_kernel(op, dtype)
    dt = timeit(run, a, b)
    ops = N * REP
    print(f"{name:28s} {dt*1e3:8.3f} ms  {ops/dt/1e9:8.2f} Gops/s")


def bench_mxu():
    # bf16 (B, K) @ (K, K) matmul, K=128: MXU MAC throughput
    K = 512
    B = 8192
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, K)), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, K)), dtype=jnp.bfloat16)

    @jax.jit
    def run(a, w):
        out = a
        for _ in range(16):
            out = jax.lax.dot_general(
                out, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return out

    dt = timeit(run, a, w)
    macs = B * K * K * 16
    print(f"{'bf16 MXU matmul':28s} {dt*1e3:8.3f} ms  {macs/dt/1e12:8.2f} TMAC/s")


def bench_int8_mxu():
    K = 512
    B = 8192
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-100, 100, (B, K)), dtype=jnp.int8)
    w = jnp.asarray(rng.integers(-100, 100, (K, K)), dtype=jnp.int8)

    @jax.jit
    def run(a, w):
        out = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        for _ in range(15):
            out = jax.lax.dot_general(
                out.astype(jnp.int8), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return out

    dt = timeit(run, a, w)
    macs = B * K * K * 16
    print(f"{'int8 MXU matmul':28s} {dt*1e3:8.3f} ms  {macs/dt/1e12:8.2f} TMAC/s")


if __name__ == "__main__":
    print(f"batch N={N}, {REP} ops/elem, device={jax.devices()[0]}")
    bench_vpu("int32 mul", lambda a, b: a * b, jnp.int32)
    bench_vpu("int32 add", lambda a, b: a + b, jnp.int32)
    bench_vpu("int32 shift+and", lambda a, b: (a >> 7) & 0x3F, jnp.int32)
    bench_vpu("f32 mul", lambda a, b: a * b, jnp.float32)
    bench_vpu("f32 fma(a*b+a)", lambda a, b: a * b + a, jnp.float32)
    bench_vpu("int32 mul16(masked)", lambda a, b: (a & 0xFFFF) * (b & 0xFFFF), jnp.int32)
    # Candidates for the lazy path (SN limbs can be slightly negative, so a
    # 0xFFFF mask corrupts them; a sign-extending 16-bit pattern would not):
    bench_vpu("int32 mul16(sext)",
              lambda a, b: ((a << 16) >> 16) * ((b << 16) >> 16), jnp.int32)
    bench_vpu("int32 mul16(one-side)", lambda a, b: (a & 0xFFFF) * b, jnp.int32)
    bench_mxu()
    bench_int8_mxu()
