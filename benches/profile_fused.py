#!/usr/bin/env python
"""Phase-level profile of the fused device prover at the north-star config.

Times, separately: host-side prep (blinding draw + limb conversion), the
jitted program execution (warm, synced), and the host-side readback/
proof assembly.  Run on the live chip.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, PedersenGens, Scalar
from mpc_bulletproof_tpu.models.range_proof import fused_device

n_bits = int(os.environ.get("PROF_N", "64"))
m = int(os.environ.get("PROF_M", "64"))

pc = PedersenGens()
bp = BulletproofGens(n_bits, m)
rng = random.Random(1234)
values = [rng.randrange(0, 1 << n_bits) for _ in range(m)]
blindings = [Scalar(rng.getrandbits(260)) for _ in range(m)]

t = HashChainTranscript(b"prof-warmup")
t0 = time.time()
proof, comms = fused_device.prove_multiple_device(bp, pc, t, values, blindings, n_bits)
print(f"cold total: {time.time()-t0:.2f}s", flush=True)

# warm end-to-end
for trial in range(3):
    t = HashChainTranscript(b"prof")
    t0 = time.time()
    fused_device.prove_multiple_device(bp, pc, t, values, blindings, n_bits)
    print(f"warm total: {(time.time()-t0)*1e3:.1f} ms", flush=True)

# ---- instrumented phases -------------------------------------------------
import secrets

import jax
import jax.numpy as jnp

from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import limb

nm = n_bits * m
rng_bytes = secrets.token_bytes

t0 = time.time()
rand = lambda: Scalar(int.from_bytes(rng_bytes(48), "big"))
a_blind, s_blind, sL_all, sR_all = [], [], [], []
for _ in range(m):
    a_blind.append(rand())
    s_blind.append(rand())
    sL_all.extend(rand() for _ in range(n_bits))
    sR_all.extend(rand() for _ in range(n_bits))
t1b = [rand() for _ in range(m)]
t2b = [rand() for _ in range(m)]
t_draw = time.time() - t0

t0 = time.time()
bits_np = np.zeros(nm, dtype=np.int32)
for j, v in enumerate(values):
    for i in range(n_bits):
        bits_np[j * n_bits + i] = (int(v) >> i) & 1
sum_s = lambda xs: Scalar(sum(int(x) for x in xs))
args_np = dict(
    bits=jnp.asarray(bits_np),
    v=jnp.asarray(cj.scalars_from_host([Scalar(int(v)) for v in values])),
    gamma=jnp.asarray(cj.scalars_from_host(blindings)),
    asum=jnp.asarray(cj.scalars_from_host([sum_s(a_blind)])),
    rsum=jnp.asarray(cj.scalars_from_host([sum_s(s_blind)])),
    sL=jnp.asarray(cj.scalars_from_host(sL_all)),
    sR=jnp.asarray(cj.scalars_from_host(sR_all)),
    t1b=jnp.asarray(cj.scalars_from_host([sum_s(t1b)])),
    t2b=jnp.asarray(cj.scalars_from_host([sum_s(t2b)])),
)
t_conv = time.time() - t0

G_dev, H_dev = fused_device._device_gens(bp, n_bits, m)
B_dev, Bb_dev, fb_table = fused_device._device_pc(pc)
t0 = time.time()
split_table = fused_device._device_split_table(bp, pc, n_bits, m)
jax.block_until_ready(split_table)
print(f"split-table build (cached per gens): {time.time()-t0:.2f}s", flush=True)
fn = fused_device._program(n_bits, m)

tr = HashChainTranscript(b"prof2")
from mpc_bulletproof_tpu.models.range_proof.dealer import Dealer
Dealer.new(bp, pc, tr, n_bits, m)
state32 = jnp.asarray(np.frombuffer(tr.state, np.uint8).astype(np.uint32))

call = lambda: fn(
    state32, args_np["bits"], args_np["v"], args_np["gamma"], args_np["asum"],
    args_np["rsum"], args_np["sL"], args_np["sR"], args_np["t1b"], args_np["t2b"],
    G_dev, H_dev, B_dev, Bb_dev, fb_table, split_table,
)
out = call()
jax.block_until_ready(out)
np.asarray(out[:1])  # true sync

times = []
for _ in range(3):
    t0 = time.time()
    out = call()
    jax.block_until_ready(out)
    np.asarray(out[:1])
    times.append(time.time() - t0)
t_exec = min(times)

t0 = time.time()
host_vals = np.asarray(out)  # single packed buffer: one fetch
t_read = time.time() - t0

print(f"phase draw-blinding : {t_draw*1e3:8.1f} ms", flush=True)
print(f"phase limb-convert  : {t_conv*1e3:8.1f} ms", flush=True)
print(f"phase exec (synced) : {t_exec*1e3:8.1f} ms", flush=True)
print(f"phase readback      : {t_read*1e3:8.1f} ms", flush=True)
print(f"per-value exec      : {t_exec/m*1e3:8.2f} ms", flush=True)
