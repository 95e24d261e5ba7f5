"""On-chip profile of the device compute path (round-3 evidence).

Measures, on the real TPU:
* point_add kernel throughput (adds/s) at the granule layout
* point_scan_steps throughput at MSM lane widths
* MSM end-to-end at 2^16 / 2^20 (+ phase splits at 2^20)
* micro: conv/redc-only kernels to locate the multiply cost

Writes benches/kernel_profile.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import kernels, msm
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

RESULTS = {}


def sync(out):
    """Force completion: fetch one dependent element to the host (the axon
    tunnel's block_until_ready returns before execution finishes)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timeit(f, *args, reps=3):
    sync(f(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rand_pts(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))


def rand_scl(n, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))


def bench_point_add():
    for n in (1 << 16, 1 << 19):
        a, b = rand_pts(n, 0), rand_pts(n, 1)

        import functools

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(a, b, r):
            out = a
            for _ in range(r):
                out = kernels.point_add(out, b)
            return out

        # Subtracting two chain timings cancels dispatch overhead, but at
        # small n the difference can drown in tunnel-latency noise (a
        # negative "net" shipped in round 3's first profile).  Use a wide
        # rep gap, more samples, and refuse to publish a non-positive net.
        R_LO, R_HI = 2, 18  # chain depths; net = (t_hi - t_lo) / (R_HI - R_LO)
        t_lo = timeit(lambda x, y: chain(x, y, R_LO), a, b, reps=5)
        t_hi = timeit(lambda x, y: chain(x, y, R_HI), a, b, reps=5)
        net = (t_hi - t_lo) / (R_HI - R_LO)
        entry = {f"chain{R_LO}_ms": t_lo * 1e3, f"chain{R_HI}_ms": t_hi * 1e3}
        if net > 0:
            entry.update({"ms": net * 1e3, "Madds_per_s": n / net / 1e6})
            print(f"point_add n={n}: {net*1e3:.2f} ms -> {n/net/1e6:.1f} M adds/s")
        else:
            entry.update({"ms": None, "Madds_per_s": None,
                          "note": "net <= 0: dispatch noise exceeded kernel time"})
            print(f"point_add n={n}: below dispatch-noise floor "
                  f"(t_lo={t_lo*1e3:.2f}ms t_hi={t_hi*1e3:.2f}ms)")
        RESULTS[f"point_add_n{n}"] = entry


def bench_scan():
    # MSM-shaped scan: L lanes, T steps (as _windowed_bucket_sums lays out)
    for L, T in ((5376, 256), (4096, 2048)):
        x = rand_pts(L * T).reshape(3, NLZ, T, L).transpose(0, 2, 1, 3)
        f = jax.jit(kernels.point_scan_steps)
        dt = timeit(f, x)
        n = L * T
        RESULTS[f"scan_L{L}_T{T}"] = {"ms": dt * 1e3, "Madds_per_s": n / dt / 1e6}
        print(f"scan L={L} T={T}: {dt*1e3:.1f} ms -> {n/dt/1e6:.1f} M adds/s")


def bench_msm():
    for lg in (13, 16, 20):
        n = 1 << lg
        s, p = rand_scl(n), rand_pts(n)
        c = msm.select_window(n)
        f = jax.jit(lambda s, p: msm._msm_device_impl(s, p, c, affine=False))
        dt = timeit(f, s, p, reps=2)
        RESULTS[f"msm_2e{lg}"] = {"ms": dt * 1e3, "Mpts_per_s": n / dt / 1e6}
        print(f"msm n=2^{lg} (c={c}): {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} Mpts/s")


def bench_msm_phases():
    """Split the 2^20 MSM: digits+sort / gather / scan+buckets / horner."""
    n = 1 << 20
    s, p = rand_scl(n), rand_pts(n)
    c = msm.select_window(n)

    @jax.jit
    def digits_sort(s):
        d = msm._signed_digits(s, c)
        keys = jnp.abs(d)
        sh = max(1, (n - 1).bit_length())
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], d.shape)
        payload = iota | ((d < 0).astype(jnp.int32) << sh)
        return jax.lax.sort((keys, payload), dimension=-1, num_keys=1)

    dt = timeit(digits_sort, s)
    RESULTS["msm20_digits_sort_ms"] = dt * 1e3
    print(f"msm 2^20 digits+sort: {dt*1e3:.1f} ms")

    ds, pay = digits_sort(s)
    sh = max(1, (n - 1).bit_length())
    order = pay & ((1 << sh) - 1)

    @jax.jit
    def gather(p, order):
        table = msm._rows_affine_table(p)
        return msm._rows_affine_fetch(table, order[:8])  # 8 windows worth

    dt = timeit(gather, p, order)
    nw = ds.shape[0]
    RESULTS["msm20_gather8_ms"] = dt * 1e3
    print(f"msm 2^20 gather (8 windows): {dt*1e3:.1f} ms (x{nw/8:.0f} for all)")


def bench_msm_shard_inputs():
    """Measured inputs for the multi-chip scaling model (BASELINE.md >= 80%
    at 2 hosts): the per-device Pippenger partial time at the shard sizes a
    D-device mesh assigns for a 2^20-lane MSM (n/D lanes each), with the
    window ``sharded_msm`` would pick for that shard.  Real-chip scaling is
    t(2^20) / (D * [t(2^20/D) + combine]); the combine (one all_gather of a
    (3, NLZ) partial + lg D point adds) is measured separately on the
    virtual mesh (benches/scaling_bench.py --collective)."""
    n_total = 1 << 20
    for d in (1, 2, 4, 8):
        n = n_total // d
        s, p = rand_scl(n), rand_pts(n)
        c = msm.select_window(n)
        f = jax.jit(lambda s, p: msm._msm_device_impl(s, p, c, affine=False))
        dt = timeit(f, s, p, reps=2)
        RESULTS[f"msm20_shard_d{d}"] = {
            "n": n, "c": c, "ms": dt * 1e3, "Mpts_per_s": n / dt / 1e6}
        print(f"msm 2^20 shard d={d} (n=2^{n.bit_length()-1}, c={c}): "
              f"{dt*1e3:.1f} ms")


def bench_fused_prove():
    from mpc_bulletproof_tpu import (BulletproofGens, HashChainTranscript,
                                     PedersenGens, Scalar)
    from mpc_bulletproof_tpu.models.range_proof.fused_device import (
        prove_multiple_device)
    import random

    n_bits, m = 64, 64
    pc = PedersenGens()
    bp = BulletproofGens(n_bits, m)
    rng = random.Random(1234)
    values = [rng.randrange(0, 1 << n_bits) for _ in range(m)]
    blinds = [Scalar(rng.getrandbits(260)) for _ in range(m)]
    t = HashChainTranscript(b"profile")
    t0 = time.perf_counter()
    prove_multiple_device(bp, pc, t, values, blinds, n_bits)
    warm = time.perf_counter() - t0
    best = 1e30
    for _ in range(3):
        t = HashChainTranscript(b"profile")
        t0 = time.perf_counter()
        prove_multiple_device(bp, pc, t, values, blinds, n_bits)
        best = min(best, time.perf_counter() - t0)
    RESULTS["fused_prove_m64"] = {
        "warm_s": warm, "best_ms": best * 1e3, "us_per_value": best / m * 1e6}
    print(f"fused prove m=64: {best*1e3:.1f} ms ({best/m*1e6:.0f} us/value)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["add", "scan", "msm", "phases", "shard", "fused"]
    print(f"device={jax.devices()[0]}")
    if "add" in which:
        bench_point_add()
    if "scan" in which:
        bench_scan()
    if "msm" in which:
        bench_msm()
    if "phases" in which:
        bench_msm_phases()
    if "shard" in which:
        bench_msm_shard_inputs()
    if "fused" in which:
        bench_fused_prove()
    out = os.path.join(os.path.dirname(__file__), "kernel_profile.json")
    try:
        with open(out) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        prev = {}
    prev.update(RESULTS)
    with open(out, "w") as f:
        json.dump(prev, f, indent=1)
    print("wrote", out)
