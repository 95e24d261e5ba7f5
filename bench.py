#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): 64-bit aggregated rangeproof proving at the
north-star config m = 64, vs the 7,300 us AVX2 dalek baseline on
Skylake-X.  Both execution paths are measured end-to-end and reported
side by side on stderr:

* host — the AVX-512 IFMA native core (BP_FORCE_BACKEND=host);
* device — the fused single-program TPU prover (one XLA dispatch for the
  whole aggregated proof, on-device keccak transcript), run in a
  subprocess with a timeout so a wedged tunnel or cold Mosaic compile
  cannot sink the benchmark.

The headline is the better of the two: both are real end-to-end
measurements of the identical proof computation (byte-identical output),
and the default dispatch picks the faster path on the measured hardware.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Persistent compile cache: Mosaic kernels and fused-prover programs are
# expensive to compile (minutes through the axon remote-compile tunnel);
# cache them across processes and rounds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def tpu_transfers_healthy(timeout_s: float = 60.0) -> bool:
    """The axon tunnel can wedge on device->host transfers; probe it in a
    throwaway subprocess so a hang cannot block the benchmark."""
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = (jnp.arange(8, dtype=jnp.int32) * 3).block_until_ready();"
        "print(int(np.asarray(x)[4]))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        return out.stdout.strip().endswith("12")
    except subprocess.TimeoutExpired:
        return False


_DEVICE_BENCH_CODE = """
import os, sys, time, random
sys.path.insert(0, {repo!r})
import numpy as np
from mpc_bulletproof_tpu import BulletproofGens, HashChainTranscript, PedersenGens, Scalar
from mpc_bulletproof_tpu.models.range_proof import RangeProof
from mpc_bulletproof_tpu.models.range_proof.fused_device import prove_multiple_device

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", {repo!r} + "/.jax_cache")
n_bits, m, reps = {n_bits}, {m}, {reps}
pc = PedersenGens()
bp = BulletproofGens(n_bits, m)
rng = random.Random(1234)
values = [rng.randrange(0, 1 << n_bits) for _ in range(m)]
blindings = [Scalar(rng.getrandbits(260)) for _ in range(m)]

t = HashChainTranscript(b"bench-warmup")
proof, comms = prove_multiple_device(bp, pc, t, values, blindings, n_bits)
tv = HashChainTranscript(b"bench-warmup")
proof.verify_multiple(bp, pc, tv, comms, n_bits)
print("warmup+verify ok", flush=True)

times = []
for _ in range(reps):
    t = HashChainTranscript(b"bench")
    t0 = time.time()
    prove_multiple_device(bp, pc, t, values, blindings, n_bits)
    times.append(time.time() - t0)
print("DEVICE_PROVE_US %.1f" % (min(times) / m * 1e6), flush=True)
"""


def measure_device_prove(n_bits: int, m: int, reps: int, timeout_s: int = 900):
    """Fused device end-to-end prove, in a subprocess (compile + tunnel guard)."""
    code = _DEVICE_BENCH_CODE.format(
        repo=os.path.dirname(os.path.abspath(__file__)), n_bits=n_bits, m=m, reps=reps
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s, text=True
        )
    except subprocess.TimeoutExpired:
        log("device prove: timed out (tunnel or compile)")
        return None
    for line in out.stdout.splitlines():
        if line.startswith("DEVICE_PROVE_US"):
            return float(line.split()[1])
    tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
    log("device prove: failed: " + " | ".join(tail))
    return None


def detect_backend(timeout_s: float = 90.0) -> str | None:
    """jax.default_backend() in a throwaway subprocess: when the axon tunnel
    is wedged, backend DISCOVERY itself hangs — never import jax in the
    bench driver process."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
        lines = [l.strip() for l in out.stdout.splitlines() if l.strip()]
        return lines[-1] if lines else None
    except subprocess.TimeoutExpired:
        return None


def main():
    n_bits = int(os.environ.get("BENCH_N_BITS", "64"))
    m = int(os.environ.get("BENCH_M", "64"))  # north-star config (BASELINE.md)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    baseline_us = 7300.0  # dalek AVX2 Skylake-X, single 64-bit proof

    backend = detect_backend()
    transfers_ok = backend == "tpu" and tpu_transfers_healthy()
    if backend != "cpu" and not transfers_ok:
        log("WARNING: TPU backend absent/wedged; host path only")

    # ---- host path (native core) --------------------------------------
    os.environ["BP_FORCE_BACKEND"] = "host"

    from mpc_bulletproof_tpu import (
        BulletproofGens,
        HashChainTranscript,
        PedersenGens,
        Scalar,
    )
    from mpc_bulletproof_tpu.models.range_proof import RangeProof

    log(f"backend={backend} n={n_bits} m={m}")

    pc_gens = PedersenGens()
    t0 = time.time()
    bp_gens = BulletproofGens(n_bits, m)
    log(f"generator setup: {time.time() - t0:.2f}s")

    import random

    rng = random.Random(1234)
    values = [rng.randrange(0, 1 << n_bits) for _ in range(m)]
    blindings = [Scalar(rng.getrandbits(260)) for _ in range(m)]

    t = HashChainTranscript(b"bench-warmup")
    proof, comms = RangeProof.prove_multiple(bp_gens, pc_gens, t, values, blindings, n_bits)
    tv = HashChainTranscript(b"bench-warmup")
    proof.verify_multiple(bp_gens, pc_gens, tv, comms, n_bits)
    log("host warmup round trip ok")

    # This VM throttles sustained all-core AVX-512 load (credit-based:
    # measured 4.1 ms/value right after an hour of 100% CPU vs 2.8 ms
    # after 4 idle minutes).  Rest briefly so the measurement reflects the
    # engine, not the preceding workload.
    cooldown = float(os.environ.get("BENCH_COOLDOWN_S", "120"))
    if cooldown > 0:
        log(f"cooldown {cooldown:.0f}s (CPU-credit recovery)")
        time.sleep(cooldown)

    prove_times = []
    for _ in range(reps):
        t = HashChainTranscript(b"bench")
        t0 = time.time()
        proof, comms = RangeProof.prove_multiple(
            bp_gens, pc_gens, t, values, blindings, n_bits
        )
        prove_times.append(time.time() - t0)
    host_prove_us = min(prove_times) / m * 1e6

    verify_times = []
    for _ in range(reps):
        tv = HashChainTranscript(b"bench")
        t0 = time.time()
        proof.verify_multiple(bp_gens, pc_gens, tv, comms, n_bits)
        verify_times.append(time.time() - t0)
    per_verify_us = min(verify_times) / m * 1e6

    log(f"host  prove: {host_prove_us:.0f} us/proof (m={m})")
    log(f"host  verify: {per_verify_us:.0f} us/proof")

    # ---- device path (fused single-program prover) --------------------
    device_prove_us = None
    if transfers_ok and os.environ.get("BENCH_SKIP_DEVICE") != "1":
        device_prove_us = measure_device_prove(n_bits, m, reps)
        if device_prove_us is not None:
            log(f"device prove: {device_prove_us:.0f} us/proof (m={m}, fused)")

    # ---- auxiliary: MSM points/sec (BASELINE.md: per chip at 2^20) -----
    try:
        msm_n = int(os.environ.get("BENCH_MSM_N", "16384"))
        from mpc_bulletproof_tpu import StarkPoint as SP

        base_pts = [SP.generator().scalar_mul(Scalar(i + 2)) for i in range(256)]
        pts = (base_pts * ((msm_n // 256) + 1))[:msm_n]
        scl = [Scalar(rng.getrandbits(260)) for _ in range(msm_n)]
        SP.msm(scl, pts)  # warm
        t0 = time.time()
        SP.msm(scl, pts)
        dt = time.time() - t0
        log(f"host  msm n={msm_n}: {dt*1e3:.1f} ms -> {msm_n/dt/1e6:.3f} Mpoints/s")
    except Exception as exc:  # noqa: BLE001 - auxiliary only
        log(f"host msm aux benchmark skipped: {exc}")

    if transfers_ok and os.environ.get("BENCH_SKIP_DEVICE") != "1":
        # n = 2^20: the BASELINE.md "MSM points/sec/chip" metric config.
        dev_msm_n = int(os.environ.get("BENCH_DEV_MSM_N", "1048576"))
        code = (
            "import os, sys, time; sys.path.insert(0, %r)\n"
            "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', sys.path[0] + '/.jax_cache')\n"
            "import numpy as np, jax, jax.numpy as jnp\n"
            "from mpc_bulletproof_tpu.ops import msm, kernels\n"
            "from mpc_bulletproof_tpu.ops.limb import NL, NLZ\n"
            "n = %d\n"
            "rng = np.random.default_rng(3)\n"
            "scl = jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))\n"
            "pts = jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))\n"
            "c = msm.select_window(n)\n"
            "def chain(r):\n"
            "    @jax.jit\n"
            "    def f(s, p):\n"
            "        acc = None\n"
            "        for i in range(r):\n"
            "            o = msm._msm_device_impl((s + i) & 0x1FFF, p, c)\n"
            "            acc = o if acc is None else kernels.point_add(acc[..., None], o[..., None])[..., 0]\n"
            "        return acc\n"
            "    return f\n"
            "def sync(x):\n"
            "    jax.block_until_ready(x); np.asarray(x).reshape(-1)[:1]\n"
            "ts = {}\n"
            "for r in (1, 2):\n"
            "    f = chain(r); sync(f(scl, pts))\n"
            "    t0 = time.time(); sync(f(scl, pts)); ts[r] = time.time() - t0\n"
            "net = ts[2] - ts[1]\n"
            "print('DEVICE_MSM n=%%d: %%.0f ms net -> %%.3f Mpoints/s' %% (n, net*1e3, n/net/1e6), flush=True)\n"
        ) % (os.path.dirname(os.path.abspath(__file__)), dev_msm_n)
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, timeout=900, text=True
            )
            for line in out.stdout.splitlines():
                if "DEVICE_MSM" in line:
                    log("device msm " + line.split("DEVICE_MSM ")[-1])
        except subprocess.TimeoutExpired:
            log("device msm benchmark timed out (tunnel or compile)")

    # ---- headline ------------------------------------------------------
    best_us = host_prove_us
    path = "host"
    if device_prove_us is not None and device_prove_us < host_prove_us:
        best_us = device_prove_us
        path = "device"
    log(f"headline path: {path}")
    print(
        json.dumps(
            {
                "metric": f"{n_bits}-bit rangeproof prove us/proof (aggregated m={m}, {path} path)",
                "value": round(best_us, 1),
                "unit": "us",
                "vs_baseline": round(baseline_us / best_us, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
