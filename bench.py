#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): 64-bit rangeproof proving vs the 7,300 us AVX2
dalek baseline on Skylake-X.  We report the per-proof proving time of an
aggregated m-proof batch (throughput amortized), plus auxiliary metrics
(verification, MSM points/sec) on stderr.

Run on TPU by default; falls back to host arithmetic when no TPU backend
is available (BP_FORCE_BACKEND=host|device overrides).
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def tpu_transfers_healthy(timeout_s: float = 30.0) -> bool:
    """The axon tunnel can wedge on device->host transfers; probe it in a
    throwaway subprocess so a hang cannot block the benchmark."""
    import subprocess

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


def main():
    n_bits = int(os.environ.get("BENCH_N_BITS", "64"))
    m = int(os.environ.get("BENCH_M", "16"))
    baseline_us = 7300.0  # dalek AVX2 Skylake-X, single 64-bit proof

    import jax

    backend = jax.default_backend()
    transfers_ok = backend == "tpu" and tpu_transfers_healthy()
    if backend == "tpu" and not transfers_ok:
        log("WARNING: TPU device->host transfers unhealthy; forcing host backend")
    # The headline metric runs on the host+native path unless explicitly
    # asked to use the device path end-to-end (BENCH_DEVICE=1); the device
    # kernels are measured separately below with a timeout guard so an
    # unwarmed Mosaic compile cannot sink the headline number.
    if os.environ.get("BENCH_DEVICE") == "1" and transfers_ok:
        os.environ["BP_FORCE_BACKEND"] = "device"
    else:
        os.environ["BP_FORCE_BACKEND"] = "host"

    from mpc_bulletproof_tpu import (
        BulletproofGens,
        HashChainTranscript,
        PedersenGens,
        Scalar,
    )
    from mpc_bulletproof_tpu.models.range_proof import RangeProof
    from mpc_bulletproof_tpu.ops import backend as bp_backend

    log(f"backend={backend} device_path={bp_backend.use_device()} n={n_bits} m={m}")

    pc_gens = PedersenGens()
    t0 = time.time()
    bp_gens = BulletproofGens(n_bits, m)
    log(f"generator setup: {time.time() - t0:.2f}s")

    import random

    rng = random.Random(1234)
    values = [rng.randrange(0, 1 << n_bits) for _ in range(m)]
    blindings = [Scalar(rng.getrandbits(260)) for _ in range(m)]

    # Warmup (compiles kernels on the device path).
    t = HashChainTranscript(b"bench-warmup")
    proof, comms = RangeProof.prove_multiple(bp_gens, pc_gens, t, values, blindings, n_bits)
    tv = HashChainTranscript(b"bench-warmup")
    proof.verify_multiple(bp_gens, pc_gens, tv, comms, n_bits)
    log("warmup round trip ok")

    # Timed proving runs.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    prove_times = []
    for i in range(reps):
        t = HashChainTranscript(b"bench")
        t0 = time.time()
        proof, comms = RangeProof.prove_multiple(
            bp_gens, pc_gens, t, values, blindings, n_bits
        )
        prove_times.append(time.time() - t0)
    best_prove_s = min(prove_times)
    per_proof_us = best_prove_s / m * 1e6

    verify_times = []
    for i in range(reps):
        tv = HashChainTranscript(b"bench")
        t0 = time.time()
        proof.verify_multiple(bp_gens, pc_gens, tv, comms, n_bits)
        verify_times.append(time.time() - t0)
    per_verify_us = min(verify_times) / m * 1e6

    log(f"prove: {best_prove_s*1e3:.1f} ms total, {per_proof_us:.0f} us/proof (m={m})")
    log(f"verify: {per_verify_us:.0f} us/proof")

    # Auxiliary metric: MSM points/sec (BASELINE.md: points/sec/chip at 2^20).
    try:
        msm_n = int(os.environ.get("BENCH_MSM_N", "16384"))
        from mpc_bulletproof_tpu import StarkPoint as SP

        base_pts = [SP.generator().scalar_mul(Scalar(i + 2)) for i in range(256)]
        pts = (base_pts * ((msm_n // 256) + 1))[:msm_n]
        scl = [Scalar(rng.getrandbits(260)) for _ in range(msm_n)]
        if bp_backend.use_device():
            from mpc_bulletproof_tpu.ops import msm as msm_mod

            msm_fn = lambda: msm_mod.msm_host_points(scl, pts)
        else:
            msm_fn = lambda: SP.msm(scl, pts)
        msm_fn()  # warm
        t0 = time.time()
        msm_fn()
        dt = time.time() - t0
        log(f"msm n={msm_n}: {dt*1e3:.1f} ms -> {msm_n/dt/1e6:.3f} Mpoints/s")
    except Exception as exc:  # noqa: BLE001 - auxiliary only
        log(f"msm aux benchmark skipped: {exc}")

    # Device MSM measurement (subprocess + timeout: first Mosaic compile can
    # be slow and the tunnel can wedge; neither may block the benchmark).
    if transfers_ok:
        import subprocess

        code = (
            "import time, random, jax\n"
            "from mpc_bulletproof_tpu import Scalar, StarkPoint\n"
            "from mpc_bulletproof_tpu.ops import msm, curve_jax as cj\n"
            "import jax.numpy as jnp\n"
            "rng = random.Random(3)\n"
            "n = 4096\n"
            "g = StarkPoint.generator()\n"
            "base = [g.scalar_mul(Scalar(i + 2)) for i in range(128)]\n"
            "pts = jnp.asarray(cj.points_from_host((base * (n // 128))[:n]))\n"
            "scl = jnp.asarray(cj.scalars_from_host([Scalar(rng.getrandbits(260)) for _ in range(n)]))\n"
            "import numpy as np\n"
            "r = msm.msm_device(scl, pts); _ = np.asarray(r[0, 0:1])\n"
            "t0 = time.time()\n"
            "for _ in range(5): r = msm.msm_device(scl, pts)\n"
            "_ = np.asarray(r[0, 0:1])  # tunnel: block_until_ready can return early\n"
            "dt = (time.time() - t0) / 5\n"
            "print('device msm n=%d: %.1f ms -> %.3f Mpoints/s' % (n, dt*1e3, n/dt/1e6))\n"
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, timeout=600, text=True,
            )
            for line in (out.stdout + out.stderr).splitlines():
                if "device msm" in line:
                    log(line)
        except subprocess.TimeoutExpired:
            log("device msm benchmark timed out (tunnel or compile)")

    print(
        json.dumps(
            {
                "metric": f"{n_bits}-bit rangeproof prove us/proof (aggregated m={m})",
                "value": round(per_proof_us, 1),
                "unit": "us",
                "vs_baseline": round(baseline_us / per_proof_us, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
