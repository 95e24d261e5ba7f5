#!/usr/bin/env python
"""Multi-device MSM scaling benchmark (BASELINE.md: >= 80% efficiency at 2
hosts).  Measures sharded_msm on 1..K devices of the available mesh; on this
environment that is the virtual CPU mesh (set JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count), on a pod slice it is real chips.

    python benches/scaling_bench.py [--n 4096] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < max(args.devices):
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", max(args.devices))
        except Exception:
            pass

    import random

    import jax.numpy as jnp

    from mpc_bulletproof_tpu import Scalar, StarkPoint
    from mpc_bulletproof_tpu.ops import curve_jax as cj
    from mpc_bulletproof_tpu.parallel import sharded

    rng = random.Random(5)
    n = args.n
    g = StarkPoint.generator()
    base = [g.scalar_mul(Scalar(i + 2)) for i in range(128)]
    pts = jnp.asarray(cj.points_from_host((base * ((n // 128) + 1))[:n]))
    scl = jnp.asarray(
        cj.scalars_from_host([Scalar(rng.getrandbits(260)) for _ in range(n)])
    )

    results = {}
    t1 = None
    for ndev in args.devices:
        if ndev > len(jax.devices()):
            print(f"devices={ndev}: skipped (only {len(jax.devices())} available)")
            continue
        mesh = sharded.make_mesh(ndev)
        out = sharded.sharded_msm(scl, pts, mesh)
        out.block_until_ready()  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = sharded.sharded_msm(scl, pts, mesh)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        results[ndev] = dt
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * ndev) * 100
        print(f"devices={ndev}: {dt*1e3:9.1f} ms  speedup={t1/dt:5.2f}x  efficiency={eff:5.1f}%")


if __name__ == "__main__":
    main()
