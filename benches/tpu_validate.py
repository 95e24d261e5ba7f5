#!/usr/bin/env python
"""On-device validation + measurement of the TPU kernels.

Run on real TPU hardware (single process — do not share the chip):

    python benches/tpu_validate.py [--sizes 64 1024 4096] [--check-up-to 4096]

Validates point addition and the Pippenger MSM against the host golden
arithmetic, then reports warm timings.  Timing note: ``block_until_ready``
may return before remote execution completes on tunneled backends; the
reported times force a 1-element transfer to bound completion.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 1024, 4096, 16384])
    ap.add_argument("--check-up-to", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    from mpc_bulletproof_tpu import Scalar, StarkPoint
    from mpc_bulletproof_tpu.ops import curve_jax as cj
    from mpc_bulletproof_tpu.ops import kernels, msm

    rng = random.Random(5)
    g = StarkPoint.generator()

    # point addition (complete formulas incl. identity/doubling)
    a = [g.scalar_mul(Scalar(rng.getrandbits(251))) for _ in range(6)]
    a += [StarkPoint.identity(), a[0]]
    b = [g.scalar_mul(Scalar(rng.getrandbits(251))) for _ in range(6)]
    b += [g, a[0]]
    t0 = time.time()
    out = kernels.point_add(cj.points_from_host(a), cj.points_from_host(b))
    ok = cj.points_to_host(out) == [x + y for x, y in zip(a, b)]
    print(f"point_add: compile+check {time.time()-t0:.1f}s correct={ok}", flush=True)

    base = [g.scalar_mul(Scalar(rng.getrandbits(251))) for _ in range(256)]
    for n in args.sizes:
        pts_h = (base * ((n // 256) + 1))[:n]
        scl_h = [Scalar(rng.getrandbits(251)) for _ in range(n)]
        pts = jnp.asarray(cj.points_from_host(pts_h))
        scl = jnp.asarray(cj.scalars_from_host(scl_h))

        t0 = time.time()
        r = msm.msm_device(scl, pts)
        r.block_until_ready()
        compile_s = time.time() - t0

        t0 = time.time()
        for _ in range(args.reps):
            r = msm.msm_device(scl, pts)
        _ = np.asarray(r[0, 0:1])  # force completion
        dt = (time.time() - t0) / args.reps
        line = f"msm n={n}: compile {compile_s:.1f}s warm {dt*1e3:.1f}ms -> {n/dt/1e6:.3f} Mpoints/s"
        if n <= args.check_up_to:
            exp = StarkPoint.msm(scl_h, pts_h)
            got = cj.points_to_host(np.asarray(r)[..., None])[0]
            line += f" correct={got == exp}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
