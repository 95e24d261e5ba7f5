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


def measure_collective(devices, emit):
    """Measure the sharded-MSM combine phase in isolation on the available
    mesh: one all_gather of each device's (3, NLZ) Pippenger partial plus
    the lg(D)-deep point-add fold.  NOTE: on the virtual CPU mesh this is a
    *software proxy* for the real combine — a 2-host combine crosses a host
    boundary (DCN), which this cannot see; treat the value as the in-process
    floor until measured on a real multi-chip mesh.  Its value feeds the
    measured-inputs scaling table."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_bulletproof_tpu.parallel import sharded
    from mpc_bulletproof_tpu.ops import limb

    out = {}
    for ndev in devices:
        if ndev > len(jax.devices()):
            continue
        mesh = sharded.make_mesh(ndev)
        rng = np.random.default_rng(9)
        pts = jnp.asarray(
            rng.integers(0, 1 << 13, (3, limb.NLZ, ndev), dtype=np.int32)
        )

        # jit once outside the rep loop: sharded_point_sum builds a fresh
        # shard_map closure per call, and re-tracing inside the timing loop
        # would bill Python dispatch to the collective.
        run = jax.jit(lambda p: sharded.sharded_point_sum(p, mesh))

        run(pts).block_until_ready()  # compile
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            r = run(pts)
        r.block_until_ready()
        dt = (time.time() - t0) / reps
        out[ndev] = dt
        emit(f"  combine devices={ndev}: {dt*1e6:8.1f} us")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    # Force the CPU mesh BEFORE anything initializes the backend — the
    # axon TPU plugin overrides JAX_PLATFORMS, and a first jax.devices()
    # call would lock in a single-device backend.
    os.environ.setdefault("BP_FORCE_BACKEND", "host")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
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

    lines = []

    def emit(msg):
        print(msg, flush=True)
        lines.append(msg)

    results = {}
    t1 = None
    for ndev in args.devices:
        if ndev > len(jax.devices()):
            emit(f"devices={ndev}: skipped (only {len(jax.devices())} available)")
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
        emit(f"devices={ndev}: {dt*1e3:9.1f} ms  speedup={t1/dt:5.2f}x  efficiency={eff:5.1f}%")

    # Analytic efficiency model for real chips (virtual CPU devices share
    # the same cores, so the wall-clock table above only validates the
    # sharding, not the scaling).  Per-device point-add count for the
    # sort-scan Pippenger: windows * (2 n/d + 2 * 2^(c-1)) plus a
    # log2(d)-deep tree of single additions after one all-gathered point
    # per device (communication is 3*21*4 bytes/device, negligible).
    from mpc_bulletproof_tpu.ops import msm as msm_mod

    emit("")
    emit("Analytic model (real chips; per-device adds, comm = 1 point/device):")
    for n_model in (1 << 16, 1 << 20):
        base_adds = None
        for ndev in args.devices:
            per = max(1, n_model // ndev)
            c = msm_mod.select_window(per)
            w = -(-252 // c)
            adds = w * (2 * per + (1 << c)) + (ndev - 1).bit_length()
            if base_adds is None:
                base_adds = adds
            eff = base_adds / (adds * ndev) * 100
            emit(
                f"  n=2^{n_model.bit_length()-1} devices={ndev}: c={c} "
                f"{adds/1e6:7.2f}M adds/dev  model-efficiency={eff:5.1f}%"
            )

    # Combine-phase cost, measured on the available mesh.
    emit("")
    emit("Combine phase (all_gather of (3,NLZ) partials + lg D fold), measured:")
    combine = measure_collective(args.devices, emit)

    # Measured-inputs scaling table: per-device Pippenger partial times at
    # the D-way shard sizes of a 2^20 MSM, measured ON THE REAL CHIP by
    # benches/kernel_profile.py (msm20_shard_d*), combined with the
    # measured combine cost above.  This replaces arithmetic with
    # measurement everywhere a single chip can measure it; only the
    # assumption "D chips run their identical partials concurrently"
    # remains unmeasured (it is the definition of SPMD on a real mesh).
    import json

    prof_path = os.path.join(os.path.dirname(__file__), "kernel_profile.json")
    try:
        with open(prof_path) as fh:
            prof = json.load(fh)
    except (OSError, json.JSONDecodeError):
        prof = {}
    t1_chip = prof.get("msm20_shard_d1", {}).get("ms")
    if t1_chip:
        emit("")
        emit("Measured inputs (v5e chip, benches/kernel_profile.py msm20_shard_d*):")
        for ndev in args.devices:
            ent = prof.get(f"msm20_shard_d{ndev}", {})
            if not ent.get("ms"):
                continue
            if ndev not in combine:
                # A zero default would optimistically bias the projection;
                # skip the row rather than print an unmeasured combine as
                # measured (advisor r3, medium).
                emit(
                    f"  n=2^20 devices={ndev}: shard={ent['ms']:8.1f} ms "
                    f"(chip-measured) + combine UNMEASURED -> row skipped"
                )
                continue
            comb_ms = combine[ndev] * 1e3
            t_dev = ent["ms"] + comb_ms
            eff = t1_chip / (t_dev * ndev) * 100
            emit(
                f"  n=2^20 devices={ndev}: shard={ent['ms']:8.1f} ms (chip-measured)"
                f" + combine={comb_ms:6.2f} ms (virtual-mesh proxy) -> "
                f"projected efficiency={eff:5.1f}%"
            )

    out_path = os.path.join(os.path.dirname(__file__), "scaling_results.md")
    with open(out_path, "w") as fh:
        fh.write(
            "# Sharded MSM scaling (benches/scaling_bench.py)\n\n"
            "Three tables, in decreasing order of measurement content:\n\n"
            "1. **Virtual-mesh wall clock** — validates only that the sharded\n"
            "   path compiles and runs; the virtual devices time-share the\n"
            "   same host cores, so D-device wall clock CANNOT go below the\n"
            "   1-device time (the ~0.78x 'slowdown' rows are the expected\n"
            "   signature of core-sharing plus collective overhead, not a\n"
            "   property of the algorithm).\n"
            "2. **Measured-inputs projection** — per-device Pippenger shard\n"
            "   times measured on the real v5e chip at exactly the sizes a\n"
            "   D-device mesh assigns (kernel_profile.json msm20_shard_d*),\n"
            "   plus the combine phase measured on the mesh.  The only\n"
            "   remaining assumption is concurrent execution of the\n"
            "   identical per-device programs.\n"
            "3. **Analytic work model** — retained for sizes without chip\n"
            "   measurements.\n\n```\n"
            + "\n".join(lines)
            + "\n```\n"
        )
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
