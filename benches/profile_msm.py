#!/usr/bin/env python
"""Phase dissection of the proof-scale (batched/MXU) MSM at IPP width.

Times cumulative prefixes of the pair-MSM pipeline and reports deltas:
  digits -> rank+permute -> bucket scans -> boundary gather -> reduce -> horner
Each prefix is timed with the run-twice-minus-once chain to cancel the
~52 ms tunnel dispatch+readback fixed cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops import kernels, msm
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

rng = np.random.default_rng(7)
n = int(os.environ.get("PROF_MSM_N", "4097"))
c = msm.select_window(n + 1)
B = (1 << (c - 1)) + 1
print(f"n={n} c={c} B={B}", flush=True)


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def timed(label, make_fn, *args):
    """make_fn(reps) -> jitted fn chaining the phase `reps` times."""
    f1, f2 = make_fn(1), make_fn(2)
    sync(f1(*args)); sync(f2(*args))
    d = {}
    for tag, f in ((1, f1), (2, f2)):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            sync(f(*args))
            best = min(best, time.time() - t0)
        d[tag] = best
    print(f"{label:32s} {(d[2]-d[1])*1e3:9.2f} ms", flush=True)
    return d[2] - d[1]


sA = jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
sB = jnp.asarray(rng.integers(0, 1 << 13, (NL, n), dtype=np.int32))
pA = jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))
pB = jnp.asarray(rng.integers(0, 1 << 13, (3, NLZ, n), dtype=np.int32))


def prefix(stage):
    """Build the pair-MSM pipeline up to `stage`, returning a reps-chainable fn."""
    def make(reps):
        @jax.jit
        def f(sA, pA, sB, pB):
            acc = None
            for r in range(reps):
                sa = (sA + r) & 0x1FFF
                dA = msm._signed_digits(sa, c)
                dB = msm._signed_digits(sB, c)
                nw = dA.shape[0]
                digits = jnp.concatenate([dA, dB], axis=0)
                out = jnp.sum(digits)
                if stage >= 1:
                    keys = jnp.abs(digits)
                    negs = (digits < 0).astype(jnp.int32)
                    rowsA = pA.reshape(3 * NLZ, n)
                    rowsB = pB.reshape(3 * NLZ, n)
                    which = jnp.arange(2 * nw, dtype=jnp.int32) < nw

                    def reorder_one(_, inputs):
                        k_w, neg_w, isA = inputs
                        rank, counts = msm._rank_by_digit(k_w, B)
                        src = jnp.where(isA, rowsA, rowsB)
                        rows = jnp.concatenate([src, neg_w[None]], axis=0)
                        o = msm._permute_columns(rows, rank)
                        return None, (o, counts)

                    _, (sorted_rows, counts) = jax.lax.scan(
                        reorder_one, None, (keys, negs, which)
                    )
                    out = jnp.sum(sorted_rows) + jnp.sum(counts)
                if stage >= 2:
                    pts4 = jnp.moveaxis(
                        sorted_rows[:, : 3 * NLZ], 0, -2
                    ).reshape(3, NLZ, 2 * nw, n)
                    neg4 = sorted_rows[:, 3 * NLZ]
                    pts4 = cj._point_select(
                        neg4 != 0, msm._point_op_flat(kernels.point_neg, pts4), pts4
                    )
                    ends = jnp.cumsum(counts, axis=-1)
                    pos = ends[:, : B - 1] - 1
                    if stage == 2:
                        # scans only: replicate _windowed_bucket_sums' scan part
                        W = 2 * nw
                        nt, T = msm._chunk_shape(W, n)
                        n2 = nt * T
                        p4 = pts4
                        if n2 != n:
                            p4 = jnp.concatenate(
                                [p4, jnp.broadcast_to(cj.identity((1, 1)), (3, NLZ, W, n2 - n))],
                                axis=-1,
                            )
                        x5 = p4.reshape(3, NLZ, W, nt, T)
                        x = jnp.transpose(x5, (0, 4, 1, 2, 3)).reshape(3, T, NLZ, W * nt)
                        prefix_ = kernels.point_scan_steps(x)
                        out = jnp.sum(prefix_[..., :8])
                    else:
                        ws = msm._windowed_bucket_sums(pts4, pos, B)
                        if stage == 3:
                            out = jnp.sum(ws)
                        else:
                            pair = jnp.stack([ws[:nw], ws[nw:]], axis=-1)
                            res = msm._horner_windows_multi(pair, c)
                            out = jnp.sum(res)
                acc = out if acc is None else acc + out
            return acc
        return f
    return make


t_dig = timed("digits only", prefix(0), sA, pA, sB, pB)
t_perm = timed("+ rank & permute", prefix(1), sA, pA, sB, pB)
t_scan = timed("+ bucket scans (scan only)", prefix(2), sA, pA, sB, pB)
t_wbs = timed("+ full bucket sums", prefix(3), sA, pA, sB, pB)
t_full = timed("+ horner (full pair MSM)", prefix(4), sA, pA, sB, pB)

print("---- deltas ----")
print(f"digits          : {t_dig*1e3:8.2f} ms")
print(f"rank+permute    : {(t_perm-t_dig)*1e3:8.2f} ms")
print(f"scan            : {(t_scan-t_perm)*1e3:8.2f} ms")
print(f"boundary+reduce : {(t_wbs-t_scan)*1e3:8.2f} ms")
print(f"horner          : {(t_full-t_wbs)*1e3:8.2f} ms")
