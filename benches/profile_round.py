#!/usr/bin/env python
"""Round-5 decomposition: where do the ~20.5 ms/round of the fused IPP go?

Times each piece of the fused round body as a chained in-program loop
(net/iter, dispatch-free, CSE defeated by feeding one output element back
into the next input).  Point-add timing is data-independent (complete
formulas), so random tensors stand in for real values.

North-star shape: nm=4096 (m=64 aggregated 64-bit range proof), split-table
path, first round: pair MSM over 4*(nm+1) = 16388 lanes, c=11.
"""
import json
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

jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mpc_bulletproof_tpu.ops import kernels, limb, msm
from mpc_bulletproof_tpu.ops import transcript_jax as tj
from mpc_bulletproof_tpu.ops import curve_jax as cj
from mpc_bulletproof_tpu.ops.limb import NL, NLZ

rng = np.random.default_rng(7)
nm = 4096
LANES = msm.SPLIT_CHUNKS * (nm + 1)  # 16388
N_TABLE = 2 * nm + 1
C = msm.select_window(LANES, msm.SPLIT_CHUNK_BITS)
B = (1 << (C - 1)) + 1
NW = -(-msm.SPLIT_CHUNK_BITS // C)
W = 2 * NW  # pair MSM window count

print(f"shape: lanes={LANES} c={C} B={B} windows/msm={NW} pair W={W}", flush=True)


def sync(x):
    jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf).reshape(-1)[:1]
        break


def chain(name, fn, x, K=5, results={}):
    """fn: x_perturbed -> array; times K dependent iterations."""

    def loop(k):
        @jax.jit
        def f(x):
            def body(c, _):
                out = fn(x + (c & 1))
                return out.reshape(-1)[0].astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=k)
            return c
        return f

    f1, fK = loop(1), loop(K)
    sync(f1(x)); sync(fK(x))
    b1 = bK = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); sync(f1(x)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(fK(x)); bK = min(bK, time.perf_counter() - t0)
    net = (bK - b1) / (K - 1)
    results[name] = net * 1e3
    print(f"{name:40s} {net * 1e3:8.2f} ms/iter", flush=True)
    return results


def rnd(shape, hi=1 << 13):
    return jnp.asarray(rng.integers(0, hi, shape, dtype=np.int32))


def main():
    res = {}
    s4 = rnd((NL, LANES))
    table = rnd((msm.SPLIT_CHUNKS * N_TABLE, 16))
    rec = jnp.asarray(
        msm.split_record_indices(
            rng.integers(0, N_TABLE, (nm + 1,), dtype=np.int32).astype(np.int32), N_TABLE
        )
    )

    # --- full pair MSM (both L and R share one program) ---
    chain("pair_msm_table", lambda s: msm._msm_multi_table_impl(
        [(s, rec), (s + 1, rec)], table, C), s4, results=res)

    # --- digits + sort + record map ---
    def digits_sort(s):
        dA = msm._signed_digits(s, C, msm.SPLIT_CHUNK_BITS)
        dB = msm._signed_digits(s + 1, C, msm.SPLIT_CHUNK_BITS)
        digits = jnp.concatenate([dA, dB], axis=0)
        keys = jnp.abs(digits)
        sh = max(1, (LANES - 1).bit_length())
        iota = jnp.broadcast_to(jnp.arange(LANES, dtype=jnp.int32)[None], digits.shape)
        payload = iota | ((digits < 0).astype(jnp.int32) << sh)
        d_sorted, pay = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
        return d_sorted + pay

    chain("digits_sort", digits_sort, s4, results=res)

    # --- record fetch (gather) at sorted width ---
    order = rnd((W, LANES), hi=msm.SPLIT_CHUNKS * N_TABLE)
    chain("record_fetch", lambda o: msm._rows_affine_fetch(table, o % (msm.SPLIT_CHUNKS * N_TABLE)), order, results=res)

    # --- the full windowed bucket phase (scan + glue + reduce) ---
    pts4 = rnd((3, NLZ, W, LANES))
    posW = jnp.asarray(
        np.sort(rng.integers(0, LANES, (W, B - 1)).astype(np.int32), axis=-1)
    )

    chain("windowed_bucket_sums", lambda p: msm._windowed_bucket_sums(
        p % (1 << 13), posW, B), pts4, results=res)

    # --- the grid scan alone at the same layout ---
    nt, T = msm._chunk_shape(W, LANES)
    print(f"scan layout: nt={nt} T={T} L={W * nt}", flush=True)
    xs = rnd((3, T, NLZ, W * nt))
    chain("grid_scan_alone", kernels.point_scan_steps, xs, results=res)

    # --- transpose glue alone ---
    def transpose_glue(p):
        n2 = nt * T
        pp = jnp.pad(p % (1 << 13), [(0, 0), (0, 0), (0, 0), (0, n2 - LANES)])
        x5 = pp.reshape(3, NLZ, W, nt, T)
        return jnp.transpose(x5, (0, 4, 1, 2, 3)).reshape(3, T, NLZ, W * nt)

    chain("transpose_glue", transpose_glue, pts4, results=res)

    # --- boundary gathers + s_vals + reduce tree (glue after scan) ---
    prefix = rnd((3, T, NLZ, W * nt))

    def post_scan(pfx):
        prefix5 = (pfx % (1 << 13)).reshape(3, T, NLZ, W, nt)
        ct = prefix5[:, -1]
        off_in = kernels.point_scan_steps(jnp.transpose(ct, (0, 3, 1, 2)))
        total = off_in[:, -1]
        offex = jnp.concatenate([cj.identity((W,))[:, None], off_in[:, :-1]], axis=1)
        posc = posW
        cpos = posc // T
        r = posc % T
        w_col = jnp.arange(W, dtype=posc.dtype)[:, None]
        within = prefix5[:, r, :, w_col, cpos]
        within = jnp.transpose(within, (2, 3, 0, 1))
        offsel = offex[:, cpos, :, w_col]
        offsel = jnp.transpose(offsel, (2, 3, 0, 1))
        cums = msm._point_op_flat(kernels.point_add, within, offsel)
        s_vals = msm._point_op_flat(
            kernels.point_add,
            jnp.broadcast_to(total[..., None], cums.shape),
            msm._point_op_flat(kernels.point_neg, cums),
        )
        return jnp.moveaxis(msm._reduce_batched(s_vals), -1, 0)

    chain("post_scan_glue", post_scan, prefix, results=res)

    # --- horner ---
    wins = rnd((NW, 3, NLZ, 2))
    chain("horner_pair", lambda w: msm._horner_windows_multi(w % (1 << 13), C), wins, results=res)

    # --- non-MSM round work: folds + scalar prep ---
    a_d = rnd((NL, nm))
    wG = rnd((NL, nm))
    u = rnd((NL, 1))

    def fold_prep(a):
        a = a % (1 << 13)
        nh = nm // 2
        a_L = a[:, :nh]
        a_R = a[:, nh:]
        c_L = limb._inner_product_mod(a_L, a_R, limb.FR)[:, None]
        r = jnp.arange(nm, dtype=jnp.int32) % nm
        hi = r >= nh
        cls = jnp.where(hi, r - nh, r)
        aL_of = jnp.take_along_axis(a_L, jnp.broadcast_to(jnp.where(hi, cls, 0)[None], (NL, nm)), axis=1)
        sL = limb._mod_mul(wG, aL_of, limb.FR)
        s4L = msm.split_scalars_device(jnp.concatenate([sL, c_L], axis=-1))
        a_next = limb._mod_add(
            limb._mod_mul(a_L, u, limb.FR), limb._mod_mul(a_R, u, limb.FR), limb.FR
        )
        return s4L + a_next[:, :1]

    chain("fold_and_scalar_prep", fold_prep, a_d, results=res)

    # --- transcript block: 2 point absorbs + challenge + u^-1 ladder ---
    state = rnd((32,), hi=256).astype(jnp.uint32)
    LR = rnd((3, NLZ, 2))

    def transcript_block(lr):
        x, y, iid = tj.lazy_points_to_affine(lr % (1 << 13))
        enc = tj.points_transcript_bytes(x, y, iid)
        st = tj.absorb(state, b"L", enc[:, 0], 64)
        st = tj.absorb(st, b"R", enc[:, 1], 64)
        st, u_ = tj.challenge_scalar(st, b"u")
        from mpc_bulletproof_tpu.constants import R as R_MOD
        u_inv = kernels.mod_pow_static(u_, R_MOD - 2, limb.FR)
        return u_inv

    chain("transcript_block", transcript_block, LR, results=res)

    with open(os.path.join(os.path.dirname(__file__), "round_profile.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("wrote round_profile.json", flush=True)


if __name__ == "__main__":
    main()
