"""Fully-fused on-device aggregated range-proof prover.

The entire party/dealer protocol of :mod:`.party` / :mod:`.dealer` —
value/bit commitments, both challenge rounds, the t-polynomial, the proof
shares, and the complete inner-product argument — compiled into ONE XLA
program with the hash chain on device (:mod:`...ops.transcript_jax`).
Dispatch latency is paid once per aggregated proof; nothing crosses the
host boundary until the finished proof is read back.

Byte-for-byte equivalent to the host path given the same blinding stream:
the transcript absorb order mirrors dealer.py exactly
(V_0..V_{m-1}, A, S | y, z | T_1, T_2 | x | t_x, t_x_blinding,
e_blinding | w | IPP rounds), and the aggregated values satisfy the same
algebra as the summed per-party shares (sums over party slices equal
global vector operations on the concatenated vectors).  Pinned by
tests/test_fused_range_proof.py.

Protocol reference: docs/range-proof-protocol.md (via the reference's
docs/), dealer.py / party.py for the concrete message and transcript
order.
"""

from __future__ import annotations

import numpy as np

from ...constants import P, R
from ...generators import BulletproofGens, PedersenGens
from ...ops.curve import StarkPoint
from ...ops.field import Scalar
from ...transcript import HashChainTranscript
from ..inner_product import InnerProductProof, fused_ipp_body

_PROGRAM_CACHE: dict = {}

# Device generator arrays per (BulletproofGens, n, m) / PedersenGens —
# rebuilding them was ~1/3 of every fused prove (8k points through
# points_from_host).  Keyed by id() with a strong ref held alongside so a
# recycled id can never alias a different gens object (gens objects are
# few and long-lived; the cache is process-bounded).
_GENS_CACHE: dict = {}


def _gens_entry(obj) -> dict:
    ref, per = _GENS_CACHE.setdefault(id(obj), (obj, {}))
    assert ref is obj
    return per


def _device_gens(bp_gens: BulletproofGens, n: int, m: int):
    per = _gens_entry(bp_gens)
    key = (n, m)
    if key not in per:
        import jax.numpy as jnp

        from ...ops import curve_jax as cj

        G = [g for j in range(m) for g in bp_gens.share(j).G(n)]
        H = [h for j in range(m) for h in bp_gens.share(j).H(n)]
        per[key] = (
            jnp.asarray(cj.points_from_host(G)),
            jnp.asarray(cj.points_from_host(H)),
        )
    return per[key]


def _device_split_table(bp_gens: BulletproofGens, pc_gens: PedersenGens, n: int, m: int):
    """Packed affine split-table records of ``[G(nm) | H(nm) | B]`` —
    ``(4*(2nm+1), 16)`` int32 (ops/msm.build_split_affine_table).  Built on
    device once per (gens, n, m): 192 sequential doublings + one batched
    Fermat inversion; cached like the generator arrays."""
    per = _gens_entry(bp_gens)
    key = ("split", n, m, id(pc_gens))
    if key not in per:
        import jax
        import jax.numpy as jnp

        from ...ops import curve_jax as cj
        from ...ops import msm as msm_mod

        G = [g for j in range(m) for g in bp_gens.share(j).G(n)]
        H = [h for j in range(m) for h in bp_gens.share(j).H(n)]
        pts = jnp.asarray(cj.points_from_host(G + H + [pc_gens.B]))
        per[key] = jax.jit(msm_mod.build_split_affine_table)(pts)
    return per[key]


def _device_pc(pc_gens: PedersenGens):
    per = _gens_entry(pc_gens)
    if "pc" not in per:
        import jax.numpy as jnp

        from ...ops import curve_jax as cj
        from ...ops import msm as msm_mod

        B_dev = jnp.asarray(cj.points_from_host([pc_gens.B]))
        Bb_dev = jnp.asarray(cj.points_from_host([pc_gens.B_blinding]))
        # fixed-base window tables [B-rows | B~-rows] (ops/msm.py)
        fb = jnp.concatenate(
            [msm_mod.fixed_base_table(B_dev), msm_mod.fixed_base_table(Bb_dev)],
            axis=0,
        )
        per["pc"] = (B_dev, Bb_dev, fb)
    return per["pc"]


def _program(n: int, m: int, mesh=None, axis: str = "dp"):
    """Build (and cache) the jitted fused prover for (bitsize n, parties m).

    With ``mesh`` the SAME protocol program compiles as one SPMD
    ``shard_map`` over the mesh: the S commitment MSM, the A bit-sum, the
    t-polynomial inner products, and every IPP round's L/R pair MSM shard
    over the lane axis (per-device partials + one collective each); the
    O(nm) elementwise vector work and the keccak hash chain replicate on
    all devices — zero communication, transcripts in lockstep.  This is
    the designed v5e-8 path for the BASELINE.md north-star config
    (aggregated m=64 proving: the 8,192-lane commitment phase and the
    4,096-lane IPP shard 8 ways).
    """
    key = (n, m, mesh, axis)
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ...ops import curve_jax as cj
    from ...ops import kernels
    from ...ops import limb
    from ...ops import msm as msm_mod
    from ...ops import transcript_jax as tj
    from ...parallel import sharded as sh

    NL = limb.NL
    nm = n * m
    ndev = mesh.devices.size if mesh is not None else 1
    ipp_run = fused_ipp_body(
        nm, shard=(axis, ndev) if mesh is not None else None, table_gens=True
    )
    # S commitment MSM: 64-bit chunks against the cached split table
    # (lane -> record map is static: [G | H] blocks, base B unused here).
    lanes_S = msm_mod.SPLIT_CHUNKS * 2 * nm
    rec_S = np.asarray(
        msm_mod.split_record_indices(
            np.arange(2 * nm, dtype=np.int32), 2 * nm + 1
        )
    )

    if mesh is None:
        c_S = msm_mod.select_window(lanes_S, msm_mod.SPLIT_CHUNK_BITS)

        def s_msm(s4, rec, table):
            return msm_mod._msm_multi_table_impl([(s4, rec)], table, c_S)[..., 0]

        def big_point_sum(pts):
            return msm_mod._reduce_sum(pts)

        def big_inner(a, b):
            return limb._inner_product_mod(a, b, limb.FR)[:, None]
    else:
        ck_S = -(-lanes_S // ndev)
        c_S = msm_mod.select_window(ck_S, msm_mod.SPLIT_CHUNK_BITS)

        def s_msm(s4, rec, table):
            import jax as _jax

            pad = ck_S * ndev - lanes_S
            if pad:
                s4 = jnp.pad(s4, [(0, 0), (0, pad)])
                rec = jnp.pad(rec, [(0, pad)])
            d = _jax.lax.axis_index(axis)
            sl = _jax.lax.dynamic_slice_in_dim(s4, d * ck_S, ck_S, axis=-1)
            rl = _jax.lax.dynamic_slice_in_dim(rec, d * ck_S, ck_S, axis=-1)
            part = msm_mod._msm_multi_table_impl([(sl, rl)], table, c_S)[..., 0]
            gathered = _jax.lax.all_gather(part, axis)  # (ndev, 3, NLZ)
            return msm_mod._reduce_sum_tree(jnp.moveaxis(gathered, 0, -1))[..., 0]

        def big_point_sum(pts):
            return sh.insh_point_sum(pts, ndev, axis)

        def big_inner(a, b):
            return sh.insh_inner_product(a, b, ndev, axis)
    # 2^i powers, tiled per party: static constant (NL, nm)
    exp2 = np.concatenate(
        [limb.ints_to_limbs([1 << i for i in range(n)])] * m, axis=-1
    )

    def absorb_points(state, labels, pts):
        """Affine-convert a (3, NLZ, k) batch and absorb with per-point labels."""
        x, y, iid = tj.lazy_points_to_affine(pts)
        enc = tj.points_transcript_bytes(x, y, iid)
        for i, lbl in enumerate(labels):
            state = tj.absorb(state, lbl, enc[:, i], 64)
        return state, (x, y, iid)

    def absorb_scalar(state, lbl, s_col):
        """Absorb a canonical (NL, 1) scalar as 32 LE bytes."""
        return tj.absorb(state, lbl, tj.felt_bytes_le(s_col)[:, 0], 32)

    FB_STRIDE = msm_mod.FB_WINDOWS * msm_mod.FB_TABLE  # B~ rows offset

    def run(state32, bits, v_limbs, gamma, alpha_sum, rho_sum, sL, sR,
            t1b_sum, t2b_sum, G_pts, H_pts, B_pt, Bb_pt, fb_table, split_table):
        FR = limb.FR
        bits_b = bits != 0

        # ---- bit commitments -------------------------------------------
        # V_j = v_j B + gamma_j B~ ; blind terms alpha B~, rho B~ ride the
        # same batched fixed-base table evaluation (ops/msm.py fixed_commit:
        # 8-bit window gathers + one tree, replacing a 252-step Shamir scan).
        zeros = jnp.zeros((NL, 1), jnp.int32)
        sc_l = jnp.concatenate([v_limbs, alpha_sum, rho_sum], axis=-1)  # (NL, m+2)
        sc_r = jnp.concatenate([gamma, zeros, zeros], axis=-1)
        off_l = jnp.asarray([0] * m + [FB_STRIDE, FB_STRIDE], dtype=jnp.int32)
        off_r = jnp.full((m + 2,), FB_STRIDE, dtype=jnp.int32)
        scan1 = msm_mod.fixed_commit(fb_table, off_l, sc_l, off_r, sc_r)
        V_pts = scan1[..., :m]
        A_blind = scan1[..., m : m + 1]
        S_blind = scan1[..., m + 1 : m + 2]

        # A = <a_L, G> + <a_R, H> + alpha_sum B~  (a_L bits, a_R = a_L - 1:
        # set bits select G_i, clear bits select -H_i — no scalar muls)
        selG = cj._point_select(bits_b, G_pts, cj.identity((nm,)))
        selH = cj._point_select(bits_b, cj.identity((nm,)), cj._point_neg(H_pts))
        A_pt = cj._point_add(
            big_point_sum(jnp.concatenate([selG, selH], axis=-1)),
            A_blind,
        )

        # S = <s_L, G> + <s_R, H> + rho_sum B~  (64-bit chunks against the
        # cached split table — serial combine ~72 vs ~280 grid steps)
        s4_S = msm_mod.split_scalars_device(jnp.concatenate([sL, sR], axis=-1))
        S_msm = s_msm(s4_S, jnp.asarray(rec_S), split_table)
        S_pt = cj._point_add(S_msm[..., None], S_blind)

        state32, (Vx, Vy, Vid) = absorb_points(state32, [b"V"] * m, V_pts)
        state32, (ASx, ASy, ASid) = absorb_points(
            state32, [b"A", b"S"], jnp.concatenate([A_pt, S_pt], axis=-1)
        )

        state32, y_ch = tj.challenge_scalar(state32, b"y")
        state32, z_ch = tj.challenge_scalar(state32, b"z")

        # ---- l/r polynomial coefficients over the nm lanes --------------
        y_pows = limb._powers(y_ch[:, 0], nm, FR)                  # y^(jn+i)
        z_pows_m = limb._powers(z_ch[:, 0], m, FR)                 # z^j
        zz = limb._mod_mul(z_ch, z_ch, FR)                         # (NL, 1)
        zz_zj = limb._mod_mul(jnp.repeat(z_pows_m, n, axis=-1), zz, FR)
        exp2_d = jnp.asarray(exp2)

        one = limb.from_const(1, (1,))
        l0 = limb._mod_sub(bits_limbs(bits), jnp.broadcast_to(z_ch, (NL, nm)), FR)
        l1 = sL
        zm1b = limb._mod_add(
            limb._mod_sub(z_ch, one, FR), bits_limbs(bits), FR
        )  # z - 1 + bit = a_R + z
        r0 = limb._mod_add(
            limb._mod_mul(y_pows, zm1b, FR),
            limb._mod_mul(zz_zj, exp2_d, FR),
            FR,
        )
        r1 = limb._mod_mul(y_pows, sR, FR)

        # t-polynomial (aggregated over parties = global inner products)
        t0 = big_inner(l0, r0)
        t2 = big_inner(l1, r1)
        t_sum = big_inner(
            limb._mod_add(l0, l1, FR), limb._mod_add(r0, r1, FR)
        )
        t1 = limb._mod_sub(limb._mod_sub(t_sum, t0, FR), t2, FR)

        # T_1 = t1 B + t1b_sum B~ ; T_2 likewise — one 2-lane table eval
        tb_l = jnp.concatenate([t1, t2], axis=-1)
        tb_r = jnp.concatenate([t1b_sum, t2b_sum], axis=-1)
        off0 = jnp.zeros((2,), jnp.int32)
        offb = jnp.full((2,), FB_STRIDE, dtype=jnp.int32)
        T_pts = msm_mod.fixed_commit(fb_table, off0, tb_l, offb, tb_r)
        state32, (Tx, Ty, Tid) = absorb_points(state32, [b"T_1", b"T_2"], T_pts)
        state32, x_ch = tj.challenge_scalar(state32, b"x")

        # ---- proof shares (aggregated) ----------------------------------
        t_x = limb._mod_add(
            t0, limb._mod_mul(x_ch, limb._mod_add(t1, limb._mod_mul(x_ch, t2, FR), FR), FR), FR
        )
        zgamma = limb._inner_product_mod(z_pows_m, gamma, FR)[:, None]
        t_x_blinding = limb._mod_add(
            limb._mod_mul(zz, zgamma, FR),
            limb._mod_mul(
                x_ch, limb._mod_add(t1b_sum, limb._mod_mul(x_ch, t2b_sum, FR), FR), FR
            ),
            FR,
        )
        e_blinding = limb._mod_add(alpha_sum, limb._mod_mul(x_ch, rho_sum, FR), FR)

        state32 = absorb_scalar(state32, b"t_x", t_x)
        state32 = absorb_scalar(state32, b"t_x_blinding", t_x_blinding)
        state32 = absorb_scalar(state32, b"e_blinding", e_blinding)
        state32, w_ch = tj.challenge_scalar(state32, b"w")
        # Q = w B never materializes: the IPP's Q term rides base B in the
        # split table with scalar c * w (fused_ipp_body table_gens mode).

        # ---- the IPP over l(x), r(x) ------------------------------------
        l_vec = limb._mod_add(l0, limb._mod_mul(x_ch, l1, FR), FR)
        r_vec = limb._mod_add(r0, limb._mod_mul(x_ch, r1, FR), FR)
        y_inv = kernels.mod_pow_static(y_ch, R - 2, FR)
        wH = limb._powers(y_inv[:, 0], nm, FR)
        wG = jnp.broadcast_to(limb.from_const(1, (1,)), (NL, nm))

        # domain separator: innerproduct_domain_sep(nm)
        state32 = tj.absorb(
            state32, b"dom-sep",
            jnp.asarray(np.frombuffer(_pad32(b"ipp v1"), np.uint8).astype(np.uint32)),
            32,
        )
        state32 = tj.absorb(
            state32, b"n",
            jnp.asarray(np.frombuffer(int(nm).to_bytes(8, "little"), np.uint8).astype(np.uint32)),
            8,
        )

        state32, a_fin, b_fin, Lx, Ly, Lid = ipp_run(
            state32, l_vec, r_vec, wG, wH, split_table, w_ch
        )

        # ONE flat int32 output: readback is a single tunnel fetch instead
        # of ~16 (each ~25-40 ms of latency — ops/packio.py).
        from ...ops import packio

        return packio.pack_device([
            state32,
            Vx, Vy, Vid, ASx, ASy, ASid, Tx, Ty, Tid,
            t_x, t_x_blinding, e_blinding,
            a_fin, b_fin, Lx, Ly, Lid,
        ])

    def bits_limbs(b):
        """(nm,) 0/1 int32 -> (NL, nm) limb rows."""
        return jnp.concatenate(
            [b[None, :].astype(jnp.int32),
             jnp.zeros((NL - 1, nm), jnp.int32)], axis=0
        )

    if mesh is None:
        fn = jax.jit(run)
    else:
        from jax.sharding import PartitionSpec as P

        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # pragma: no cover - moved in newer JAX
            from jax.shard_map import shard_map

        # All operands replicated; the heavy reductions slice their own
        # lanes by axis_index and fold with collectives (see insh_* in
        # parallel/sharded.py).  A single P() is the pytree prefix for
        # every input/output leaf.
        fn = jax.jit(
            shard_map(
                run,
                mesh=mesh,
                in_specs=(P(),) * 16,
                out_specs=P(),
                check_rep=False,
            )
        )
    _PROGRAM_CACHE[key] = fn
    return fn


def _pad32(label: bytes) -> bytes:
    from ...ops.keccak import pad_label

    return pad_label(label)


def prove_multiple_device(
    bp_gens: BulletproofGens,
    pc_gens: PedersenGens,
    transcript: HashChainTranscript,
    values: list[int],
    blindings: list[Scalar],
    n: int,
    rng_bytes=None,
    mesh=None,
):
    """Fused device aggregated prove; same semantics as the host
    party/dealer path (RangeProof.prove_multiple) including transcript
    state.  ``rng_bytes`` mirrors party.py's injection point for
    deterministic tests.  ``mesh`` compiles the whole prover as one SPMD
    shard_map over the device mesh (see :func:`_program`)."""
    import secrets

    import jax.numpy as jnp

    from ...ops import curve_jax as cj
    from ...ops import limb
    from . import RangeProof

    m = len(values)
    nm = n * m
    if rng_bytes is None:
        # One bulk draw for the whole blinding stream (2m + 2nm + 2m draws
        # of 48 bytes): per-call token_bytes cost ~14 ms at m=64.  Injected
        # streams keep per-draw calls — tests replay party.py's exact order.
        buf = secrets.token_bytes(48 * (4 * m + 2 * nm))
        state = {"off": 0}

        def rng_bytes(k: int) -> bytes:
            o = state["off"]
            state["off"] = o + k
            return buf[o : o + k]

    # dealer entry (validates sizes + rangeproof_domain_sep)
    from .dealer import Dealer

    Dealer.new(bp_gens, pc_gens, transcript, n, m)

    rand = lambda: Scalar(int.from_bytes(rng_bytes(48), "big"))
    # Draw per-party blinding in the same order as party.py so the same
    # stream produces identical proofs on both paths.
    a_blind, s_blind, sL_all, sR_all = [], [], [], []
    for _ in range(m):
        a_blind.append(rand())
        s_blind.append(rand())
        sL_all.extend(rand() for _ in range(n))
        sR_all.extend(rand() for _ in range(n))
    t1b, t2b = [], []
    for _ in range(m):
        t1b.append(rand())
        t2b.append(rand())

    bits_np = np.zeros(nm, dtype=np.int32)
    for j, v in enumerate(values):
        for i in range(n):
            bits_np[j * n + i] = (int(v) >> i) & 1

    G_dev, H_dev = _device_gens(bp_gens, n, m)
    B_dev, Bb_dev, fb_table = _device_pc(pc_gens)
    split_table = _device_split_table(bp_gens, pc_gens, n, m)

    fn = _program(n, m, mesh=mesh)
    sum_s = lambda xs: Scalar(sum(int(x) for x in xs))
    state32 = jnp.asarray(np.frombuffer(transcript.state, np.uint8).astype(np.uint32))
    out = fn(
        state32,
        jnp.asarray(bits_np),
        jnp.asarray(cj.scalars_from_host([Scalar(int(v)) for v in values])),
        jnp.asarray(cj.scalars_from_host(blindings)),
        jnp.asarray(cj.scalars_from_host([sum_s(a_blind)])),
        jnp.asarray(cj.scalars_from_host([sum_s(s_blind)])),
        jnp.asarray(cj.scalars_from_host(sL_all)),
        jnp.asarray(cj.scalars_from_host(sR_all)),
        jnp.asarray(cj.scalars_from_host([sum_s(t1b)])),
        jnp.asarray(cj.scalars_from_host([sum_s(t2b)])),
        G_dev,
        H_dev,
        B_dev,
        Bb_dev,
        fb_table,
        split_table,
    )

    from ...ops import packio
    from ...ops.limb import NL

    rounds = (nm - 1).bit_length()
    shapes = [
        (32,),
        (NL, m), (NL, m), (m,),          # V
        (NL, 2), (NL, 2), (2,),          # A, S
        (NL, 2), (NL, 2), (2,),          # T_1, T_2
        (NL, 1), (NL, 1), (NL, 1),       # t_x, t_x_blinding, e_blinding
        (NL,), (NL,),                    # a, b
        (rounds, NL, 2), (rounds, NL, 2), (rounds, 2),  # L/R per round
    ]
    (state_np, Vx, Vy, Vid, ASx, ASy, ASid, Tx, Ty, Tid,
     t_x, t_xb, e_b, a_fin, b_fin, Lx_np, Ly_np, Lid_np) = packio.unpack_np(
        np.asarray(out), shapes
    )

    transcript.state = bytes(int(v) for v in state_np)

    def pts_of(x, y, iid):
        xs = limb.limbs_to_ints(x)
        ys = limb.limbs_to_ints(y)
        return [
            StarkPoint.identity() if iid[k] else StarkPoint(int(xs[k]), int(ys[k]))
            for k in range(len(xs))
        ]

    V_list = pts_of(Vx, Vy, Vid)
    A_pt, S_pt = pts_of(ASx, ASy, ASid)
    T1_pt, T2_pt = pts_of(Tx, Ty, Tid)
    sc = lambda col: cj.scalars_to_host(col)[0]

    L_vec, R_vec = [], []
    for rnd in range(Lx_np.shape[0]):
        xv = limb.limbs_to_ints(Lx_np[rnd])
        yv = limb.limbs_to_ints(Ly_np[rnd])
        for k, vec in ((0, L_vec), (1, R_vec)):
            if Lid_np[rnd, k]:
                vec.append(StarkPoint.identity())
            else:
                vec.append(StarkPoint(int(xv[k]), int(yv[k])))

    ipp = InnerProductProof(
        L_vec, R_vec,
        cj.scalars_to_host(a_fin[:, None])[0],
        cj.scalars_to_host(b_fin[:, None])[0],
    )
    proof = RangeProof(
        A=A_pt, S=S_pt, T_1=T1_pt, T_2=T2_pt,
        t_x=sc(t_x), t_x_blinding=sc(t_xb), e_blinding=sc(e_b),
        ipp_proof=ipp,
    )
    return proof, V_list
