"""The Bulletproofs inner-product argument (IPP).

Re-implements the capability of reference src/inner_product_proof.rs: a
log-round argument that ``P = <a, G> + <b o y^-n, H> + <a, b> Q`` with
O(log n) proof size.  Protocol structure (create: :49-193; verify:
:317-372; verification_scalars: :254-310; codec: :379-455):

* per round, cross inner products ``c_L = <a_L, b_R>``, ``c_R = <a_R, b_L>``
  and two (n+1)-term MSMs produce L, R; the transcript absorbs them and
  yields challenge ``u``; witness and generators fold in half
  (``a' = u a_L + u^-1 a_R`` etc., eq. (4) of the Bulletproofs paper);
* the first round folds the ``G_factors``/``H_factors`` scalings into the
  MSM scalars instead of scaling the generators up front;
* the proof is ``(L_1..L_k, R_1..R_k, a, b)``.

TPU mapping: vectors live on device as limb tensors; per-round folds are
fused vector kernels and batched Shamir double-and-adds
(:mod:`..ops.fold`); L/R are device Pippenger MSMs (:mod:`..ops.msm`).
Only the two 32-byte round outputs L, R cross to the host, where the
(inherently sequential) keccak transcript produces the next challenge —
log(n) tiny transfers per proof, everything else stays in HBM.  On
non-TPU backends the same protocol runs against the exact host algebra
(:mod:`..ops.backend`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..constants import SCALAR_BYTES, STARK_POINT_BYTES
from ..ops import backend
from ..ops.curve import StarkPoint
from ..ops.field import Scalar, inner_product
from ..transcript import HashChainTranscript
from ..utils.errors import FormatError, VerificationError


@dataclass
class InnerProductProof:
    L_vec: list[StarkPoint]
    R_vec: list[StarkPoint]
    a: Scalar
    b: Scalar

    # ------------------------------------------------------------------
    # creation
    # ------------------------------------------------------------------

    @staticmethod
    def create(
        transcript: HashChainTranscript,
        Q: StarkPoint,
        G_factors: list[Scalar],
        H_factors: list[Scalar],
        G_vec: list[StarkPoint],
        H_vec: list[StarkPoint],
        a_vec: list[Scalar],
        b_vec: list[Scalar],
        packed_gens=None,
        table_ctx=None,
    ) -> "InnerProductProof":
        """``table_ctx`` (optional): ``(table, g_off, h_off, q_idx, w)`` —
        a native split generator table (BulletproofGens.split_table) plus
        the scalar ``w`` with ``Q = w * table[q_idx]``; routes the prover
        through 64-bit-chunk MSMs over precomputed base shifts."""
        n = len(G_vec)
        if not all(len(v) == n for v in (H_vec, a_vec, b_vec, G_factors, H_factors)):
            raise ValueError("IPP input vectors must share one length")
        if n & (n - 1):
            raise ValueError("IPP length must be a power of two")

        transcript.innerproduct_domain_sep(n)

        if backend.use_device() and n >= 32:
            return _create_device_fused(
                transcript, Q, G_factors, H_factors, G_vec, H_vec, a_vec, b_vec
            )
        from ..utils import native

        if table_ctx is not None and native.available() and n >= 8:
            table, g_off, h_off, q_idx, w = table_ctx
            return native.ipp_create_table(
                transcript, table, w, G_factors, H_factors, a_vec, b_vec,
                g_off, h_off, q_idx,
            )
        return _create_host(
            transcript, Q, G_factors, H_factors, G_vec, H_vec, a_vec, b_vec,
            packed_gens,
        )

    # ------------------------------------------------------------------
    # verification
    # ------------------------------------------------------------------

    def verification_scalars(
        self, n: int, transcript: HashChainTranscript
    ) -> tuple[list[Scalar], list[Scalar], list[Scalar]]:
        """Recompute challenges and the s-vector (reference :254-310).

        Returns ``(u_sq, u_inv_sq, s)`` for the parent protocol's single
        mega-MSM.
        """
        challenges, challenges_inv = self.replay_challenges(n, transcript)
        lg_n = len(self.L_vec)
        allinv = Scalar(1)
        for ci in challenges_inv:
            allinv = allinv * ci

        u_sq = [u * u for u in challenges]
        u_inv_sq = [u * u for u in challenges_inv]

        # s-vector built inductively: s_0 = prod(u_i^-1); s_i = s_{i-k} * u_{lg i + 1}^2
        s = [allinv]
        for i in range(1, n):
            lg_i = i.bit_length() - 1
            k = 1 << lg_i
            u_lg_i_sq = u_sq[(lg_n - 1) - lg_i]
            s.append(s[i - k] * u_lg_i_sq)

        return u_sq, u_inv_sq, s

    def replay_challenges(
        self, n: int, transcript: HashChainTranscript
    ) -> tuple[list[Scalar], list[Scalar]]:
        """Replay the transcript absorbs and recompute (u, u^-1) per round.

        The cheap, transcript-coupled part of :meth:`verification_scalars`;
        callers with a native vector backend derive the O(n) scalar vectors
        from these (utils/native.py::rp_verify_vectors)."""
        lg_n = len(self.L_vec)
        if lg_n >= 32:
            raise VerificationError("proof too large")
        if n != (1 << lg_n):
            raise VerificationError("length mismatch with proof")

        transcript.innerproduct_domain_sep(n)

        challenges = []
        for L, R in zip(self.L_vec, self.R_vec):
            transcript.validate_and_append_point(b"L", L)
            transcript.validate_and_append_point(b"R", R)
            challenges.append(transcript.challenge_scalar(b"u"))

        return challenges, Scalar.batch_inverse(challenges)

    def verify(
        self,
        n: int,
        transcript: HashChainTranscript,
        G_factors: list[Scalar],
        H_factors: list[Scalar],
        P: StarkPoint,
        Q: StarkPoint,
        G: list[StarkPoint],
        H: list[StarkPoint],
    ) -> None:
        """Standalone verification by a single MSM (reference :317-372).

        Raises :class:`VerificationError` on failure.
        """
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)

        g_times_a_times_s = [(self.a * s_i) * g_i for g_i, s_i in zip(G_factors, s)]
        inv_s = list(reversed(s))
        h_times_b_div_s = [(self.b * s_inv) * h_i for h_i, s_inv in zip(H_factors, inv_s)]
        neg_u_sq = [-u for u in u_sq]
        neg_u_inv_sq = [-u for u in u_inv_sq]

        scalars = (
            [self.a * self.b]
            + g_times_a_times_s
            + h_times_b_div_s
            + neg_u_sq
            + neg_u_inv_sq
        )
        points = [Q] + G + H + self.L_vec + self.R_vec
        expect_P = _msm(scalars, points)
        if expect_P != P:
            raise VerificationError("inner product proof failed")

    # ------------------------------------------------------------------
    # serialization (reference :379-455)
    # ------------------------------------------------------------------

    def serialized_size(self) -> int:
        return len(self.L_vec) * 2 * STARK_POINT_BYTES + 2 * SCALAR_BYTES

    def to_bytes(self) -> bytes:
        buf = bytearray()
        for l_pt, r_pt in zip(self.L_vec, self.R_vec):
            buf += l_pt.to_bytes()
            buf += r_pt.to_bytes()
        buf += self.a.to_bytes_be()
        buf += self.b.to_bytes_be()
        return bytes(buf)

    @staticmethod
    def from_bytes(data: bytes) -> "InnerProductProof":
        b = len(data)
        if b < 2 * SCALAR_BYTES or b % 32 != 0:
            raise FormatError("bad IPP length")
        num_points = (b - 2 * SCALAR_BYTES) // STARK_POINT_BYTES
        if num_points % 2 != 0:
            raise FormatError("bad IPP point count")
        lg_n = num_points // 2
        if lg_n >= 32:
            raise FormatError("IPP too large")
        L_vec, R_vec = [], []
        for i in range(lg_n):
            pos = 2 * i * STARK_POINT_BYTES
            try:
                L_vec.append(StarkPoint.from_bytes(data[pos : pos + 32]))
                R_vec.append(StarkPoint.from_bytes(data[pos + 32 : pos + 64]))
            except ValueError as exc:
                raise FormatError(str(exc)) from exc
        pos = 2 * lg_n * STARK_POINT_BYTES
        a = Scalar.from_be_bytes_mod_order(data[pos : pos + SCALAR_BYTES])
        b_sc = Scalar.from_be_bytes_mod_order(data[pos + SCALAR_BYTES :])
        return InnerProductProof(L_vec, R_vec, a, b_sc)

    def __eq__(self, other):
        return (
            isinstance(other, InnerProductProof)
            and self.L_vec == other.L_vec
            and self.R_vec == other.R_vec
            and self.a == other.a
            and self.b == other.b
        )


def _msm(scalars, points) -> StarkPoint:
    """Protocol MSM -> ops.backend.dispatch_msm (sharded/device/host)."""
    return backend.dispatch_msm(scalars, points)


# ---------------------------------------------------------------------------
# host prover
# ---------------------------------------------------------------------------

def _create_host(transcript, Q, G_factors, H_factors, G, H, a, b, packed_gens=None):
    """Coefficient-tracking IPP prover.

    Instead of materializing folded generator vectors (a per-element double
    scalar multiplication every round — the dominant cost of the reference's
    ``fold_witness``), track a scalar coefficient per *original* generator:
    after rounds with challenges u_1..u_j, folded generator k equals
    ``sum_{i mod L == k} w_i G_i``, so each round's L and R are single
    (n+1)-term MSMs over the original generators with coefficients
    ``w_i * a_class(i)``.  Point work per proof drops from
    ~2n scalar-mults + shrinking MSMs to log(n) fixed-size MSMs.
    The ``G_factors``/``H_factors`` initialize the coefficients, which also
    removes the reference's special-cased first round.
    """
    n = len(G)
    if n == 1:
        return InnerProductProof([], [], Scalar(int(a[0])), Scalar(int(b[0])))

    from ..utils import native

    if native.available() and n >= 8:
        # Full native prover: all rounds run inside the C++ core.
        return native.ipp_create(
            transcript, Q, G_factors, H_factors, G, H, a, b, packed_gens
        )

    MOD = Scalar.MODULUS
    wG = [int(x) for x in G_factors]
    wH = [int(x) for x in H_factors]
    av = [int(x) for x in a]
    bv = [int(x) for x in b]
    L_vec: list[StarkPoint] = []
    R_vec: list[StarkPoint] = []

    use_native = native.available() and n >= 8
    if use_native:
        table = native.PointTable(list(G) + list(H) + [Q])
    all_pts = list(G) + list(H) + [Q]

    cur = n
    while cur > 1:
        half = cur // 2
        a_L, a_R = av[:half], av[half:]
        b_L, b_R = bv[:half], bv[half:]
        c_L = sum(x * y for x, y in zip(a_L, b_R)) % MOD
        c_R = sum(x * y for x, y in zip(a_R, b_L)) % MOD

        # L = <a_L, G'_R> + <b_R, H'_L> + c_L Q, expressed over the ORIGINAL
        # generators via the tracked coefficients (see docstring).
        idxL, idxR = _ipp_round_indices(n, cur)
        sL = [0] * (n + 1)
        sR = [0] * (n + 1)
        for i in range(n):
            r = i % cur
            if r >= half:
                sL[i] = wG[i] * a_L[r - half] % MOD
                sR[i] = wH[i] * b_L[r - half] % MOD
            else:
                sL[i] = wH[i] * b_R[r] % MOD
                sR[i] = wG[i] * a_R[r] % MOD
        sL[n] = c_L
        sR[n] = c_R
        if use_native:
            L = table.msm(sL, idxL)
            R = table.msm(sR, idxR)
        else:
            L = _msm([Scalar(s) for s in sL], [all_pts[j] for j in idxL])
            R = _msm([Scalar(s) for s in sR], [all_pts[j] for j in idxR])

        L_vec.append(L)
        R_vec.append(R)
        transcript.append_point(b"L", L)
        transcript.append_point(b"R", R)
        u = int(transcript.challenge_scalar(b"u"))
        u_inv = pow(u, -1, MOD)

        if half > 1:  # coefficients are dead after the last round
            for i in range(n):
                if (i % cur) < half:
                    wG[i] = wG[i] * u_inv % MOD
                    wH[i] = wH[i] * u % MOD
                else:
                    wG[i] = wG[i] * u % MOD
                    wH[i] = wH[i] * u_inv % MOD

        av = [(al * u + u_inv * ar) % MOD for al, ar in zip(a_L, a_R)]
        bv = [(bl * u_inv + u * br) % MOD for bl, br in zip(b_L, b_R)]
        cur = half

    return InnerProductProof(L_vec, R_vec, Scalar(av[0]), Scalar(bv[0]))


_IPP_INDEX_CACHE: dict = {}


def _ipp_round_indices(n: int, cur: int):
    """(idxL, idxR) point-table indices for one IPP round; table layout is
    [G_0..G_{n-1}, H_0..H_{n-1}, Q].  Cached: depends only on (n, cur)."""
    import numpy as np

    key = (n, cur)
    hit = _IPP_INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    half = cur // 2
    idxL = np.empty(n + 1, dtype=np.uint32)
    idxR = np.empty(n + 1, dtype=np.uint32)
    for i in range(n):
        if (i % cur) >= half:
            idxL[i] = i          # G_i
            idxR[i] = n + i      # H_i
        else:
            idxL[i] = n + i
            idxR[i] = i
    idxL[n] = 2 * n
    idxR[n] = 2 * n
    _IPP_INDEX_CACHE[key] = (idxL, idxR)
    return idxL, idxR


def _create_host_folding(transcript, Q, G_factors, H_factors, G, H, a, b):
    n = len(G)
    L_vec: list[StarkPoint] = []
    R_vec: list[StarkPoint] = []

    first = True
    while n > 1:
        n //= 2
        a_L, a_R = a[:n], a[n:]
        b_L, b_R = b[:n], b[n:]
        G_L, G_R = G[:n], G[n:]
        H_L, H_R = H[:n], H[n:]

        c_L = inner_product(a_L, b_R)
        c_R = inner_product(a_R, b_L)

        if first:
            # Fold the G/H factors into the MSM scalars (reference :80-147).
            L = _msm(
                [x * g for x, g in zip(a_L, G_factors[n : 2 * n])]
                + [x * h for x, h in zip(b_R, H_factors[:n])]
                + [c_L],
                G_R + H_L + [Q],
            )
            R = _msm(
                [x * g for x, g in zip(a_R, G_factors[:n])]
                + [x * h for x, h in zip(b_L, H_factors[n : 2 * n])]
                + [c_R],
                G_L + H_R + [Q],
            )
        else:
            L = _msm(a_L + b_R + [c_L], G_R + H_L + [Q])
            R = _msm(a_R + b_L + [c_R], G_L + H_R + [Q])

        L_vec.append(L)
        R_vec.append(R)
        transcript.append_point(b"L", L)
        transcript.append_point(b"R", R)
        u = transcript.challenge_scalar(b"u")
        u_inv = u.inverse()

        a = [al * u + u_inv * ar for al, ar in zip(a_L, a_R)]
        b = [bl * u_inv + u * br for bl, br in zip(b_L, b_R)]
        from ..utils import native

        if native.available() and n >= 4:
            if first:
                ul = [u_inv * gf for gf in G_factors[:n]]
                ur = [u * gf for gf in G_factors[n : 2 * n]]
                hl = [u * hf for hf in H_factors[:n]]
                hr = [u_inv * hf for hf in H_factors[n : 2 * n]]
                first = False
            else:
                ul, ur = [u_inv] * n, [u] * n
                hl, hr = [u] * n, [u_inv] * n
            G = native.fold_points(ul, ur, G_L, G_R)
            H = native.fold_points(hl, hr, H_L, H_R)
            continue
        if first:
            G = [
                StarkPoint.msm(
                    [u_inv * gl_f, u * gr_f],
                    [G_L[i], G_R[i]],
                )
                for i, (gl_f, gr_f) in enumerate(
                    zip(G_factors[:n], G_factors[n : 2 * n])
                )
            ]
            H = [
                StarkPoint.msm(
                    [u * hl_f, u_inv * hr_f],
                    [H_L[i], H_R[i]],
                )
                for i, (hl_f, hr_f) in enumerate(
                    zip(H_factors[:n], H_factors[n : 2 * n])
                )
            ]
            first = False
        else:
            G = [StarkPoint.msm([u_inv, u], [gl, gr]) for gl, gr in zip(G_L, G_R)]
            H = [StarkPoint.msm([u, u_inv], [hl, hr]) for hl, hr in zip(H_L, H_R)]

    return InnerProductProof(L_vec, R_vec, a[0], b[0])


# ---------------------------------------------------------------------------
# device prover
# ---------------------------------------------------------------------------

def _create_device(transcript, Q, G_factors, H_factors, G, H, a, b):
    """Coefficient-tracking IPP prover on the TPU kernels.

    Same algorithm as the host prover: per round, L/R are (n+1)-term MSMs
    over the *original* generators with tracked per-generator coefficients.
    This keeps the MSM shape constant across rounds (one kernel compile per
    proof size) and eliminates the per-round 252-step point-fold scans.
    Only L and R (2 x 32 bytes) cross to the host transcript per round.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..ops import curve_jax as cj
    from ..ops import fold as fold_mod
    from ..ops import limb
    from ..ops import msm as msm_mod

    n = len(G)
    if n == 1:
        return InnerProductProof([], [], a[0], b[0])

    a_d = jnp.asarray(cj.scalars_from_host(a))
    b_d = jnp.asarray(cj.scalars_from_host(b))
    wG_d = jnp.asarray(cj.scalars_from_host(G_factors))
    wH_d = jnp.asarray(cj.scalars_from_host(H_factors))
    pts_d = jnp.asarray(
        np.concatenate(
            [cj.points_from_host(G), cj.points_from_host(H), cj.points_from_host([Q])],
            axis=-1,
        )
    )

    L_vec: list[StarkPoint] = []
    R_vec: list[StarkPoint] = []

    cur = n
    while cur > 1:
        half = cur // 2
        a_L, a_R = a_d[:, :half], a_d[:, half:]
        b_L, b_R = b_d[:, :half], b_d[:, half:]
        c_L = limb.inner_product_mod(a_L, b_R, limb.FR)[:, None]
        c_R = limb.inner_product_mod(a_R, b_L, limb.FR)[:, None]

        r_np = np.arange(n) % cur
        hi = r_np >= half                      # classes on the "right" half
        hi_d = jnp.asarray(hi)
        idxL, idxR = _ipp_round_indices(n, cur)

        a_of_class = a_L[:, np.where(hi, r_np - half, 0)]
        bR_of_class = b_R[:, np.where(hi, 0, r_np)]
        aR_of_class = a_R[:, np.where(hi, 0, r_np)]
        bL_of_class = b_L[:, np.where(hi, r_np - half, 0)]
        w_hiG = jnp.where(hi_d[None], wG_d, wH_d)
        w_hiH = jnp.where(hi_d[None], wH_d, wG_d)

        sL = limb.mod_mul(w_hiG, jnp.where(hi_d[None], a_of_class, bR_of_class), limb.FR)
        sR = limb.mod_mul(w_hiH, jnp.where(hi_d[None], bL_of_class, aR_of_class), limb.FR)

        L_d = msm_mod.msm_device(
            jnp.concatenate([sL, c_L], axis=-1), pts_d[:, :, np.asarray(idxL)]
        )
        R_d = msm_mod.msm_device(
            jnp.concatenate([sR, c_R], axis=-1), pts_d[:, :, np.asarray(idxR)]
        )

        L_pt, R_pt = cj.points_to_host(jnp.stack([L_d, R_d], axis=-1))
        L_vec.append(L_pt)
        R_vec.append(R_pt)
        transcript.append_point(b"L", L_pt)
        transcript.append_point(b"R", R_pt)
        u = transcript.challenge_scalar(b"u")
        u_inv = u.inverse()

        u_d = jnp.asarray(limb.int_to_limbs_np(u.value))
        u_inv_d = jnp.asarray(limb.int_to_limbs_np(u_inv.value))

        if half > 1:
            uG = jnp.where(hi_d[None], jnp.broadcast_to(u_d, (limb.NL, n)),
                           jnp.broadcast_to(u_inv_d, (limb.NL, n)))
            uH = jnp.where(hi_d[None], jnp.broadcast_to(u_inv_d, (limb.NL, n)),
                           jnp.broadcast_to(u_d, (limb.NL, n)))
            wG_d = limb.mod_mul(wG_d, uG, limb.FR)
            wH_d = limb.mod_mul(wH_d, uH, limb.FR)

        a_d = fold_mod.fold_scalars(u_d, u_inv_d, a_L, a_R)
        b_d = fold_mod.fold_scalars(u_inv_d, u_d, b_L, b_R)
        cur = half

    a_fin = cj.scalars_to_host(a_d)[0]
    b_fin = cj.scalars_to_host(b_d)[0]
    return InnerProductProof(L_vec, R_vec, a_fin, b_fin)


# ---------------------------------------------------------------------------
# fused device prover: the whole log-round protocol as ONE compiled program
# ---------------------------------------------------------------------------

_FUSED_IPP_CACHE: dict = {}


def _fused_ipp_fn(n: int):
    """Build (and cache per size) the jitted fused IPP prover.

    The entire protocol — per-round cross inner products, coefficient
    updates, the two (n+1)-point MSMs, projective->affine conversion,
    keccak transcript absorbs, challenge squeezing, the modular inverse of
    the challenge, and the witness folds — runs as a single
    ``lax.scan`` over the log(n) rounds inside one XLA program.  Zero host
    round trips: dispatch latency is paid once per *proof*, not twice per
    *round* (the round-1 design's per-round host transcript cost
    2 * lg(n) tunnel round trips — SURVEY.md §7.3's "sequential
    Fiat-Shamir" problem, solved by moving the hash chain on-device,
    :mod:`...ops.transcript_jax`).

    Rounds have shrinking live widths; the scan keeps static shapes by
    zero-padding the witness vectors to n and slicing the live halves with
    ``lax.dynamic_slice`` (padding lanes contribute zero to inner products
    and fold to zero).  The per-generator coefficient vectors stay full
    width in every round (coefficient tracking — see ``_create_host``).
    """
    fn = _FUSED_IPP_CACHE.get(n)
    if fn is not None:
        return fn

    import jax

    from ..ops import packio

    run = fused_ipp_body(n)

    def run_packed(*args):
        # one flat int32 output -> one tunnel fetch (ops/packio.py)
        out = run(*args)
        return packio.pack_device(list(out))

    fn = jax.jit(run_packed)
    _FUSED_IPP_CACHE[n] = fn
    return fn


def fused_ipp_body(n: int, shard=None, table_gens: bool = False):
    """The traceable fused-IPP program for size ``n`` (unjitted).

    Returned callable: ``run(state32, a_d, b_d, wG, wH, pts_d) ->
    (state32, a_final, b_final, xs, ys, iids)``.  Used standalone by
    :func:`_fused_ipp_fn` and inlined by the fused range-proof prover
    (``models/range_proof/fused_device.py``).

    ``shard=(axis_name, ndev)`` builds the multi-chip variant for use
    INSIDE a ``shard_map``: every round's L/R pair MSM computes per-device
    partials over a lane slice and folds them with one ``all_gather`` —
    the round's only collective.  The cheap O(n) vector work (coefficient
    updates, folds, transcript) is replicated on every device, which costs
    no communication and keeps the hash chain in lockstep.

    ``table_gens=True`` switches the round MSMs to 64-bit scalar chunks
    against a cached packed split table of ``[G | H | B]`` (built once per
    gens — ``ops/msm.build_split_affine_table``); the caller must have
    ``Q = w * B`` and passes ``run(state32, a_d, b_d, wG, wH, table,
    q_scale=w)`` — the Q-term rides base B with scalar ``c_L * w``.  This
    shrinks each round's serial Horner combine from ~252+nw to ~72 grid
    steps and replaces the MXU permutation reorder with the measured
    fast-path 16-word record gather.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..constants import R as R_MOD
    from ..ops import kernels as kernels_mod
    from ..ops import limb
    from ..ops import msm as msm_mod
    from ..ops import transcript_jax as tj

    from ..parallel.sharded import shard_pad_msm

    NLc = limb.NL
    nh = n // 2
    lanes4 = msm_mod.SPLIT_CHUNKS * (n + 1)
    if shard is None:
        if table_gens:
            c = msm_mod.select_window(lanes4, msm_mod.SPLIT_CHUNK_BITS)

            def pair_msm_table(s4L, recL, s4R, recR, table):
                return msm_mod._msm_multi_table_impl(
                    [(s4L, recL), (s4R, recR)], table, c
                )
        else:
            c = msm_mod.select_window(n + 1)

            def pair_msm(sL, pL, sR, pR):
                return msm_mod._msm_batched_pair_impl(sL, pL, sR, pR, c)
    else:
        ax, ndev = shard
        if table_gens:
            ck = -(-lanes4 // ndev)
            c = msm_mod.select_window(ck, msm_mod.SPLIT_CHUNK_BITS)

            def pair_msm_table(s4L, recL, s4R, recR, table):
                pad = ck * ndev - lanes4
                if pad:
                    s4L = jnp.pad(s4L, [(0, 0), (0, pad)])
                    s4R = jnp.pad(s4R, [(0, 0), (0, pad)])
                    recL = jnp.pad(recL, [(0, pad)])
                    recR = jnp.pad(recR, [(0, pad)])
                d = jax.lax.axis_index(ax)
                sl = jax.lax.dynamic_slice_in_dim(s4L, d * ck, ck, axis=-1)
                rl = jax.lax.dynamic_slice_in_dim(recL, d * ck, ck, axis=-1)
                sr = jax.lax.dynamic_slice_in_dim(s4R, d * ck, ck, axis=-1)
                rr = jax.lax.dynamic_slice_in_dim(recR, d * ck, ck, axis=-1)
                part = msm_mod._msm_multi_table_impl(
                    [(sl, rl), (sr, rr)], table, c
                )  # (3, NLZ, 2)
                gathered = jax.lax.all_gather(part, ax)
                pairs = jnp.moveaxis(gathered, 0, -1)
                L_tot = msm_mod._reduce_sum_tree(pairs[:, :, 0])
                R_tot = msm_mod._reduce_sum_tree(pairs[:, :, 1])
                return jnp.concatenate([L_tot, R_tot], axis=-1)
        else:
            ck = -(-(n + 1) // ndev)
            c = msm_mod.select_window(ck)

            def pair_msm(sL, pL, sR, pR):
                (sL, pL), (sR, pR) = shard_pad_msm(sL, pL, ck * ndev), shard_pad_msm(sR, pR, ck * ndev)
                d = jax.lax.axis_index(ax)
                sl = jax.lax.dynamic_slice_in_dim(sL, d * ck, ck, axis=-1)
                pl = jax.lax.dynamic_slice_in_dim(pL, d * ck, ck, axis=-1)
                sr = jax.lax.dynamic_slice_in_dim(sR, d * ck, ck, axis=-1)
                pr = jax.lax.dynamic_slice_in_dim(pR, d * ck, ck, axis=-1)
                part = msm_mod._msm_batched_pair_impl(sl, pl, sr, pr, c)  # (3, NLZ, 2)
                gathered = jax.lax.all_gather(part, ax)  # (ndev, 3, NLZ, 2)
                pairs = jnp.moveaxis(gathered, 0, -1)  # (3, NLZ, 2, ndev)
                L_tot = msm_mod._reduce_sum_tree(pairs[:, :, 0])
                R_tot = msm_mod._reduce_sum_tree(pairs[:, :, 1])
                return jnp.concatenate([L_tot, R_tot], axis=-1)

    idxL_all, idxR_all = [], []
    cur = n
    while cur > 1:
        iL, iR = _ipp_round_indices(n, cur)
        if table_gens:
            iL = msm_mod.split_record_indices(iL, 2 * n + 1)
            iR = msm_mod.split_record_indices(iR, 2 * n + 1)
        idxL_all.append(iL.astype(np.int32))
        idxR_all.append(iR.astype(np.int32))
        cur //= 2
    idxL_rounds = np.stack(idxL_all)
    idxR_rounds = np.stack(idxR_all)

    def run(state32, a_d, b_d, wG, wH, pts_d, q_scale=None):
        def body(carry, xs):
            state, a_d, b_d, wG, wH, cur = carry
            idxL, idxR = xs
            half = cur // 2
            live = jnp.arange(nh, dtype=jnp.int32) < half
            a_L = jnp.where(live[None], a_d[:, :nh], 0)
            b_L = jnp.where(live[None], b_d[:, :nh], 0)
            # entries >= cur are zero, so the slices carry zeros past `half`
            a_R = jax.lax.dynamic_slice(a_d, (0, half), (NLc, nh))
            b_R = jax.lax.dynamic_slice(b_d, (0, half), (NLc, nh))
            c_L = limb._inner_product_mod(a_L, b_R, limb.FR)[:, None]
            c_R = limb._inner_product_mod(a_R, b_L, limb.FR)[:, None]

            r = jnp.arange(n, dtype=jnp.int32) % cur
            hi = r >= half
            cls = jnp.where(hi, r - half, r)  # class index within the halves
            aL_of = jnp.take_along_axis(a_L, jnp.broadcast_to(jnp.where(hi, cls, 0)[None], (NLc, n)), axis=1)
            bR_of = jnp.take_along_axis(b_R, jnp.broadcast_to(jnp.where(hi, 0, cls)[None], (NLc, n)), axis=1)
            aR_of = jnp.take_along_axis(a_R, jnp.broadcast_to(jnp.where(hi, 0, cls)[None], (NLc, n)), axis=1)
            bL_of = jnp.take_along_axis(b_L, jnp.broadcast_to(jnp.where(hi, cls, 0)[None], (NLc, n)), axis=1)
            w_hiG = jnp.where(hi[None], wG, wH)
            w_hiH = jnp.where(hi[None], wH, wG)
            sL = limb._mod_mul(w_hiG, jnp.where(hi[None], aL_of, bR_of), limb.FR)
            sR = limb._mod_mul(w_hiH, jnp.where(hi[None], bL_of, aR_of), limb.FR)
            if table_gens:
                # Q = q_scale * B: the Q term rides base B with c * q_scale
                cq_L = limb._mod_mul(c_L, q_scale, limb.FR)
                cq_R = limb._mod_mul(c_R, q_scale, limb.FR)
                s4L = msm_mod.split_scalars_device(
                    jnp.concatenate([sL, cq_L], axis=-1)
                )
                s4R = msm_mod.split_scalars_device(
                    jnp.concatenate([sR, cq_R], axis=-1)
                )
                LR = pair_msm_table(s4L, idxL, s4R, idxR, pts_d)
            else:
                sL = jnp.concatenate([sL, c_L], axis=-1)
                sR = jnp.concatenate([sR, c_R], axis=-1)

                # L and R as ONE merged program: shared bucket phase, one
                # Horner chain with both outputs on the lane axis
                LR = pair_msm(sL, pts_d[:, :, idxL], sR, pts_d[:, :, idxR])

            x, y, iid = tj.lazy_points_to_affine(LR)
            enc = tj.points_transcript_bytes(x, y, iid)  # (64, 2)
            state = tj.absorb(state, b"L", enc[:, 0], 64)
            state = tj.absorb(state, b"R", enc[:, 1], 64)
            state, u = tj.challenge_scalar(state, b"u")
            u_inv = kernels_mod.mod_pow_static(u, R_MOD - 2, limb.FR)

            ub = jnp.broadcast_to(u, (NLc, n))
            uib = jnp.broadcast_to(u_inv, (NLc, n))
            wG = limb._mod_mul(wG, jnp.where(hi[None], ub, uib), limb.FR)
            wH = limb._mod_mul(wH, jnp.where(hi[None], uib, ub), limb.FR)

            a_next = limb._mod_add(
                limb._mod_mul(a_L, u, limb.FR), limb._mod_mul(a_R, u_inv, limb.FR), limb.FR
            )
            b_next = limb._mod_add(
                limb._mod_mul(b_L, u_inv, limb.FR), limb._mod_mul(b_R, u, limb.FR), limb.FR
            )
            zpad = jnp.zeros((NLc, n - nh), jnp.int32)
            a_d = jnp.concatenate([a_next, zpad], axis=-1)
            b_d = jnp.concatenate([b_next, zpad], axis=-1)
            return (state, a_d, b_d, wG, wH, half), (x, y, iid)

        init = (state32, a_d, b_d, wG, wH, jnp.int32(n))
        (state32, a_d, b_d, _, _, _), (xs, ys, iids) = jax.lax.scan(
            body, init, (jnp.asarray(idxL_rounds), jnp.asarray(idxR_rounds))
        )
        return state32, a_d[:, 0], b_d[:, 0], xs, ys, iids

    return run


def _create_device_fused(transcript, Q, G_factors, H_factors, G, H, a, b):
    """Drive the fused single-program device prover (see ``_fused_ipp_fn``)."""
    import jax.numpy as jnp
    import numpy as np

    from ..ops import curve_jax as cj
    from ..ops import limb

    n = len(G)
    if n == 1:
        return InnerProductProof([], [], a[0], b[0])

    fn = _fused_ipp_fn(n)
    state32 = jnp.asarray(np.frombuffer(transcript.state, np.uint8).astype(np.uint32))
    a_d = jnp.asarray(cj.scalars_from_host(a))
    b_d = jnp.asarray(cj.scalars_from_host(b))
    wG = jnp.asarray(cj.scalars_from_host(G_factors))
    wH = jnp.asarray(cj.scalars_from_host(H_factors))
    pts_d = jnp.asarray(
        np.concatenate(
            [cj.points_from_host(G), cj.points_from_host(H), cj.points_from_host([Q])],
            axis=-1,
        )
    )

    out = fn(state32, a_d, b_d, wG, wH, pts_d)

    # one transfer for everything; synchronize the host transcript state
    from ..ops import packio
    from ..ops.limb import NL

    rounds = (n - 1).bit_length()
    shapes = [(32,), (NL,), (NL,), (rounds, NL, 2), (rounds, NL, 2), (rounds, 2)]
    state_np, a_fin, b_fin, xs_np, ys_np, iids_np = packio.unpack_np(
        np.asarray(out), shapes
    )
    transcript.state = bytes(int(v) for v in state_np)
    L_vec, R_vec = [], []
    for rnd in range(xs_np.shape[0]):
        xv = limb.limbs_to_ints(xs_np[rnd])
        yv = limb.limbs_to_ints(ys_np[rnd])
        for k, vec in ((0, L_vec), (1, R_vec)):
            if iids_np[rnd, k]:
                vec.append(StarkPoint.identity())
            else:
                vec.append(StarkPoint(int(xv[k]), int(yv[k])))
    a_sc = cj.scalars_to_host(a_fin[:, None])[0]
    b_sc = cj.scalars_to_host(b_fin[:, None])[0]
    return InnerProductProof(L_vec, R_vec, a_sc, b_sc)
