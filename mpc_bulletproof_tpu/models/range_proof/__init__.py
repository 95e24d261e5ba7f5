"""Single and aggregated Bulletproofs range proofs.

Restores the capability the reference fork stubbed out of the build
(reference src/lib.rs:36-43): the README doctest API
(``RangeProof::prove_single`` / ``verify_single`` — README.md:93-147),
``prove_multiple`` / ``verify_multiple`` aggregation, and the party/dealer
aggregation protocol (docs/range-proof-protocol.md, docs/aggregation-api.md,
docs/notes-rp.md).

Proof layout: ``{A, S, T_1, T_2, t(x), ~t(x), ~e}`` followed by the IPP —
``(9 + 2 log2(n m)) * 32`` bytes.

The verifier is a single mega-MSM; the prover's hot paths (the IPP over the
``n*m``-length vectors, commitments) ride the TPU kernels via the standard
dispatch.  The R1CS bit-decomposition gadget
(:func:`..r1cs.gadgets.range_check_gadget`) is the independent cross-check
used by the tests.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...constants import SCALAR_BYTES, STARK_POINT_BYTES
from ...generators import BulletproofGens, PedersenGens
from ...ops import backend
from ...ops.curve import StarkPoint
from ...ops.field import Scalar, sum_of_powers
from ...transcript import HashChainTranscript
from ...utils.errors import FormatError, MPCError, VerificationError
from ..inner_product import InnerProductProof
from .dealer import Dealer
from .messages import (  # noqa: F401
    BitChallenge,
    BitCommitment,
    PolyChallenge,
    PolyCommitment,
    ProofShare,
)
from .party import Party


def _msm(scalars, points) -> StarkPoint:
    """Protocol MSM -> ops.backend.dispatch_msm (sharded/device/host)."""
    return backend.dispatch_msm(scalars, points)


def _split_mega_check(split, nm, g_scalars, h_scalars, scalars, points, m):
    """Mega-check MSM with the fixed-base part (G, H, B, B_blinding) routed
    through a cached native split table.

    ``scalars``/``points`` follow the `_verification_terms` layout
    ``[A, S, T1, T2, V..., B, B_blinding, L..., R...]``; B / B_blinding sit
    at ``4 + m`` and are lifted into the table MSM, the remaining (small)
    variable-base part runs through the regular dispatcher.
    """
    import numpy as np

    table, g_off, h_off, b_idx, bb_idx = split
    bpos = 4 + m
    idx = np.concatenate(
        [
            np.arange(g_off, g_off + nm, dtype=np.uint32),
            np.arange(h_off, h_off + nm, dtype=np.uint32),
            np.asarray([b_idx, bb_idx], dtype=np.uint32),
        ]
    )
    # ONE native dispatch for the whole mega-check: the split-table fixed
    # part and the variable-base proof points run as interleaved tasks on
    # the worker pool and their serial combine tails overlap
    # (native.PointTable.mega_check).  Run sequentially the two Pippenger
    # tails add up — the dominant proof-scale verify cost.
    from ...utils import native

    b_pair = native._pack_scalars([scalars[bpos], scalars[bpos + 1]])
    if isinstance(g_scalars, np.ndarray):  # packed rows straight from native
        fixed_scalars = np.concatenate([g_scalars, h_scalars, b_pair])
    else:
        fixed_scalars = np.concatenate(
            [native._pack_scalars(list(g_scalars) + list(h_scalars)), b_pair]
        )
    var_scalars = scalars[:bpos] + scalars[bpos + 2 :]
    var_points = points[:bpos] + points[bpos + 2 :]
    return table.mega_check(fixed_scalars, idx, var_scalars, var_points)


def _party_map(fn, items):
    """Map over parties, threaded when it pays (native calls drop the GIL)."""
    if len(items) < 4:
        return [fn(it) for it in items]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(items))) as pool:
        return list(pool.map(fn, items))


@dataclass
class RangeProof:
    A: StarkPoint
    S: StarkPoint
    T_1: StarkPoint
    T_2: StarkPoint
    t_x: Scalar
    t_x_blinding: Scalar
    e_blinding: Scalar
    ipp_proof: InnerProductProof

    # ------------------------------------------------------------------
    # proving
    # ------------------------------------------------------------------

    @staticmethod
    def prove_multiple(
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        values: list[int],
        blindings: list[Scalar],
        n: int,
    ) -> tuple["RangeProof", list[StarkPoint]]:
        """Aggregated proof that every value is in [0, 2^n).

        Runs the party/dealer aggregation protocol locally (the same state
        machines serve a distributed deployment too, through
        :mod:`.party` / :mod:`.dealer`).
        """
        if len(values) != len(blindings):
            raise MPCError("wrong number of blindings")
        m = len(values)

        import os as _os

        if backend.use_device() and _os.environ.get("BP_FORCE_BACKEND") == "device":
            # Fused single-program device prover (handles its own dealer
            # entry / transcript domain separation).
            from .fused_device import prove_multiple_device

            return prove_multiple_device(
                bp_gens, pc_gens, transcript, values, blindings, n
            )

        dealer = Dealer.new(bp_gens, pc_gens, transcript, n, m)

        from ...utils import native

        if native.available() and n <= 64:
            return _prove_multiple_native(
                dealer, bp_gens, pc_gens, values, blindings, n
            )

        parties = [
            Party.new(bp_gens, pc_gens, v, b, n) for v, b in zip(values, blindings)
        ]
        # Party phases are independent; the native MSMs release the GIL, so a
        # thread pool runs them in parallel for larger aggregations.
        positioned, bit_commitments = zip(
            *_party_map(lambda jp: jp[1].assign_position(jp[0]), list(enumerate(parties)))
        )
        value_commitments = [bc.V_j for bc in bit_commitments]

        dealer, bit_challenge = dealer.receive_bit_commitments(list(bit_commitments))
        polied, poly_commitments = zip(
            *_party_map(lambda p: p.apply_challenge(bit_challenge), list(positioned))
        )
        dealer, poly_challenge = dealer.receive_poly_commitments(list(poly_commitments))
        shares = [p.apply_challenge(poly_challenge) for p in polied]
        proof = dealer.receive_trusted_shares(shares)
        return proof, value_commitments

    @staticmethod
    def prove_single(
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        v: int,
        v_blinding: Scalar,
        n: int,
    ) -> tuple["RangeProof", StarkPoint]:
        """Proof that ``v`` is in [0, 2^n) (README.md:93-147 API)."""
        proof, comms = RangeProof.prove_multiple(
            bp_gens, pc_gens, transcript, [v], [v_blinding], n
        )
        return proof, comms[0]

    # ------------------------------------------------------------------
    # verification
    # ------------------------------------------------------------------

    def verify_multiple(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        value_commitments: list[StarkPoint],
        n: int,
    ) -> None:
        """Single-MSM aggregated verification (docs/range-proof-protocol.md,
        "Verifier's algorithm").  Raises :class:`VerificationError`."""
        g_h_scalars, scalars, points = self._verification_terms(
            bp_gens, pc_gens, transcript, value_commitments, n
        )
        m = len(value_commitments)
        g_scalars, h_scalars = g_h_scalars
        split = bp_gens.split_table(n, m, pc_gens)
        if backend.mesh_shardable(len(scalars) + 2 * n * m, over_split=True):
            # Multi-chip: the whole mega-check goes to the mesh as one
            # sharded MSM (per-device Pippenger partials + collective).
            # over_split: abandoning the cached split table only pays above
            # a higher crossover than plain mesh sharding.
            split = None
        if split is not None:
            # Fixed-base part (G, H, B, B_blinding — all but ~m+4+2lg(nm)
            # points of the mega-check) through the cached native split
            # table: no per-verify generator list building/packing, and the
            # 64-bit-chunk MSM's combine chain is 64 not 252 doublings.
            mega_check = _split_mega_check(
                split, n * m, g_scalars, h_scalars, scalars, points, m
            )
        else:
            from ...utils.native import scalars_to_ints

            G = [g for j in range(m) for g in bp_gens.share(j).G(n)]
            H = [h for j in range(m) for h in bp_gens.share(j).H(n)]
            mega_check = _msm(
                scalars + scalars_to_ints(g_scalars) + scalars_to_ints(h_scalars),
                points + G + H,
            )
        if not mega_check.is_identity():
            raise VerificationError("range proof failed verification")

    def _verification_terms(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        value_commitments: list[StarkPoint],
        n: int,
    ):
        """Scalar derivation of the verification MSM.

        Returns ``((g_scalars, h_scalars), unique_scalars, unique_points)``
        where the g/h lists align with the aggregated generator vectors —
        the split lets :meth:`verify_batch` merge generator coefficients
        across proofs into one MSM.
        """
        m = len(value_commitments)
        if n <= 0 or (n & (n - 1)) or bp_gens.gens_capacity < n:
            raise VerificationError("invalid bitsize")
        if m <= 0 or (m & (m - 1)) or bp_gens.party_capacity < m:
            raise VerificationError("invalid aggregation size")

        t = transcript
        t.rangeproof_domain_sep(n, m)
        for V in value_commitments:
            t.append_point(b"V", V)
        t.validate_and_append_point(b"A", self.A)
        t.validate_and_append_point(b"S", self.S)
        y = t.challenge_scalar(b"y")
        z = t.challenge_scalar(b"z")
        t.validate_and_append_point(b"T_1", self.T_1)
        t.validate_and_append_point(b"T_2", self.T_2)
        x = t.challenge_scalar(b"x")
        t.append_scalar(b"t_x", self.t_x)
        t.append_scalar(b"t_x_blinding", self.t_x_blinding)
        t.append_scalar(b"e_blinding", self.e_blinding)
        w = t.challenge_scalar(b"w")

        # Scalar bookkeeping below runs on raw ints (the MSM backends accept
        # them directly); only the group ops stay in point types.
        MOD = Scalar.MODULUS
        a, b = int(self.ipp_proof.a), int(self.ipp_proof.b)
        yv, zv, xv, wv = int(y), int(z), int(x), int(w)
        t_x, t_x_blinding, e_blinding = (
            int(self.t_x), int(self.t_x_blinding), int(self.e_blinding),
        )
        zz = zv * zv % MOD

        from ...utils import native

        if native.available():
            # ONE native pass: IPP transcript replay (L/R absorbs + u_j and
            # c challenges), batch inversion, and the O(nm) vector
            # derivation (s, y^-i, z^{2+j} 2^i) — bp_rp_verify_terms.
            lg_n = len(self.ipp_proof.L_vec)
            if lg_n >= 32 or n * m != (1 << lg_n):
                raise VerificationError("length mismatch with proof")
            g_scalars, h_scalars, u_sq, u_inv_sq, c = native.rp_verify_terms(
                t, self.ipp_proof.L_vec, self.ipp_proof.R_vec,
                yv, zv, a, b, n, m,
            )
        else:
            u_sq, u_inv_sq, s_sc = self.ipp_proof.verification_scalars(n * m, t)
            s = [int(v) for v in s_sc]
            s_inv = list(reversed(s))
            # Random combination weight for the two verification equations.
            c = int(t.challenge_scalar(b"c"))

            y_inv = pow(yv, -1, MOD)
            y_inv_pows = [1] * (n * m)
            for i in range(1, n * m):
                y_inv_pows[i] = y_inv_pows[i - 1] * y_inv % MOD
            # concat of z^{2+j} 2^i over blocks
            z_and_2 = [0] * (n * m)
            exp_z = zz
            for j in range(m):
                exp_2 = exp_z
                for i in range(n):
                    z_and_2[j * n + i] = exp_2
                    exp_2 = exp_2 * 2 % MOD
                exp_z = exp_z * zv % MOD

            g_scalars = [(-zv - a * s_i) % MOD for s_i in s]
            h_scalars = [
                (zv + y_inv_pows[i] * (z_and_2[i] - b * s_inv[i])) % MOD
                for i in range(n * m)
            ]

        # delta(y, z) = (z - z^2) <1, y^{nm}> - sum_j z^{j+3} <1, 2^n>
        sum_y = int(sum_of_powers(y, n * m))
        sum_2 = (1 << n) - 1
        sum_z = int(sum_of_powers(z, m))
        delta = ((zv - zz) * sum_y - zv * zz % MOD * sum_z % MOD * sum_2) % MOD

        basepoint_scalar = (wv * (t_x - a * b) + c * (delta - t_x)) % MOD
        value_commitment_scalars = []
        exp_z = c * zz % MOD
        for _ in range(m):
            value_commitment_scalars.append(exp_z)
            exp_z = exp_z * zv % MOD

        scalars = (
            [1, xv, c * xv % MOD, c * xv % MOD * xv % MOD]
            + value_commitment_scalars
            + [basepoint_scalar]
            + [(-e_blinding - c * t_x_blinding) % MOD]
            + [int(u) for u in u_sq]
            + [int(u) for u in u_inv_sq]
        )
        points = (
            [self.A, self.S, self.T_1, self.T_2]
            + value_commitments
            + [pc_gens.B, pc_gens.B_blinding]
            + self.ipp_proof.L_vec
            + self.ipp_proof.R_vec
        )
        return (g_scalars, h_scalars), scalars, points

    def verify_single(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        V: StarkPoint,
        n: int,
    ) -> None:
        self.verify_multiple(bp_gens, pc_gens, transcript, [V], n)

    @staticmethod
    def verify_batch(
        proofs: list["RangeProof"],
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcripts: list[HashChainTranscript],
        commitment_lists: list[list[StarkPoint]],
        n: int,
    ) -> None:
        """Verify many independent proofs with ONE multiscalar multiplication.

        Each proof's verification equation is weighted by an independent
        random scalar and summed; the coefficients of the shared generator
        vectors (and B, B_blinding) collapse, so the MSM size is
        ``2 n m + sum_k (11 + m + 2 log(nm))`` instead of ``k`` full checks.
        A capability beyond the reference (batch-verification throughput for
        verifier-heavy deployments).  Raises :class:`VerificationError` if
        the batch fails (callers fall back to per-proof verification to
        identify culprits).
        """
        import secrets as _secrets

        if not (len(proofs) == len(transcripts) == len(commitment_lists)):
            raise VerificationError("batch length mismatch")
        if not proofs:
            return
        m = len(commitment_lists[0])
        if any(len(cl) != m for cl in commitment_lists):
            raise VerificationError("batch requires a uniform aggregation size")

        MOD = Scalar.MODULUS
        nm = n * m
        g_acc = [0] * nm
        h_acc = [0] * nm
        b_acc = 0
        bb_acc = 0
        uniq_scalars: list[int] = []
        uniq_points: list[StarkPoint] = []

        from ...utils.native import scalars_to_ints

        for proof, transcript, comms in zip(proofs, transcripts, commitment_lists):
            (g_sc, h_sc), scalars, points = proof._verification_terms(
                bp_gens, pc_gens, transcript, comms, n
            )
            g_sc, h_sc = scalars_to_ints(g_sc), scalars_to_ints(h_sc)
            rho = int.from_bytes(_secrets.token_bytes(32), "big") % MOD
            for i in range(nm):
                g_acc[i] = (g_acc[i] + rho * g_sc[i]) % MOD
                h_acc[i] = (h_acc[i] + rho * h_sc[i]) % MOD
            # points layout: [A, S, T1, T2, V..., B, B_blinding, L..., R...]
            b_idx = 4 + m
            for idx, (s, p) in enumerate(zip(scalars, points)):
                if idx == b_idx:
                    b_acc = (b_acc + rho * s) % MOD
                elif idx == b_idx + 1:
                    bb_acc = (bb_acc + rho * s) % MOD
                else:
                    uniq_scalars.append(rho * s % MOD)
                    uniq_points.append(p)

        split = bp_gens.split_table(n, m, pc_gens)
        if backend.mesh_shardable(len(uniq_scalars) + 2 + 2 * nm, over_split=True):
            split = None  # route the whole batched mega-check to the mesh
        if split is not None:
            import numpy as np

            table, g_off, h_off, b_idx, bb_idx = split
            idx = np.concatenate(
                [
                    np.arange(g_off, g_off + nm, dtype=np.uint32),
                    np.arange(h_off, h_off + nm, dtype=np.uint32),
                    np.asarray([b_idx, bb_idx], dtype=np.uint32),
                ]
            )
            mega = table.msm(g_acc + h_acc + [b_acc, bb_acc], idx) + _msm(
                uniq_scalars, uniq_points
            )
        else:
            G = [g for j in range(m) for g in bp_gens.share(j).G(n)]
            H = [h for j in range(m) for h in bp_gens.share(j).H(n)]
            mega = _msm(
                uniq_scalars + [b_acc, bb_acc] + g_acc + h_acc,
                uniq_points + [pc_gens.B, pc_gens.B_blinding] + G + H,
            )
        if not mega.is_identity():
            raise VerificationError("batch verification failed")

    # ------------------------------------------------------------------
    # codec: (9 + 2k) 32-byte elements
    # ------------------------------------------------------------------

    def serialized_size(self) -> int:
        return 4 * STARK_POINT_BYTES + 3 * SCALAR_BYTES + self.ipp_proof.serialized_size()

    def to_bytes(self) -> bytes:
        buf = bytearray()
        for p in (self.A, self.S, self.T_1, self.T_2):
            buf += p.to_bytes()
        buf += self.t_x.to_bytes_be()
        buf += self.t_x_blinding.to_bytes_be()
        buf += self.e_blinding.to_bytes_be()
        buf += self.ipp_proof.to_bytes()
        return bytes(buf)

    @staticmethod
    def from_bytes(data: bytes) -> "RangeProof":
        if len(data) % 32 != 0 or len(data) < 7 * 32:
            raise FormatError("bad range proof length")
        try:
            A = StarkPoint.from_bytes(data[0:32])
            S = StarkPoint.from_bytes(data[32:64])
            T_1 = StarkPoint.from_bytes(data[64:96])
            T_2 = StarkPoint.from_bytes(data[96:128])
        except ValueError as exc:
            raise FormatError(str(exc)) from exc
        t_x = Scalar.from_be_bytes_mod_order(data[128:160])
        t_x_blinding = Scalar.from_be_bytes_mod_order(data[160:192])
        e_blinding = Scalar.from_be_bytes_mod_order(data[192:224])
        ipp = InnerProductProof.from_bytes(data[224:])
        return RangeProof(A, S, T_1, T_2, t_x, t_x_blinding, e_blinding, ipp)

    def __eq__(self, other):
        return isinstance(other, RangeProof) and self.to_bytes() == other.to_bytes()


def _prove_multiple_native(dealer, bp_gens, pc_gens, values, blindings, n):
    """Aggregated proving with the party compute phases batched into the
    native core (same protocol/transcript as the party/dealer state
    machines — one call per phase across all parties, C++ threads)."""
    import secrets

    from ...utils import native
    from .messages import BitCommitment, PolyCommitment, ProofShare

    m = len(values)
    MOD = Scalar.MODULUS
    values = [int(v) for v in values]
    for v in values:
        if not (0 <= v < (1 << n)):
            raise MPCError("value out of range for bitsize")

    def rnd():
        return int.from_bytes(secrets.token_bytes(48), "big") % MOD

    a_blinds = [rnd() for _ in range(m)]
    s_blinds = [rnd() for _ in range(m)]
    sL = [rnd() for _ in range(m * n)]
    sR = [rnd() for _ in range(m * n)]
    sL_pack = native._pack_scalars(sL)
    sR_pack = native._pack_scalars(sR)
    sb_pack = native._pack_scalars(s_blinds)

    V = pc_gens.commit_batch([Scalar(v) for v in values], list(blindings))
    ab_pts = native.fixed_base_mul([Scalar(x) for x in a_blinds], pc_gens.B_blinding)
    ab_pack = native._pack_points(ab_pts)

    split = bp_gens.split_table(n, m, pc_gens)
    if split is not None:
        table, g_off, h_off, _b, bb_idx = split
        A_list, S_list = native.rp_phase1_table(
            m, n, values, sb_pack, sL_pack, sR_pack,
            table, g_off, h_off, bb_idx, ab_pack,
        )
    else:
        g_pack, h_pack = bp_gens.packed_aggregate(n, m)
        A_list, S_list = native.rp_phase1(
            m, n, values, sb_pack, sL_pack, sR_pack, g_pack, h_pack, ab_pack,
            pc_gens.B_blinding,
        )
    bcs = [BitCommitment(V[j], A_list[j], S_list[j]) for j in range(m)]
    dealer, bit_challenge = dealer.receive_bit_commitments(bcs)
    y, z = bit_challenge.y, bit_challenge.z

    t012, l0, l1, r0, r1 = native.rp_phase2(m, n, values, y, z, sL_pack, sR_pack)
    t_coeffs = []
    for j in range(m):
        row = t012[j].tobytes()
        t_coeffs.append(tuple(
            Scalar(int.from_bytes(row[32 * k:32 * k + 32], "little"))
            for k in range(3)
        ))
    t_blinds = [(rnd(), rnd()) for _ in range(m)]
    T_pts = pc_gens.commit_batch(
        [t_coeffs[j][1] for j in range(m)] + [t_coeffs[j][2] for j in range(m)],
        [Scalar(t_blinds[j][0]) for j in range(m)]
        + [Scalar(t_blinds[j][1]) for j in range(m)],
    )
    pcs = [PolyCommitment(T_pts[j], T_pts[m + j]) for j in range(m)]
    dealer, poly_challenge = dealer.receive_poly_commitments(pcs)
    x = poly_challenge.x

    out_l, out_r = native.rp_phase3(m, n, x, l0, l1, r0, r1)
    zz = z * z
    shares = []
    for j in range(m):
        t0, t1, t2 = t_coeffs[j]
        t1b, t2b = t_blinds[j]
        offset_zz = zz * Scalar(pow(z.value, j, MOD))
        row_l = out_l[j * n:(j + 1) * n].tobytes()
        row_r = out_r[j * n:(j + 1) * n].tobytes()
        shares.append(ProofShare(
            t_x=t0 + x * (t1 + x * t2),
            t_x_blinding=offset_zz * blindings[j] + x * (Scalar(t1b) + x * Scalar(t2b)),
            e_blinding=Scalar(a_blinds[j]) + x * Scalar(s_blinds[j]),
            l_vec=[Scalar(int.from_bytes(row_l[32 * i:32 * i + 32], "little")) for i in range(n)],
            r_vec=[Scalar(int.from_bytes(row_r[32 * i:32 * i + 32], "little")) for i in range(n)],
        ))
    proof = dealer.receive_trusted_shares(shares)
    return proof, V
