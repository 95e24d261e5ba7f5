"""Dealer side of the aggregated range-proof protocol.

Per reference docs/range-proof-protocol.md: the dealer owns the Fiat-Shamir
transcript, aggregates party commitments, issues challenges, validates
proof shares, and assembles the final :class:`RangeProof` (running the
inner-product argument over the concatenated l, r vectors).
"""

from __future__ import annotations

from ...generators import BulletproofGens, PedersenGens
from ...ops.curve import StarkPoint
from ...ops.field import Scalar, inner_product, scalar_powers, sum_of_powers
from ...transcript import HashChainTranscript
from ...utils.errors import MPCError
from ..inner_product import InnerProductProof
from .messages import BitChallenge, BitCommitment, PolyChallenge, PolyCommitment, ProofShare


class Dealer:
    @staticmethod
    def new(
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
        n: int,
        m: int,
    ) -> "DealerAwaitingBitCommitments":
        if n <= 0 or (n & (n - 1)):
            raise MPCError(f"invalid bitsize {n}")
        if m <= 0 or (m & (m - 1)):
            raise MPCError(f"invalid aggregation size {m}")
        if bp_gens.gens_capacity < n:
            raise MPCError("generator capacity too small for bitsize")
        if bp_gens.party_capacity < m:
            raise MPCError("generator party capacity too small")
        transcript.rangeproof_domain_sep(n, m)
        return DealerAwaitingBitCommitments(bp_gens, pc_gens, transcript, n, m)


class DealerAwaitingBitCommitments:
    def __init__(self, bp_gens, pc_gens, transcript, n, m):
        self.bp_gens = bp_gens
        self.pc_gens = pc_gens
        self.transcript = transcript
        self.n = n
        self.m = m

    def receive_bit_commitments(
        self, bit_commitments: list[BitCommitment]
    ) -> tuple["DealerAwaitingPolyCommitments", BitChallenge]:
        if len(bit_commitments) != self.m:
            raise MPCError("wrong number of bit commitments")
        t = self.transcript
        for vc in bit_commitments:
            t.append_point(b"V", vc.V_j)

        A = StarkPoint.identity()
        S = StarkPoint.identity()
        for vc in bit_commitments:
            A = A + vc.A_j
            S = S + vc.S_j
        t.append_point(b"A", A)
        t.append_point(b"S", S)

        y = t.challenge_scalar(b"y")
        z = t.challenge_scalar(b"z")
        challenge = BitChallenge(y, z)
        next_state = DealerAwaitingPolyCommitments(
            self, bit_commitments, A, S, challenge
        )
        return next_state, challenge


class DealerAwaitingPolyCommitments:
    def __init__(self, base: DealerAwaitingBitCommitments, bit_commitments, A, S, bit_challenge):
        self.bp_gens = base.bp_gens
        self.pc_gens = base.pc_gens
        self.transcript = base.transcript
        self.n = base.n
        self.m = base.m
        self.bit_commitments = bit_commitments
        self.A = A
        self.S = S
        self.bit_challenge = bit_challenge

    def receive_poly_commitments(
        self, poly_commitments: list[PolyCommitment]
    ) -> tuple["DealerAwaitingProofShares", PolyChallenge]:
        if len(poly_commitments) != self.m:
            raise MPCError("wrong number of poly commitments")
        t = self.transcript
        T_1 = StarkPoint.identity()
        T_2 = StarkPoint.identity()
        for pc in poly_commitments:
            T_1 = T_1 + pc.T_1_j
            T_2 = T_2 + pc.T_2_j
        t.append_point(b"T_1", T_1)
        t.append_point(b"T_2", T_2)
        x = t.challenge_scalar(b"x")
        challenge = PolyChallenge(x)
        return (
            DealerAwaitingProofShares(self, poly_commitments, T_1, T_2, challenge),
            challenge,
        )


class DealerAwaitingProofShares:
    def __init__(self, base: DealerAwaitingPolyCommitments, poly_commitments, T_1, T_2, poly_challenge):
        self.bp_gens = base.bp_gens
        self.pc_gens = base.pc_gens
        self.transcript = base.transcript
        self.n = base.n
        self.m = base.m
        self.bit_commitments = base.bit_commitments
        self.bit_challenge = base.bit_challenge
        self.A = base.A
        self.S = base.S
        self.poly_commitments = poly_commitments
        self.T_1 = T_1
        self.T_2 = T_2
        self.poly_challenge = poly_challenge

    def _assemble_shares(self, proof_shares: list[ProofShare]):
        """Aggregate shares into a RangeProof (no per-share validation)."""
        from . import RangeProof  # local import to avoid cycle

        if len(proof_shares) != self.m:
            raise MPCError("wrong number of proof shares")
        t = self.transcript
        n, m = self.n, self.m

        t_x = Scalar(0)
        t_x_blinding = Scalar(0)
        e_blinding = Scalar(0)
        for ps in proof_shares:
            t_x += ps.t_x
            t_x_blinding += ps.t_x_blinding
            e_blinding += ps.e_blinding

        t.append_scalar(b"t_x", t_x)
        t.append_scalar(b"t_x_blinding", t_x_blinding)
        t.append_scalar(b"e_blinding", e_blinding)

        w = t.challenge_scalar(b"w")
        Q = w * self.pc_gens.B

        G_factors = [Scalar(1)] * (n * m)
        H_factors = scalar_powers(
            self.bit_challenge.y.inverse(), n * m
        )

        l_vec: list[Scalar] = []
        r_vec: list[Scalar] = []
        for ps in proof_shares:
            l_vec.extend(ps.l_vec)
            r_vec.extend(ps.r_vec)

        G = [g for j in range(m) for g in self.bp_gens.share(j).G(n)]
        H = [h for j in range(m) for h in self.bp_gens.share(j).H(n)]

        from ...utils import native

        table_ctx = None
        if native.available():
            split = self.bp_gens.split_table(n, m, self.pc_gens)
            if split is not None:
                table, g_off, h_off, b_idx, _bb = split
                table_ctx = (table, g_off, h_off, b_idx, w)
        ipp_proof = InnerProductProof.create(
            t, Q, G_factors, H_factors, G, H, l_vec, r_vec,
            table_ctx=table_ctx,
        )

        return RangeProof(
            A=self.A,
            S=self.S,
            T_1=self.T_1,
            T_2=self.T_2,
            t_x=t_x,
            t_x_blinding=t_x_blinding,
            e_blinding=e_blinding,
            ipp_proof=ipp_proof,
        )

    def receive_shares(self, proof_shares: list[ProofShare]):
        """Validate each share, then assemble (reference doc "Individual
        share validation").  Raises :class:`MPCError` naming bad parties."""
        bad = [
            j
            for j, ps in enumerate(proof_shares)
            if not self._share_is_valid(j, ps)
        ]
        if bad:
            raise MPCError(f"malformed proof shares from parties {bad}")
        return self._assemble_shares(proof_shares)

    def receive_trusted_shares(self, proof_shares: list[ProofShare]):
        """Assemble without per-share audit (fast path for honest parties)."""
        return self._assemble_shares(proof_shares)

    def _share_is_valid(self, j: int, ps: ProofShare) -> bool:
        """Audit one party's share via the three checks of the reference doc:
        t = <l, r>; the t-constant-term equation; and the l/r commitment
        equation — combined in one MSM with a random weight c."""
        n = self.n
        y, z = self.bit_challenge.y, self.bit_challenge.z
        x = self.poly_challenge.x
        if len(ps.l_vec) != n or len(ps.r_vec) != n:
            return False

        # check 1: t_(j)(x) = <l, r>
        if inner_product(ps.l_vec, ps.r_vec) != ps.t_x:
            return False

        bc = self.bit_commitments[j]
        pcm = self.poly_commitments[j]
        c = Scalar.random()

        # delta_(j)(y,z) = (z - z^2) <1, y^n y^{jn}> - z^{j+3} <1, 2^n>
        offset_y = Scalar(pow(y.value, j * n, Scalar.MODULUS))
        zz = z * z
        z_j = Scalar(pow(z.value, j, Scalar.MODULUS))
        sum_y = sum_of_powers(y, n) * offset_y
        sum_2 = sum_of_powers(Scalar(2), n)
        delta = (z - zz) * sum_y - z * zz * z_j * sum_2

        share_gens = self.bp_gens.share(j)
        G_j = share_gens.G(n)
        H_j = share_gens.H(n)

        y_inv = y.inverse()
        offset_y_inv = Scalar(pow(y_inv.value, j * n, Scalar.MODULUS))
        y_inv_pows = scalar_powers(y_inv, n)

        g_scalars = [-z - l_i for l_i in ps.l_vec]
        h_scalars = []
        exp_2 = Scalar(1)
        for i in range(n):
            yinv_i = offset_y_inv * y_inv_pows[i]
            h_scalars.append(
                z + yinv_i * (zz * z_j * exp_2 - ps.r_vec[i])
            )
            exp_2 = exp_2 + exp_2

        scalars = (
            [Scalar(1), x]
            + [-ps.e_blinding - c * ps.t_x_blinding]
            + [c * (delta - ps.t_x)]
            + [c * zz * z_j, c * x, c * x * x]
            + g_scalars
            + h_scalars
        )
        points = (
            [bc.A_j, bc.S_j]
            + [self.pc_gens.B_blinding]
            + [self.pc_gens.B]
            + [bc.V_j, pcm.T_1_j, pcm.T_2_j]
            + G_j
            + H_j
        )
        return StarkPoint.msm(scalars, points).is_identity()
