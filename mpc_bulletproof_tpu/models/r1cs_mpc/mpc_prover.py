"""The collaborative R1CS prover (reference src/r1cs_mpc/mpc_prover.rs).

One instance runs per party; both execute the identical protocol sequence
against the shared fabric.  The pipeline mirrors the single prover
(§3.1 of SURVEY.md) with communication at exactly the opening sites the
reference enumerates (§3.3): share distribution in ``commit``, three
phase-1 point openings, a batched phase-2 opening, one Beaver round for
the whole t-polynomial, the T-commitment opening, the t_x batch opening,
and two point openings per IPP round.
"""

from __future__ import annotations

from ...generators import BulletproofGens, PedersenGens
from ...ops.curve import StarkPoint
from ...ops.field import Scalar, scalar_powers
from ...parallel.fabric import AuthenticatedScalarVector, MpcFabric
from ...transcript import HashChainTranscript, MpcTranscript
from ...utils.errors import (
    InvalidGeneratorsLengthError,
    MissingAssignmentError,
    MultiproverError,
)
from ..r1cs.linear_combination import (
    COMMITTED,
    MULT_LEFT,
    MULT_OUT,
    MULT_RIGHT,
    ONE,
    LinearCombination,
    Variable,
)
from .authenticated_poly import AuthenticatedPoly6, AuthenticatedVecPoly3
from .mpc_constraint_system import MpcRandomizableConstraintSystem, MpcRandomizedConstraintSystem
from .mpc_inner_product import SharedInnerProductProof
from .proof import PartiallySharedR1CSProof


class MpcProver(MpcRandomizableConstraintSystem):
    def __init__(
        self,
        fabric: MpcFabric,
        pc_gens: PedersenGens,
        transcript: HashChainTranscript,
    ):
        transcript.r1cs_domain_sep()
        self.fabric = fabric
        self.pc_gens = pc_gens
        self._transcript = MpcTranscript(transcript)
        self.constraints: list[LinearCombination] = []
        self.a_L: list[AuthenticatedScalarVector] = []
        self.a_R: list[AuthenticatedScalarVector] = []
        self.a_O: list[AuthenticatedScalarVector] = []
        self.v: list[AuthenticatedScalarVector] = []
        self.v_blinding: list[AuthenticatedScalarVector] = []
        self.deferred_constraints = []
        self.pending_multiplier: int | None = None

    @classmethod
    def new_with_network(cls, network, beaver_source, pc_gens, transcript):
        """Construct the fabric from a transport + pre-processing source
        (reference mpc_prover.rs:100-127 ``new_with_network``)."""
        return cls(MpcFabric(network, beaver_source), pc_gens, transcript)

    # -- MpcConstraintSystem -------------------------------------------------

    def party_id(self) -> int:
        return self.fabric.party_id

    def transcript(self) -> MpcTranscript:
        return self._transcript

    def num_constraints(self) -> int:
        return len(self.constraints)

    def num_multipliers(self) -> int:
        return len(self.a_O)

    def multiply(self, left, right):
        """One Beaver multiplication per gate (reference mpc_prover.rs:183-220)."""
        left = _lc(left)
        right = _lc(right)
        l_val = self.eval(left)
        r_val = self.eval(right)
        o_val = self.fabric.beaver_mul(l_val, r_val)

        i = len(self.a_L)
        l_var = Variable.multiplier_left(i)
        r_var = Variable.multiplier_right(i)
        o_var = Variable.multiplier_output(i)
        self.a_L.append(l_val)
        self.a_R.append(r_val)
        self.a_O.append(o_val)

        left = left.copy()
        right = right.copy()
        left.add_term(l_var, Scalar(-1))
        right.add_term(r_var, Scalar(-1))
        self.constrain(left)
        self.constrain(right)
        return l_var, r_var, o_var

    def allocate(self, assignment: AuthenticatedScalarVector | None) -> Variable:
        if assignment is None:
            raise MissingAssignmentError("MPC prover requires a shared assignment")
        if self.pending_multiplier is None:
            i = len(self.a_L)
            self.pending_multiplier = i
            self.a_L.append(assignment)
            self.a_R.append(self.fabric.zeros_authenticated(1))
            self.a_O.append(self.fabric.zeros_authenticated(1))
            return Variable.multiplier_left(i)
        i = self.pending_multiplier
        self.pending_multiplier = None
        self.a_R[i] = assignment
        self.a_O[i] = self.fabric.beaver_mul(self.a_L[i], assignment)
        return Variable.multiplier_right(i)

    def allocate_multiplier(self, input_assignments):
        if input_assignments is None:
            raise MissingAssignmentError("MPC prover requires shared assignments")
        l_val, r_val = input_assignments
        o_val = self.fabric.beaver_mul(l_val, r_val)
        i = len(self.a_L)
        self.a_L.append(l_val)
        self.a_R.append(r_val)
        self.a_O.append(o_val)
        return (
            Variable.multiplier_left(i),
            Variable.multiplier_right(i),
            Variable.multiplier_output(i),
        )

    def constrain(self, lc) -> None:
        self.constraints.append(_lc(lc))

    def eval(self, lc) -> AuthenticatedScalarVector:
        """Evaluate an LC to a shared scalar (reference mpc_prover.rs:538-553)."""
        acc = self.fabric.zeros_authenticated(1)
        const = Scalar(0)
        for var, coeff in _lc(lc).terms.items():
            if var.kind == MULT_LEFT:
                acc = acc + self.a_L[var.index].mul_public(coeff)
            elif var.kind == MULT_RIGHT:
                acc = acc + self.a_R[var.index].mul_public(coeff)
            elif var.kind == MULT_OUT:
                acc = acc + self.a_O[var.index].mul_public(coeff)
            elif var.kind == COMMITTED:
                acc = acc + self.v[var.index].mul_public(coeff)
            elif var.kind == ONE:
                const += coeff
        if not const.is_zero():
            acc = acc.add_public([const])
        return acc

    def specify_randomized_constraints(self, callback) -> None:
        self.deferred_constraints.append(callback)

    def constraints_satisfied(self) -> bool:
        """Open and check every constraint (debug helper; leaks evaluations)."""
        evals = AuthenticatedScalarVector.concat(
            [self.eval(c) for c in self.constraints]
        )
        return all(v.is_zero() for v in evals.open())

    # -- commitments ---------------------------------------------------------

    def batch_commit(self, owning_party: int, values, blindings, count: int | None = None):
        """Share + Pedersen-commit values owned by one party
        (reference mpc_prover.rs:375-395).

        The owner passes lists of Scalars; the other party passes ``None``
        values and the expected ``count``.
        Returns (commitments, variables).
        """
        if self.fabric.party_id == owning_party:
            k = len(values)
            flat = list(values) + list(blindings)
            shared = self.fabric.batch_share_scalars(flat, owning_party)
        else:
            if count is None:
                raise MultiproverError("non-owner must pass count")
            k = count
            shared = self.fabric.batch_share_scalars(None, owning_party, count=2 * k)
        v_shares = shared[:k]
        b_shares = shared[k:]
        return self._commit_shared_batch(v_shares, b_shares)

    def commit(self, owning_party: int, value, blinding):
        if self.fabric.party_id == owning_party:
            comms, variables = self.batch_commit(owning_party, [value], [blinding])
        else:
            comms, variables = self.batch_commit(owning_party, None, None, count=1)
        return comms[0], variables[0]

    def batch_commit_preshared(self, v_shares, b_shares):
        """Commit values for which parties already hold additive shares
        (reference mpc_prover.rs:402-456).  Accepts plain per-party share
        lists (authenticated on the fly) or authenticated vectors."""
        if not isinstance(v_shares, AuthenticatedScalarVector):
            v_shares = self.fabric.authenticate_preshared(list(v_shares))
        if not isinstance(b_shares, AuthenticatedScalarVector):
            b_shares = self.fabric.authenticate_preshared(list(b_shares))
        return self._commit_shared_batch(v_shares, b_shares)

    def commit_preshared(self, v_share: AuthenticatedScalarVector,
                         b_share: AuthenticatedScalarVector):
        comms, variables = self._commit_shared_batch(v_share, b_share)
        return comms[0], variables[0]

    def _commit_shared_batch(self, v_shares, b_shares):
        k = len(v_shares)
        pts = []
        for i in range(k):
            pts.append(
                self.fabric.shared_msm(
                    AuthenticatedScalarVector.concat([v_shares[i], b_shares[i]]),
                    [self.pc_gens.B, self.pc_gens.B_blinding],
                )
            )
        commitments = self.fabric.open_authenticated_points(pts)
        variables = []
        for i, V in enumerate(commitments):
            idx = len(self.v)
            self.v.append(v_shares[i])
            self.v_blinding.append(b_shares[i])
            self._transcript.append_point(b"V", V)
            variables.append(Variable.committed(idx))
        return commitments, variables

    # -- proving -------------------------------------------------------------

    def _flattened_constraints(self, z: Scalar):
        """Weights are public (coefficients and z are public) — identical to
        the single prover's fold (reference mpc_prover.rs:470-512)."""
        n = len(self.a_L)
        m = len(self.v)
        wL = [Scalar(0)] * n
        wR = [Scalar(0)] * n
        wO = [Scalar(0)] * n
        wV = [Scalar(0)] * m
        exp_z = z
        for lc in self.constraints:
            for var, coeff in lc.terms.items():
                if var.kind == MULT_LEFT:
                    wL[var.index] += exp_z * coeff
                elif var.kind == MULT_RIGHT:
                    wR[var.index] += exp_z * coeff
                elif var.kind == MULT_OUT:
                    wO[var.index] += exp_z * coeff
                elif var.kind == COMMITTED:
                    wV[var.index] -= exp_z * coeff
            exp_z = exp_z * z
        return wL, wR, wO, wV

    def _create_randomized_constraints(self):
        self.pending_multiplier = None
        if not self.deferred_constraints:
            self._transcript.r1cs_1phase_domain_sep()
            return
        self._transcript.r1cs_2phase_domain_sep()
        callbacks, self.deferred_constraints = self.deferred_constraints, []
        wrapped = RandomizingMpcProver(self)
        for cb in callbacks:
            cb(wrapped)

    def prove(self, bp_gens: BulletproofGens) -> PartiallySharedR1CSProof:
        """The collaborative proving pipeline (reference mpc_prover.rs:579-992)."""
        fabric = self.fabric
        t = self._transcript
        t.append_u64(b"m", len(self.v))

        n1 = len(self.a_L)
        if bp_gens.gens_capacity < n1:
            raise InvalidGeneratorsLengthError()
        gens = bp_gens.share(0)

        # Blinding factors come from pre-processing (mpc_prover.rs:602).
        blinders = fabric.random_shared_scalars_authenticated(3 + 2 * n1)
        i_blinding1, o_blinding1, s_blinding1 = blinders[0], blinders[1], blinders[2]
        s_L1 = blinders[3 : 3 + n1]
        s_R1 = blinders[3 + n1 :]

        B_b = self.pc_gens.B_blinding
        a_L_cat = AuthenticatedScalarVector.concat(self.a_L) if self.a_L else fabric.zeros_authenticated(0)
        a_R_cat = AuthenticatedScalarVector.concat(self.a_R) if self.a_R else fabric.zeros_authenticated(0)
        a_O_cat = AuthenticatedScalarVector.concat(self.a_O) if self.a_O else fabric.zeros_authenticated(0)

        A_I1_s = fabric.shared_msm(
            AuthenticatedScalarVector.concat([i_blinding1, a_L_cat, a_R_cat]),
            [B_b] + gens.G(n1) + gens.H(n1),
        )
        A_O1_s = fabric.shared_msm(
            AuthenticatedScalarVector.concat([o_blinding1, a_O_cat]),
            [B_b] + gens.G(n1),
        )
        S1_s = fabric.shared_msm(
            AuthenticatedScalarVector.concat([s_blinding1, s_L1, s_R1]),
            [B_b] + gens.G(n1) + gens.H(n1),
        )
        A_I1, A_O1, S1 = fabric.open_authenticated_points([A_I1_s, A_O1_s, S1_s])
        t.append_point(b"A_I1", A_I1)
        t.append_point(b"A_O1", A_O1)
        t.append_point(b"S1", S1)

        self._create_randomized_constraints()

        n = len(self.a_L)
        n2 = n - n1
        padded_n = 1 if n == 0 else 1 << (n - 1).bit_length()
        pad = padded_n - n
        if bp_gens.gens_capacity < padded_n:
            raise InvalidGeneratorsLengthError()

        has_phase2 = n2 > 0
        if has_phase2:
            blinders2 = fabric.random_shared_scalars_authenticated(3 + 2 * n2)
            i_blinding2, o_blinding2, s_blinding2 = blinders2[0], blinders2[1], blinders2[2]
            s_L2 = blinders2[3 : 3 + n2]
            s_R2 = blinders2[3 + n2 :]
            a_L2 = AuthenticatedScalarVector.concat(self.a_L[n1:])
            a_R2 = AuthenticatedScalarVector.concat(self.a_R[n1:])
            a_O2c = AuthenticatedScalarVector.concat(self.a_O[n1:])
            A_I2_s = fabric.shared_msm(
                AuthenticatedScalarVector.concat([i_blinding2, a_L2, a_R2]),
                [B_b] + gens.G(n)[n1:] + gens.H(n)[n1:],
            )
            A_O2_s = fabric.shared_msm(
                AuthenticatedScalarVector.concat([o_blinding2, a_O2c]),
                [B_b] + gens.G(n)[n1:],
            )
            S2_s = fabric.shared_msm(
                AuthenticatedScalarVector.concat([s_blinding2, s_L2, s_R2]),
                [B_b] + gens.G(n)[n1:] + gens.H(n)[n1:],
            )
            A_I2, A_O2, S2 = fabric.open_authenticated_points([A_I2_s, A_O2_s, S2_s])
        else:
            i_blinding2 = o_blinding2 = s_blinding2 = fabric.zeros_authenticated(1)
            s_L2 = fabric.zeros_authenticated(0)
            s_R2 = fabric.zeros_authenticated(0)
            A_I2 = A_O2 = S2 = StarkPoint.identity()

        t.append_point(b"A_I2", A_I2)
        t.append_point(b"A_O2", A_O2)
        t.append_point(b"S2", S2)

        y = t.challenge_scalar(b"y")
        z = t.challenge_scalar(b"z")

        wL, wR, wO, wV = self._flattened_constraints(z)

        y_inv = y.inverse()
        exp_y_inv = scalar_powers(y_inv, padded_n)
        y_pows = scalar_powers(y, padded_n)

        a_L_vec = a_L_cat if n1 == n else AuthenticatedScalarVector.concat(self.a_L)
        a_R_vec = a_R_cat if n1 == n else AuthenticatedScalarVector.concat(self.a_R)
        a_O_vec = a_O_cat if n1 == n else AuthenticatedScalarVector.concat(self.a_O)
        sL = AuthenticatedScalarVector.concat([s_L1, s_L2]) if n2 else s_L1
        sR = AuthenticatedScalarVector.concat([s_R1, s_R2]) if n2 else s_R1

        # l_poly / r_poly over shares; all linear, hence local.
        zeros = fabric.zeros_authenticated(n)
        l1 = a_L_vec.add_public([exp_y_inv[i] * wR[i] for i in range(n)])
        l2 = a_O_vec
        l3 = sL
        r0 = zeros.add_public([wO[i] - y_pows[i] for i in range(n)])
        r1 = a_R_vec.mul_public(y_pows[:n]).add_public(wL[:n])
        r3 = sR.mul_public(y_pows[:n])
        l_poly = AuthenticatedVecPoly3(zeros, l1, l2, l3)
        r_poly = AuthenticatedVecPoly3(r0, r1, zeros, r3)

        t_poly = AuthenticatedVecPoly3.special_inner_product(l_poly, r_poly)

        t_blinders = fabric.random_shared_scalars_authenticated(5)
        T_shared = []
        for coeff, blind_idx in (
            (t_poly.t1, 0), (t_poly.t3, 1), (t_poly.t4, 2),
            (t_poly.t5, 3), (t_poly.t6, 4),
        ):
            T_shared.append(
                fabric.shared_msm(
                    AuthenticatedScalarVector.concat([coeff, t_blinders[blind_idx]]),
                    [self.pc_gens.B, self.pc_gens.B_blinding],
                )
            )
        T_1, T_3, T_4, T_5, T_6 = fabric.open_authenticated_points(T_shared)
        t.append_point(b"T_1", T_1)
        t.append_point(b"T_3", T_3)
        t.append_point(b"T_4", T_4)
        t.append_point(b"T_5", T_5)
        t.append_point(b"T_6", T_6)

        u = t.challenge_scalar(b"u")
        x = t.challenge_scalar(b"x")

        # t_2_blinding = <wV, v_blinding> over shares (wV public).
        t_2_blinding = fabric.zeros_authenticated(1)
        for c, vb in zip(wV, self.v_blinding):
            t_2_blinding = t_2_blinding + vb.mul_public(c)

        t_blinding_poly = AuthenticatedPoly6(
            t_blinders[0], t_2_blinding, t_blinders[1],
            t_blinders[2], t_blinders[3], t_blinders[4],
        )

        t_x = t_poly.eval(x)
        t_x_blinding = t_blinding_poly.eval(x)
        l_vec = l_poly.eval(x)
        r_vec = r_poly.eval(x)
        if pad:
            l_vec = AuthenticatedScalarVector.concat([l_vec, fabric.zeros_authenticated(pad)])
            r_pad = fabric.zeros_authenticated(pad).add_public(
                [-y_pows[i] for i in range(n, padded_n)]
            )
            r_vec = AuthenticatedScalarVector.concat([r_vec, r_pad])

        i_blinding = i_blinding1 + i_blinding2.mul_public(u)
        o_blinding = o_blinding1 + o_blinding2.mul_public(u)
        s_blinding = s_blinding1 + s_blinding2.mul_public(u)
        e_blinding = (
            i_blinding + (o_blinding + s_blinding.mul_public(x)).mul_public(x)
        ).mul_public(x)

        opened = fabric.open_authenticated_batch(
            AuthenticatedScalarVector.concat([t_x, t_x_blinding, e_blinding])
        )
        t_x_o, t_x_blinding_o, e_blinding_o = opened
        t.append_scalar(b"t_x", t_x_o)
        t.append_scalar(b"t_x_blinding", t_x_blinding_o)
        t.append_scalar(b"e_blinding", e_blinding_o)

        w = t.challenge_scalar(b"w")
        Q = w * self.pc_gens.B

        G_factors = [Scalar(1)] * n1 + [u] * (n2 + pad)
        H_factors = [yi * uf for yi, uf in zip(exp_y_inv, G_factors)]

        ipp = SharedInnerProductProof.create(
            t, Q, G_factors, H_factors,
            gens.G(padded_n), gens.H(padded_n), l_vec, r_vec, fabric,
        )

        return PartiallySharedR1CSProof(
            A_I1=A_I1, A_O1=A_O1, S1=S1,
            A_I2=A_I2, A_O2=A_O2, S2=S2,
            T_1=T_1, T_3=T_3, T_4=T_4, T_5=T_5, T_6=T_6,
            t_x=t_x_o, t_x_blinding=t_x_blinding_o, e_blinding=e_blinding_o,
            ipp_proof=ipp,
        )


class RandomizingMpcProver(MpcRandomizedConstraintSystem):
    """Second-phase view of the collaborative prover."""

    def __init__(self, prover: MpcProver):
        self.prover = prover

    def transcript(self):
        return self.prover.transcript()

    def num_constraints(self):
        return self.prover.num_constraints()

    def num_multipliers(self):
        return self.prover.num_multipliers()

    def multiply(self, left, right):
        return self.prover.multiply(left, right)

    def allocate(self, assignment):
        return self.prover.allocate(assignment)

    def allocate_multiplier(self, input_assignments):
        return self.prover.allocate_multiplier(input_assignments)

    def constrain(self, lc):
        self.prover.constrain(lc)

    def eval(self, lc):
        return self.prover.eval(lc)

    def challenge_scalar(self, label: bytes) -> Scalar:
        return self.prover._transcript.challenge_scalar(label)


def _lc(v) -> LinearCombination:
    from ..r1cs.linear_combination import _as_lc

    return _as_lc(v)
