"""The partially-shared R1CS proof (reference src/r1cs_mpc/proof.rs).

Every group element was already opened during the collaborative protocol
(the transcript needs them public); only the IPP tail ``a, b`` remains
secret-shared.  :meth:`open` performs the final MAC-checked opening and
yields a standard :class:`~mpc_bulletproof_tpu.models.r1cs.R1CSProof` that
the plain single-prover verifier accepts.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...ops.curve import StarkPoint
from ...ops.field import Scalar
from ..r1cs.proof import R1CSProof
from .mpc_inner_product import SharedInnerProductProof


@dataclass
class PartiallySharedR1CSProof:
    A_I1: StarkPoint
    A_O1: StarkPoint
    S1: StarkPoint
    A_I2: StarkPoint
    A_O2: StarkPoint
    S2: StarkPoint
    T_1: StarkPoint
    T_3: StarkPoint
    T_4: StarkPoint
    T_5: StarkPoint
    T_6: StarkPoint
    t_x: Scalar
    t_x_blinding: Scalar
    e_blinding: Scalar
    ipp_proof: SharedInnerProductProof

    def open(self) -> R1CSProof:
        """Open the shared IPP tail (authenticated) and assemble the plain
        proof (reference r1cs_mpc/proof.rs:57-82)."""
        ipp = self.ipp_proof.open()
        return R1CSProof(
            A_I1=self.A_I1, A_O1=self.A_O1, S1=self.S1,
            A_I2=self.A_I2, A_O2=self.A_O2, S2=self.S2,
            T_1=self.T_1, T_3=self.T_3, T_4=self.T_4, T_5=self.T_5, T_6=self.T_6,
            t_x=self.t_x, t_x_blinding=self.t_x_blinding,
            e_blinding=self.e_blinding, ipp_proof=ipp,
        )
