"""Inner-product argument over secret-shared witness vectors.

Mirrors reference src/r1cs_mpc/mpc_inner_product.rs: the structure is the
plain IPP, but ``a``/``b`` are authenticated shares; per round the cross
inner products are Beaver multiplications, L/R are share-MSMs over the
public generators, and **L/R are opened every round** so both parties'
transcripts stay identical (reference comment :128-131, :188-191).  The
final ``a``, ``b`` stay shared until :meth:`SharedInnerProductProof.open`
performs the MAC-checked opening.
"""

from __future__ import annotations

from ...ops.curve import StarkPoint
from ...ops.field import Scalar
from ...parallel.fabric import AuthenticatedScalarVector, MpcFabric
from ...transcript import MpcTranscript
from ...utils.errors import MultiproverError
from ..inner_product import InnerProductProof


class SharedInnerProductProof:
    def __init__(self, L_vec, R_vec, a, b, fabric):
        self.L_vec: list[StarkPoint] = L_vec  # opened during the protocol
        self.R_vec: list[StarkPoint] = R_vec
        self.a: AuthenticatedScalarVector = a  # still shared (length 1)
        self.b: AuthenticatedScalarVector = b
        self.fabric = fabric

    @staticmethod
    def create(
        transcript: MpcTranscript,
        Q: StarkPoint,
        G_factors: list[Scalar],
        H_factors: list[Scalar],
        G: list[StarkPoint],
        H: list[StarkPoint],
        a: AuthenticatedScalarVector,
        b: AuthenticatedScalarVector,
        fabric: MpcFabric,
    ) -> "SharedInnerProductProof":
        n = len(G)
        if not (len(H) == len(a) == len(b) == len(G_factors) == len(H_factors) == n):
            raise MultiproverError("IPP input vectors must share one length")
        if n & (n - 1):
            raise MultiproverError("IPP length must be a power of two")

        transcript.innerproduct_domain_sep(n)

        G = list(G)
        H = list(H)
        L_vec: list[StarkPoint] = []
        R_vec: list[StarkPoint] = []

        first = True
        while n > 1:
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            G_L, G_R = G[:n], G[n:]
            H_L, H_R = H[:n], H[n:]

            # Cross inner products: one batched Beaver round for both.
            prods = fabric.beaver_mul(
                AuthenticatedScalarVector.concat([a_L, a_R]),
                AuthenticatedScalarVector.concat([b_R, b_L]),
            )
            c_L = prods[:n].sum()
            c_R = prods[n:].sum()

            if first:
                sL = a_L.mul_public(G_factors[n : 2 * n])
                sLh = b_R.mul_public(H_factors[:n])
                sR = a_R.mul_public(G_factors[:n])
                sRh = b_L.mul_public(H_factors[n : 2 * n])
            else:
                sL, sLh, sR, sRh = a_L, b_R, a_R, b_L

            # Generators are public: the MSM itself needs no communication.
            L_shared = fabric.shared_msm(
                AuthenticatedScalarVector.concat([sL, sLh, c_L]),
                G_R + H_L + [Q],
            )
            R_shared = fabric.shared_msm(
                AuthenticatedScalarVector.concat([sR, sRh, c_R]),
                G_L + H_R + [Q],
            )
            # Open L/R every round to keep the two transcripts identical.
            L, R = fabric.open_authenticated_points([L_shared, R_shared])
            L_vec.append(L)
            R_vec.append(R)
            transcript.append_point(b"L", L)
            transcript.append_point(b"R", R)

            u = transcript.challenge_scalar(b"u")
            u_inv = u.inverse()

            a = a_L.mul_public(u) + a_R.mul_public(u_inv)
            b = b_L.mul_public(u_inv) + b_R.mul_public(u)
            if first:
                G = [
                    StarkPoint.msm(
                        [u_inv * G_factors[i], u * G_factors[n + i]],
                        [G_L[i], G_R[i]],
                    )
                    for i in range(n)
                ]
                H = [
                    StarkPoint.msm(
                        [u * H_factors[i], u_inv * H_factors[n + i]],
                        [H_L[i], H_R[i]],
                    )
                    for i in range(n)
                ]
                first = False
            else:
                G = [StarkPoint.msm([u_inv, u], [G_L[i], G_R[i]]) for i in range(n)]
                H = [StarkPoint.msm([u, u_inv], [H_L[i], H_R[i]]) for i in range(n)]

        return SharedInnerProductProof(L_vec, R_vec, a, b, fabric)

    def open(self) -> InnerProductProof:
        """MAC-checked opening of the shared tail (reference :245-271).

        Raises :class:`AuthenticationError` if a party malleated its share.
        """
        opened = self.fabric.open_authenticated_batch(
            AuthenticatedScalarVector.concat([self.a, self.b])
        )
        return InnerProductProof(self.L_vec, self.R_vec, opened[0], opened[1])
