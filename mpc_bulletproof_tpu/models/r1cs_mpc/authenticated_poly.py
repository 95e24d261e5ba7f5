"""Vector polynomials over authenticated shares (reference
src/r1cs_mpc/authenticated_poly.rs).

The degree-3 ``special_inner_product`` is the Beaver-heaviest step of the
collaborative prover (8n multiplications — SURVEY.md §7.3); here all nine
constituent elementwise products are concatenated into a **single** Beaver
round so the whole t-polynomial costs one communication round-trip.
"""

from __future__ import annotations

from ...ops.field import Scalar
from ...parallel.fabric import AuthenticatedScalarVector


class AuthenticatedVecPoly3:
    """l(x) = c0 + c1 x + c2 x^2 + c3 x^3 with shared coefficients."""

    def __init__(self, c0, c1, c2, c3):
        self.c0, self.c1, self.c2, self.c3 = c0, c1, c2, c3

    @staticmethod
    def zero(n: int, fabric) -> "AuthenticatedVecPoly3":
        return AuthenticatedVecPoly3(
            fabric.zeros_authenticated(n),
            fabric.zeros_authenticated(n),
            fabric.zeros_authenticated(n),
            fabric.zeros_authenticated(n),
        )

    @staticmethod
    def special_inner_product(lhs, rhs) -> "AuthenticatedPoly6":
        """t(x) coefficients assuming lhs.c0 == 0 and rhs.c2 == 0, in one
        Beaver round (reference authenticated_poly.rs:143-164)."""
        fabric = lhs.c1.fabric
        n = len(lhs.c1)
        pairs = [
            (lhs.c1, rhs.c0),  # t1
            (lhs.c1, rhs.c1),  # t2 (1/2)
            (lhs.c2, rhs.c0),  # t2 (2/2)
            (lhs.c2, rhs.c1),  # t3 (1/2)
            (lhs.c3, rhs.c0),  # t3 (2/2)
            (lhs.c1, rhs.c3),  # t4 (1/2)
            (lhs.c3, rhs.c1),  # t4 (2/2)
            (lhs.c2, rhs.c3),  # t5
            (lhs.c3, rhs.c3),  # t6
        ]
        x_cat = AuthenticatedScalarVector.concat([p[0] for p in pairs])
        y_cat = AuthenticatedScalarVector.concat([p[1] for p in pairs])

        from ...ops import backend

        if backend.use_device() and n >= 16:
            # Device data plane: the 9n elementwise products run as limb
            # tensors, the Beaver (d, e) opening ships raw int32 limbs, and
            # the block sums reduce on device; only the six t-coefficients
            # (6 scalars + MACs) return to host.
            from ...ops import limb
            from ...parallel.device_shares import DeviceShareVector

            dx = DeviceShareVector.from_host(x_cat)
            dy = DeviceShareVector.from_host(y_cat)
            dprods = dx.beaver_mul(dy)

            def block_sum(i):
                return dprods[i * n : (i + 1) * n].sum().to_host()

            t1 = block_sum(0)
            t2 = block_sum(1) + block_sum(2)
            t3 = block_sum(3) + block_sum(4)
            t4 = block_sum(5) + block_sum(6)
            t5 = block_sum(7)
            t6 = block_sum(8)
            return AuthenticatedPoly6(t1, t2, t3, t4, t5, t6)

        prods = fabric.beaver_mul(x_cat, y_cat)

        def block_sum(i):
            return prods[i * n : (i + 1) * n].sum()

        t1 = block_sum(0)
        t2 = block_sum(1) + block_sum(2)
        t3 = block_sum(3) + block_sum(4)
        t4 = block_sum(5) + block_sum(6)
        t5 = block_sum(7)
        t6 = block_sum(8)
        return AuthenticatedPoly6(t1, t2, t3, t4, t5, t6)

    def eval(self, x: Scalar) -> AuthenticatedScalarVector:
        """Horner evaluation at a public x (local; device limb tensors when
        the device backend is active and the vector is wide enough)."""
        from ...ops import backend

        n = len(self.c1)
        if backend.use_device() and n >= 16:
            from ...parallel.device_shares import DeviceShareVector

            d = [DeviceShareVector.from_host(c) for c in (self.c0, self.c1, self.c2, self.c3)]
            out = d[3].mul_public(x) + d[2]
            out = out.mul_public(x) + d[1]
            out = out.mul_public(x) + d[0]
            return out.to_host()
        out = self.c3.mul_public(x) + self.c2
        out = out.mul_public(x) + self.c1
        out = out.mul_public(x) + self.c0
        return out


class AuthenticatedPoly6:
    """t1 x + ... + t6 x^6 with shared coefficients (no constant term)."""

    def __init__(self, t1, t2, t3, t4, t5, t6):
        self.t1, self.t2, self.t3, self.t4, self.t5, self.t6 = t1, t2, t3, t4, t5, t6

    def eval(self, x: Scalar) -> AuthenticatedScalarVector:
        out = self.t6.mul_public(x) + self.t5
        out = out.mul_public(x) + self.t4
        out = out.mul_public(x) + self.t3
        out = out.mul_public(x) + self.t2
        out = out.mul_public(x) + self.t1
        return out.mul_public(x)
