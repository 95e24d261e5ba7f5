"""Device-resident authenticated share vectors.

The BASELINE north star maps the MPC fabric onto TPUs: *additively-shared
scalars and Beaver-triple multiplications map onto share tensors, with
collectives / batched exchanges standing in for MPC network rounds*.  This
module is that data plane: a share vector lives on device as a pair of
``(NL, k)`` limb tensors (value shares + MAC shares); all linear algebra and
the local parts of Beaver multiplication are limb kernels
(:mod:`..ops.limb`), and the only host touch-points are the batched
openings, which ship the raw int32 limb tensors over the two-party link
(no per-element serialization).

Within one party's pod slice the share tensors shard over the mesh like any
other vector (``parallel/sharded.py``); the party-to-party exchange is the
DCN link.  The host-side
:class:`~mpc_bulletproof_tpu.parallel.fabric.AuthenticatedScalarVector`
remains the golden model; :meth:`DeviceShareVector.to_host` /
:meth:`from_host` convert between them.
"""

from __future__ import annotations

import numpy as np

from ..ops import limb
from ..ops.field import Scalar
from ..utils.errors import AuthenticationError, MPCError
from .fabric import AuthenticatedScalarVector, MpcFabric


def _limbs(values) -> np.ndarray:
    return limb.ints_to_limbs([int(v) for v in values])


class DeviceShareVector:
    """Authenticated secret shares as device limb tensors (this party's view)."""

    __slots__ = ("fabric", "shares", "macs")

    def __init__(self, fabric: MpcFabric, shares, macs):
        import jax.numpy as jnp

        self.fabric = fabric
        self.shares = jnp.asarray(shares)  # (NL, k)
        self.macs = jnp.asarray(macs)

    # -- conversion ---------------------------------------------------------

    @staticmethod
    def from_host(vec: AuthenticatedScalarVector) -> "DeviceShareVector":
        return DeviceShareVector(vec.fabric, _limbs(vec.shares), _limbs(vec.macs))

    def to_host(self) -> AuthenticatedScalarVector:
        shares = [Scalar(v) for v in limb.limbs_to_ints(np.asarray(self.shares))]
        macs = [Scalar(v) for v in limb.limbs_to_ints(np.asarray(self.macs))]
        return AuthenticatedScalarVector(self.fabric, shares, macs)

    def __len__(self) -> int:
        return int(self.shares.shape[-1])

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return DeviceShareVector(self.fabric, self.shares[:, idx], self.macs[:, idx])
        return DeviceShareVector(
            self.fabric, self.shares[:, idx : idx + 1], self.macs[:, idx : idx + 1]
        )

    @staticmethod
    def concat(parts) -> "DeviceShareVector":
        import jax.numpy as jnp

        parts = list(parts)
        return DeviceShareVector(
            parts[0].fabric,
            jnp.concatenate([p.shares for p in parts], axis=-1),
            jnp.concatenate([p.macs for p in parts], axis=-1),
        )

    # -- linear (local, on device) ------------------------------------------

    def __add__(self, other: "DeviceShareVector") -> "DeviceShareVector":
        return DeviceShareVector(
            self.fabric,
            limb.mod_add(self.shares, other.shares, limb.FR),
            limb.mod_add(self.macs, other.macs, limb.FR),
        )

    def __sub__(self, other: "DeviceShareVector") -> "DeviceShareVector":
        return DeviceShareVector(
            self.fabric,
            limb.mod_sub(self.shares, other.shares, limb.FR),
            limb.mod_sub(self.macs, other.macs, limb.FR),
        )

    def add_public(self, values) -> "DeviceShareVector":
        import jax.numpy as jnp

        pub = jnp.asarray(_limbs(values))
        alpha = jnp.asarray(limb.int_to_limbs_np(int(self.fabric.mac_key_share)))
        shares = self.shares
        if self.fabric.party_id == 0:
            shares = limb.mod_add(shares, pub, limb.FR)
        macs = limb.mod_add(self.macs, limb.mod_mul(pub, alpha, limb.FR), limb.FR)
        return DeviceShareVector(self.fabric, shares, macs)

    def mul_public(self, values) -> "DeviceShareVector":
        import jax.numpy as jnp

        if isinstance(values, (Scalar, int)):
            pub = jnp.asarray(limb.int_to_limbs_np(int(values)))
        else:
            pub = jnp.asarray(_limbs(values))
        return DeviceShareVector(
            self.fabric,
            limb.mod_mul(self.shares, pub, limb.FR),
            limb.mod_mul(self.macs, pub, limb.FR),
        )

    def sum(self) -> "DeviceShareVector":
        return DeviceShareVector(
            self.fabric,
            limb.sum_mod(self.shares, limb.FR)[:, None],
            limb.sum_mod(self.macs, limb.FR)[:, None],
        )

    # -- communication rounds (raw limb tensors over the party link) --------

    def _exchange_limbs(self, arr) -> np.ndarray:
        mine = np.ascontiguousarray(np.asarray(arr), dtype=np.int32)
        theirs_raw = self.fabric.net.exchange_bytes(mine.tobytes())
        return np.frombuffer(theirs_raw, dtype=np.int32).reshape(mine.shape)

    def open(self) -> np.ndarray:
        """Plain opening -> ``(NL, k)`` canonical limb tensor of the values."""
        theirs = self._exchange_limbs(self.shares)
        return np.asarray(limb.mod_add(self.shares, theirs, limb.FR))

    def open_authenticated(self) -> np.ndarray:
        """MAC-checked opening with commit-then-reveal on the sigma round
        (same rushing-adversary defence as the host fabric);
        raises :class:`AuthenticationError`."""
        import jax.numpy as jnp

        opened = self.open()
        alpha = jnp.asarray(limb.int_to_limbs_np(int(self.fabric.mac_key_share)))
        sigma = limb.mod_sub(
            self.macs, limb.mod_mul(jnp.asarray(opened), alpha, limb.FR), limb.FR
        )
        mine = np.ascontiguousarray(np.asarray(sigma), dtype=np.int32)
        their_raw = self.fabric._committed_exchange(mine.tobytes())
        if len(their_raw) != mine.nbytes:
            raise AuthenticationError("MAC check reveal length mismatch")
        their_sigma = np.frombuffer(their_raw, dtype=np.int32).reshape(mine.shape)
        total = np.asarray(limb.mod_add(sigma, their_sigma, limb.FR))
        if total.any():
            raise AuthenticationError("MAC check failed on device opening")
        return opened

    def beaver_mul(self, other: "DeviceShareVector") -> "DeviceShareVector":
        """Batched Beaver multiplication with device-side local algebra."""
        fabric = self.fabric
        k = len(self)
        if len(other) != k:
            raise MPCError("beaver_mul length mismatch")
        a_raw, b_raw, c_raw = fabric.beaver.next_triplet_batch(k)
        a = DeviceShareVector(fabric, _limbs([s for s, _ in a_raw]), _limbs([m for _, m in a_raw]))
        b = DeviceShareVector(fabric, _limbs([s for s, _ in b_raw]), _limbs([m for _, m in b_raw]))
        c = DeviceShareVector(fabric, _limbs([s for s, _ in c_raw]), _limbs([m for _, m in c_raw]))

        d_e = DeviceShareVector.concat([self - a, other - b])
        opened = d_e.open()  # (NL, 2k) limb tensor
        import jax.numpy as jnp

        d = jnp.asarray(opened[:, :k])
        e = jnp.asarray(opened[:, k:])

        # z = c + d*b + e*a + d*e (public product adjusts party 0 + MACs)
        z = c + DeviceShareVector(
            fabric,
            limb.mod_mul(b.shares, d, limb.FR),
            limb.mod_mul(b.macs, d, limb.FR),
        ) + DeviceShareVector(
            fabric,
            limb.mod_mul(a.shares, e, limb.FR),
            limb.mod_mul(a.macs, e, limb.FR),
        )
        de = limb.mod_mul(d, e, limb.FR)
        alpha = jnp.asarray(limb.int_to_limbs_np(int(fabric.mac_key_share)))
        shares = z.shares
        if fabric.party_id == 0:
            shares = limb.mod_add(shares, de, limb.FR)
        macs = limb.mod_add(z.macs, limb.mod_mul(de, alpha, limb.FR), limb.FR)
        return DeviceShareVector(fabric, shares, macs)

    def inner_product(self, other: "DeviceShareVector") -> "DeviceShareVector":
        return self.beaver_mul(other).sum()
