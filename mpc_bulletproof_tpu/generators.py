"""Pedersen commitment bases and deterministic Bulletproof generator chains.

Mirrors reference src/generators.rs: ``PedersenGens`` (:32), ``GeneratorsChain``
(:76-129), ``BulletproofGens`` (:158-260), ``BulletproofGensShare`` (:303-320).

Generator derivation is a keccak hash chain: the chain state seeds
``hash_to_scalar`` and each generator is ``scalar * G`` (a deliberately
non-DLOG-hiding hash-to-curve that a Cairo verifier can replay — reference
src/generators.rs:117-121).  Chains are host-derived once (the chain is a
sequential hash walk), memoized in-process, and exported as device limb
tensors on demand for the TPU MSM kernels.
"""

from __future__ import annotations

from .constants import KECCAK_OUTPUT_SIZE
from .ops.curve import StarkPoint
from .ops.field import Scalar
from .ops.keccak import keccak256, pad_label
from .transcript import hash_to_scalar


class PedersenGens:
    """Pair of Pedersen commitment bases (reference src/generators.rs:32-71).

    The default uses the curve generator for **both** bases — a deliberate
    divergence from dalek that matches the reference's Cairo-compatible
    choice (src/generators.rs:61-71).
    """

    __slots__ = ("B", "B_blinding")

    def __init__(self, B: StarkPoint | None = None, B_blinding: StarkPoint | None = None):
        self.B = B if B is not None else StarkPoint.generator()
        self.B_blinding = B_blinding if B_blinding is not None else StarkPoint.generator()

    def commit(self, value: Scalar, blinding: Scalar) -> StarkPoint:
        """``B * value + B_blinding * blinding`` (src/generators.rs:41-43)."""
        from .utils import native

        if native.available():
            return native.commit_batch([value], [blinding], self.B, self.B_blinding)[0]
        return StarkPoint.msm([value, blinding], [self.B, self.B_blinding])

    def commit_batch(self, values, blindings) -> list[StarkPoint]:
        """Batched Pedersen commits (fixed-base window tables)."""
        from .utils import native

        if native.available():
            return native.commit_batch(values, blindings, self.B, self.B_blinding)
        return [
            StarkPoint.msm([v, b], [self.B, self.B_blinding])
            for v, b in zip(values, blindings)
        ]

    def commit_shared(self, value, blinding):
        """Commit to an additively-shared value; returns an authenticated
        shared point (src/generators.rs:52-58).  Defined on the MPC fabric
        value types; see mpc_bulletproof_tpu.parallel.fabric."""
        return value * self.B + blinding * self.B_blinding


class GeneratorsChain:
    """Deterministic arbitrary-length generator chain (src/generators.rs:76-129).

    state_0 = keccak256(pad_label(b"GeneratorsChain" || label))
    state_{i+1} = keccak256(state_i);  generator_i = hash_to_scalar(state_{i+1}) * G
    """

    __slots__ = ("state",)

    def __init__(self, label: bytes = b""):
        self.state = keccak256(pad_label(b"GeneratorsChain" + label))

    def fast_forward(self, n: int) -> "GeneratorsChain":
        for _ in range(n):
            self.state = keccak256(self.state)
        return self

    def next_scalar(self) -> Scalar:
        self.state = keccak256(self.state)
        assert len(self.state) == KECCAK_OUTPUT_SIZE
        return hash_to_scalar(self.state)

    def take(self, n: int) -> list[StarkPoint]:
        scalars = [self.next_scalar() for _ in range(n)]
        from .utils import native

        if native.available() and n >= 4:
            return native.fixed_base_mul(scalars, StarkPoint.generator())
        gen = StarkPoint.generator()
        return [gen.scalar_mul(s) for s in scalars]

    def take_scalars(self, n: int) -> list[Scalar]:
        return [self.next_scalar() for _ in range(n)]


def _party_label(prefix: bytes, party_index: int) -> bytes:
    """Per-party chain label: ``[b'G'|b'H', u32-LE party index]``
    (src/generators.rs:217-233)."""
    return prefix + party_index.to_bytes(4, "little")


class BulletproofGens:
    """All generators for aggregating up to ``party_capacity`` proofs of up to
    ``gens_capacity`` elements each (reference src/generators.rs:158-260).

    Per-party chains are namespaced by label so aggregation size is orthogonal
    to proof size, and capacity can be grown incrementally without
    regenerating the prefix (pinned by tests mirroring
    src/generators.rs:352-414).
    """

    def __init__(self, gens_capacity: int, party_capacity: int = 1):
        self.gens_capacity = 0
        self.party_capacity = party_capacity
        self.G_vec: list[list[StarkPoint]] = [[] for _ in range(party_capacity)]
        self.H_vec: list[list[StarkPoint]] = [[] for _ in range(party_capacity)]
        self._device_cache: dict = {}
        self._pack_cache: dict = {}
        self.increase_capacity(gens_capacity)

    def increase_capacity(self, new_capacity: int) -> None:
        """Extend all party chains to ``new_capacity`` (src/generators.rs:210-235)."""
        if self.gens_capacity >= new_capacity:
            return
        extra = new_capacity - self.gens_capacity
        for i in range(self.party_capacity):
            chain = GeneratorsChain(_party_label(b"G", i)).fast_forward(self.gens_capacity)
            self.G_vec[i].extend(chain.take(extra))
            chain = GeneratorsChain(_party_label(b"H", i)).fast_forward(self.gens_capacity)
            self.H_vec[i].extend(chain.take(extra))
        self.gens_capacity = new_capacity
        self._device_cache.clear()
        self._pack_cache.clear()

    def share(self, j: int) -> "BulletproofGensShare":
        return BulletproofGensShare(self, j)

    def packed_aggregate(self, n: int, m: int):
        """Packed-bytes form of the aggregated G/H vectors (cached): the
        native party kernels consume raw point bytes, and the generator
        vectors are fixed per (n, m)."""
        key = (n, m)
        if key not in self._pack_cache:
            from .utils import native

            self._pack_cache[key] = (
                native._pack_points(self.G(n, m)),
                native._pack_points(self.H(n, m)),
            )
        return self._pack_cache[key]

    def split_table(self, n: int, m: int, pc_gens: "PedersenGens"):
        """Native split MSM table over the fixed bases of an (n, m) proof:
        ``[G_agg(n*m) | H_agg(n*m) | B | B_blinding]`` with precomputed
        2^64/2^128/2^192 point shifts (64-bit scalar-chunk MSMs: the serial
        window-combine chain shrinks 252 -> 64 doublings).  Cached per
        (n, m, bases); serves both the IPP rounds (Q = w*B folds into the
        scalar on base B) and the range-proof party S_j MSMs.

        Returns ``(table, g_off, h_off, b_idx, bb_idx)`` or ``None`` when
        the native core is unavailable."""
        from .utils import native

        if not native.available():
            return None
        key = (n, m, pc_gens.B.to_bytes(), pc_gens.B_blinding.to_bytes())
        cached = self._pack_cache.get(("split", key))
        if cached is None:
            nm = n * m
            points = self.G(n, m) + self.H(n, m) + [pc_gens.B, pc_gens.B_blinding]
            table = native.PointTable(points, split=True)
            cached = (table, 0, nm, 2 * nm, 2 * nm + 1)
            self._pack_cache[("split", key)] = cached
        return cached

    def as_mpc_values(self) -> "BulletproofGensShare":
        """View for the MPC provers (reference src/generators.rs:204-206).

        Generators are public curve points; in the eager fabric they need no
        allocation wrapper, so this is party 0's chain view."""
        return self.share(0)

    def G(self, n: int, m: int) -> list[StarkPoint]:
        """Aggregated party-major iteration over G (src/generators.rs:262-292)."""
        return [self.G_vec[j][i] for j in range(m) for i in range(n)]

    def H(self, n: int, m: int) -> list[StarkPoint]:
        return [self.H_vec[j][i] for j in range(m) for i in range(n)]


class BulletproofGensShare:
    """One party's view of the generator chains (src/generators.rs:303-320)."""

    __slots__ = ("gens", "share")

    def __init__(self, gens: BulletproofGens, share: int):
        self.gens = gens
        self.share = share

    def G(self, n: int) -> list[StarkPoint]:
        return self.gens.G_vec[self.share][:n]

    def H(self, n: int) -> list[StarkPoint]:
        return self.gens.H_vec[self.share][:n]
