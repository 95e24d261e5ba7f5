"""Multi-chip sharding of the hot kernels over a ``jax.sharding.Mesh``.

The scaling dimension of this framework is ``n`` — IPP vector length /
multiplication-gate count / MSM size (SURVEY.md §5.7).  Points and scalar
vectors shard along their batch (lane) axis over the ``dp`` mesh axis:

* **inner products** reduce with ``psum`` *before* modular reduction: each
  device accumulates its wide (80-limb-domain) int32 partial sums locally,
  the collective adds raw limb tensors over ICI, and a single Barrett
  reduction runs on the replicated result — the cheapest possible
  communication (one (WIDE,)-int32 vector per device);
* **MSMs** compute per-device partial Pippenger results; the (3, NL)
  partial points ``all_gather`` and fold with a log-depth tree of complete
  additions.

Used by ``__graft_entry__.dryrun_multichip`` on a virtual CPU mesh and by
the benchmarks on real meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # moved in newer JAX
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

from ..ops import curve_jax as cj
from ..ops import kernels
from ..ops import limb
from ..ops.limb import WIDE, FR, ModParams


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def sharded_inner_product(a, b, mesh: Mesh, mp: ModParams = FR, axis: str = "dp"):
    """<a, b> mod m with ``(NL, n)`` inputs sharded over ``axis``."""

    def local(a_loc, b_loc):
        prods = limb.carry_prop(limb.conv_full(a_loc, b_loc), WIDE)
        partial = jnp.sum(prods, axis=-1)  # (WIDE,) int32, lanes < 2^29
        total = jax.lax.psum(partial, axis)
        return limb._barrett_reduce(limb.carry_prop(total[:, None], WIDE), mp)[..., 0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None),
        check_rep=False,
    )
    return fn(a, b)


def sharded_point_sum(points, mesh: Mesh, axis: str = "dp"):
    """Sum of ``(3, NL, n)`` points sharded over ``axis`` -> replicated (3, NL)."""

    def local(pts):
        partial = _tree_sum(pts)  # (3, NL, 1)
        gathered = jax.lax.all_gather(partial[..., 0], axis)  # (ndev, 3, NL)
        stacked = jnp.moveaxis(gathered, 0, -1)  # (3, NL, ndev)
        return _tree_sum(stacked)[..., 0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axis),),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(points)


def _tree_sum(pts):
    n = pts.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        if 2 * half != n:
            pts = jnp.concatenate([pts, cj.identity((2 * half - n,))], axis=-1)
        pts = kernels.point_add(pts[..., :half], pts[..., half:])
        n = half
    return pts


# ---------------------------------------------------------------------------
# in-shard helpers: building blocks for SPMD programs that run INSIDE a
# shard_map body with fully-replicated operands (the fused prover).  Each
# device slices its lane range with axis_index, computes a partial, and the
# partials fold with one collective.  The cheap O(n) elementwise work stays
# replicated: zero communication and every device's transcript in lockstep.
# ---------------------------------------------------------------------------


def shard_pad_msm(scalars, points, total: int):
    """Pad an MSM operand pair on the lane axis to ``total`` lanes.

    Zero scalars fall in Pippenger bucket 0, which the signed-bucket suffix
    sums exclude, so (0, identity) padding contributes nothing."""
    k = scalars.shape[-1]
    if k == total:
        return scalars, points
    pad = total - k
    return (
        jnp.pad(scalars, [(0, 0), (0, pad)]),
        jnp.concatenate([points, cj.identity((pad,))], axis=-1),
    )


def insh_slice(arr, ck: int, axis_name: str):
    """This device's ``ck``-lane slice of a replicated lanes-last array."""
    d = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(arr, d * ck, ck, axis=-1)


def insh_point_sum(pts, ndev: int, axis_name: str):
    """Replicated ``(3, NLZ, k)`` -> replicated ``(3, NLZ, 1)`` point sum:
    per-device tree over a lane slice, one all_gather, log(ndev) adds."""
    k = pts.shape[-1]
    ck = -(-k // ndev)
    if ck * ndev != k:
        pts = jnp.concatenate([pts, cj.identity((ck * ndev - k,))], axis=-1)
    part = _tree_sum(insh_slice(pts, ck, axis_name))  # (3, NLZ, 1)
    gathered = jax.lax.all_gather(part[..., 0], axis_name)  # (ndev, 3, NLZ)
    return _tree_sum(jnp.moveaxis(gathered, 0, -1))


def insh_msm(scalars, points, ndev: int, axis_name: str,
             affine: bool = False):
    """Replicated MSM operands -> replicated ``(3, NLZ)`` result with
    per-device Pippenger partials (the sharded_msm pattern, usable inside
    an enclosing shard_map)."""
    from ..ops import msm as msm_mod

    ck = -(-scalars.shape[-1] // ndev)
    scalars, points = shard_pad_msm(scalars, points, ck * ndev)
    c = msm_mod.select_window(ck)
    part = msm_mod._msm_device_impl(
        insh_slice(scalars, ck, axis_name), insh_slice(points, ck, axis_name),
        c, affine=affine,
    )
    gathered = jax.lax.all_gather(part, axis_name)  # (ndev, 3, NLZ)
    return _tree_sum(jnp.moveaxis(gathered, 0, -1))[..., 0]


def insh_inner_product(a, b, ndev: int, axis_name: str, mp: ModParams = FR):
    """Replicated ``(NL, k)`` operands -> replicated ``(NL, 1)`` modular
    inner product: per-device wide int32 partials, one psum, one Barrett.

    Safe while ``k * 2^26 < 2^31`` (k < 32768) — every fused-prover length
    qualifies; larger vectors must pre-chunk like limb._inner_product_mod."""
    k = a.shape[-1]
    ck = -(-k // ndev)
    if ck * ndev != k:
        pad = [(0, 0), (0, ck * ndev - k)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    a_loc = insh_slice(a, ck, axis_name)
    b_loc = insh_slice(b, ck, axis_name)
    prods = limb.carry_prop(limb.conv_full(a_loc, b_loc), WIDE)
    partial = jnp.sum(prods, axis=-1)
    total = jax.lax.psum(partial, axis_name)
    return limb._barrett_reduce(limb.carry_prop(total[:, None], WIDE), mp)


def sharded_msm(scalars, points, mesh: Mesh, c: int | None = None, axis: str = "dp",
                affine: bool = False):
    """Pippenger MSM sharded over ``axis``: per-device buckets, partial
    results folded across devices (>= 80% 2-host scaling by construction —
    communication is one point per device).

    Pads ``n`` to a multiple of the mesh size (zero scalars / identity
    points contribute nothing)."""
    from ..ops import msm as msm_mod

    n = scalars.shape[-1]
    ndev = mesh.devices.size
    pad = (-n) % ndev
    if pad:
        scalars = jnp.pad(scalars, [(0, 0), (0, pad)])
        points = jnp.concatenate([points, cj.identity((pad,))], axis=-1)
        n += pad
    if c is None:
        c = msm_mod.select_window(max(1, n // ndev))

    def local(s_loc, p_loc):
        partial = msm_mod._msm_device_impl(s_loc, p_loc, c, affine=affine)  # (3, NL)
        gathered = jax.lax.all_gather(partial, axis)  # (ndev, 3, NL)
        stacked = jnp.moveaxis(gathered, 0, -1)
        return _tree_sum(stacked)[..., 0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None, axis)),
        out_specs=P(None, None),
        check_rep=False,
    )
    return fn(scalars, points)
