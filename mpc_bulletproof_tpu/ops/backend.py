"""Host/device dispatch for the protocol layers.

The provers and verifiers route their bulk algebra (MSMs, folds, inner
products) to the TPU kernels when a TPU backend is live, and to the exact
host (python-int) implementations otherwise.  Both paths produce identical
results — the host layer is the golden model the kernels are tested against.

Override with ``BP_FORCE_BACKEND=device|host`` (e.g. to exercise the device
path on the CPU interpreter in integration tests).

Multi-chip: install a ``jax.sharding.Mesh`` with :func:`set_mesh` and every
protocol-level MSM large enough to amortize the collective routes through
``parallel.sharded.sharded_msm`` (per-device Pippenger partials, one
all-gathered point per device).  ``dispatch_msm`` is the single MSM entry
point used by the IPP, the R1CS prover/verifier, and the range-proof
dealer/verifier.
"""

from __future__ import annotations

import os

import jax

_ACTIVE_MESH = None


def use_device() -> bool:
    forced = os.environ.get("BP_FORCE_BACKEND")
    if forced == "device":
        return True
    if forced == "host":
        return False
    return jax.default_backend() == "tpu"


def set_mesh(mesh) -> None:
    """Install (or clear, with ``None``) the mesh for sharded MSMs."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh():
    return _ACTIVE_MESH


# Below this size a single chip is faster than paying the collective.
_SHARD_MIN_PER_DEVICE = 16
# Below this size the host python/native path beats kernel dispatch.
_DEVICE_MIN = 32
# Below this size a cached native split table beats the mesh: 'abandon the
# split table for the mesh' is a different tradeoff than 'single chip vs
# collective' — the 64-doubling split-table combine is very fast at small
# mega-check widths.  (Crossover constant; see OPTIMIZATIONS.md thresholds.)
_MESH_OVER_SPLIT_MIN = 4096


def mesh_shardable(n: int, over_split: bool = False) -> bool:
    """True when an ``n``-point protocol MSM should route to the mesh.

    The single routing predicate shared by :func:`dispatch_msm` and the
    callers that would *abandon a faster single-backend path* (the cached
    native split generator tables) for the mesh — those pass
    ``over_split=True`` and clear a higher crossover.
    """
    if _ACTIVE_MESH is None or not use_device() or n < _DEVICE_MIN:
        return False
    if n < _ACTIVE_MESH.devices.size * _SHARD_MIN_PER_DEVICE:
        return False
    if over_split and n < _MESH_OVER_SPLIT_MIN:
        return False
    return True


def dispatch_msm(scalars, points):
    """Protocol-level MSM: sharded mesh > single device > host.

    Accepts host ``Scalar`` / ``StarkPoint`` lists, returns a ``StarkPoint``.
    """
    from .curve import StarkPoint

    n = len(scalars)
    if use_device() and n >= _DEVICE_MIN:
        if mesh_shardable(n):
            import jax.numpy as jnp

            from . import curve_jax as cj
            from ..parallel import sharded

            s = jnp.asarray(cj.scalars_from_host(scalars))
            p = jnp.asarray(cj.points_from_host(points))
            out = sharded.sharded_msm(s, p, _ACTIVE_MESH, affine=True)
            return cj.points_to_host(out[..., None])[0]
        from . import msm as msm_mod

        return msm_mod.msm_host_points(scalars, points)
    return StarkPoint.msm(scalars, points)
