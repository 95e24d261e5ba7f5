"""Host/device dispatch for the protocol layers.

The provers and verifiers route their bulk algebra (MSMs, folds, inner
products) to the TPU kernels when a TPU backend is live, and to the exact
host (python-int) implementations otherwise.  Both paths produce identical
results — the host layer is the golden model the kernels are tested against.

Override with ``BP_FORCE_BACKEND=device|host`` (e.g. to exercise the device
path on the CPU interpreter in integration tests).
"""

from __future__ import annotations

import os

import jax


def use_device() -> bool:
    forced = os.environ.get("BP_FORCE_BACKEND")
    if forced == "device":
        return True
    if forced == "host":
        return False
    return jax.default_backend() == "tpu"
