"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that the multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware; the
driver separately validates the same code on real chips via bench.py and
__graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
