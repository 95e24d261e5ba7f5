"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that the multi-chip sharding
paths (pjit/shard_map over a Mesh) are exercised without TPU hardware; the
driver separately validates the same code on real chips via bench.py and
__graft_entry__.dryrun_multichip.

Note: this environment registers an experimental 'axon' TPU plugin that
overrides the JAX_PLATFORMS env var, so we must also force the config after
importing jax.  The axon tunnel is effectively single-tenant — a second
process touching it while another holds it will hang on transfers — so
tests must never use it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb/point kernels are large straight-line
# graphs; caching makes repeat test runs fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
