"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver validates real
multi-chip sharding separately via __graft_entry__.dryrun_multichip) and in
float64 to hit IPOPT-grade tolerances, mirroring the accuracy bars of the
reference test suite (RMS < 1e-2 vs golden, 1e-5 vs analytic solutions).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment force-registers an 'axon' TPU platform plugin that ignores
# the JAX_PLATFORMS env var; override through the config API instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
