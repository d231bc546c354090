"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on host CPU devices (same XLA partitioner), per the project build rules.
This must run before any `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# this jax build (axon plugin) honors the legacy variable, not JAX_PLATFORMS
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin force-appends itself to jax_platforms regardless of the
# env var, so the env-var route alone cannot pin CPU here; set the config
# explicitly (jax is imported lazily by tests, this import is the first).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
