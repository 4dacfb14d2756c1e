import os

# Virtual 8-device CPU mesh so sharding/halo-exchange tests run without a pod
# (SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# float64 for bit-level parity with the reference's double arithmetic.
jax.config.update("jax_enable_x64", True)
