"""Force tests onto a virtual 8-device CPU mesh (no TPU needed for CI).

The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so the
config flag is set programmatically before any test imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
