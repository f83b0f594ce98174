"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (mirrors the driver's
dryrun_multichip environment).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize pins jax_platforms=axon programmatically; override
# it back to CPU for the test suite (must happen before any backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
