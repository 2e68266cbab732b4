"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count=8) since only one real TPU chip is
available; the driver separately dry-runs the multichip path.

float64 is enabled so math-parity tests can validate against double
precision (the reference engine is all-double); the production TPU path
runs float32 and the code is dtype-polymorphic.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
