"""Test harness config.

Tests run on CPU with float64 enabled so math-parity tests can validate
against double precision (the reference engine is all-double); the
production TPU path runs float32 and the code is dtype-polymorphic.

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS environment variable, so
the CPU backend must be forced via jax.config (otherwise every eager op is a
round trip through the TPU tunnel and the suite crawls).

The virtual multi-device mesh (xla_force_host_platform_device_count) is NOT
set here: it slows XLA:CPU compilation of the large estimator graphs ~8x on
small machines. Sharding tests spawn a subprocess with their own 8-device
environment, and the driver separately dry-runs the multi-chip path via
__graft_entry__.dryrun_multichip.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
