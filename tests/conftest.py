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

import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Quick tier (`pytest -m quick`): the sub-minute files (measured on the
# 1-core CI box) covering math core, cameras, feature table, init stack,
# IO/config, native loader, and web protocol — a fast regression gate for
# mid-round development. The full suite (~1 h on 1 core) stays the merge
# gate. Heavy files (estimator e2e, preintegration, factors, frontend ops,
# pallas, marginalization, parallel) are excluded on measured runtimes.
_QUICK_FILES = {
    "test_rotations.py", "test_gpl.py", "test_cameras.py",
    "test_feature_table.py", "test_init_stack.py", "test_eval_io_config.py",
    "test_native_loader.py", "test_web_client_protocol.py",
    "test_live_viewer.py", "test_adversarial.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
