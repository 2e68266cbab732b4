"""Multi-sequence sharding tests.

The 8-virtual-device run executes in a subprocess with its own XLA flags
(the flag must be set before backend init, and it slows compilation of the
big graphs in the rest of the suite ~8x — see conftest). The in-process test
validates the vmapped fleet step itself.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.parallel import batch as pbatch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBatchedStep:
    def test_vmapped_fleet_step(self):
        cfg = tiny_config()
        params = est.make_params(cfg, jnp.float32)
        states, inps = [], []
        for s in range(4):
            st, inp = make_example_state(cfg, params, jnp.float32, seed=s)
            states.append(st)
            inps.append(inp)
        bstate = pbatch.batch_states(states)
        binp = pbatch.batch_states(inps)
        step = pbatch.make_batched_step(params, 2)
        new_state, (p, q, ok) = step(bstate, binp)
        assert p.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(p)))
        # Batched result equals per-sequence results.
        single, _ = make_example_state(cfg, params, jnp.float32, seed=2)
        s_state, is_kf = est.bookkeeping_step(single, inps[2], params)
        s_state, p2, q2, _ = est.solve_and_slide(s_state, is_kf, params, 2)
        np.testing.assert_allclose(np.asarray(p[2]), np.asarray(p2),
                                   rtol=1e-4, atol=1e-5)

    def test_fleet_metrics_reduction(self):
        p = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
        gt = p + 0.1
        m = pbatch.fleet_metrics(p, gt)
        np.testing.assert_allclose(float(m), np.sqrt(3) * 0.1, rtol=1e-5)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="8-virtual-device compile takes ~5min on small hosts; "
    "set RUN_SLOW_TESTS=1 (the driver separately runs dryrun_multichip)",
)
class TestMultiDeviceSubprocess:
    def test_dryrun_8_devices(self):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env["JAX_PLATFORMS"] = "cpu"
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');\n"
            "import __graft_entry__ as ge; ge.dryrun_multichip(8)\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=1200,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "dryrun_multichip OK" in out.stdout
