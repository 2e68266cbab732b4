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


class TestBatchedChunkedStep:
    """Fleet feature-path serving (scan over a chunk of the vmapped step)
    must equal the single-sequence chunked scan per sequence."""

    def test_batched_chunked_matches_single(self):
        from mobile_slam_tpu.engine import chunked

        cfg = tiny_config()
        params = est.make_params(cfg, jnp.float32)
        B, T = 2, 2
        states, inps = [], []
        for s in range(B):
            st, inp = make_example_state(cfg, params, jnp.float32, seed=s)
            states.append(st)
            inps.append(inp)

        def seq_inputs(inp):
            return jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[inp._replace(ts=inp.ts + 0.05 * t) for t in range(T)])

        step1 = chunked.make_chunked_step(params, cfg.estimator.num_iterations)
        singles = []
        for st, inp in zip(states, inps):
            _, out = step1(jax.tree.map(jnp.copy, st), seq_inputs(inp))
            singles.append(jax.tree.map(np.asarray, out))

        bstate = pbatch.batch_states(states)
        binp = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                            *[seq_inputs(i) for i in inps])
        bstep = pbatch.make_batched_chunked_step(
            params, cfg.estimator.num_iterations)
        _, bout = bstep(bstate, binp)
        bout = jax.tree.map(np.asarray, bout)
        for s in range(B):
            p_s, q_s, ok_s, kf_s = singles[s]
            np.testing.assert_allclose(bout[0][:, s], p_s,
                                       rtol=2e-3, atol=2e-4)
            np.testing.assert_array_equal(bout[3][:, s], kf_s)


class TestBatchedImageStep:
    """Fleet FULL-image-path mode (parallel.batch.make_batched_image_step):
    B sequences' complete tracker+estimator pipelines vmapped into one
    program. Pure DP semantics — the batched run must equal running each
    sequence through the single-sequence chunked step."""

    def _carry_and_inputs(self, cfg, params, seed, T):
        from mobile_slam_tpu.engine import chunked
        from mobile_slam_tpu.frontend import tracker as trk

        st, inp = make_example_state(cfg, params, jnp.float32, seed=seed)
        tst = trk.init_tracker_state(cfg.tracker, cfg.camera.height,
                                     cfg.camera.width, jnp.float32)
        carry = chunked.ImageChunkCarry(
            est_state=st, tracker_state=tst,
            banned_ids=jnp.full((cfg.estimator.max_features,), -1,
                                jnp.int32),
            key=jax.random.PRNGKey(seed),
            depth_ema=jnp.asarray(0.0, jnp.float32),
            vel_ema=jnp.asarray(0.0, jnp.float32),
        )
        rng = np.random.default_rng(100 + seed)
        frames = []
        for t in range(T):
            # Smooth random texture so Shi-Tomasi finds corners.
            base = rng.uniform(0, 255, (16, 16))
            img = np.kron(base, np.ones((4, 4)))[:cfg.camera.height,
                                                 :cfg.camera.width]
            frames.append(chunked.ImageFrameInput(
                img=jnp.asarray(img, jnp.float32),
                ts=inp.ts + 0.05 * t,
                imu_dt=inp.imu_dt, imu_acc=inp.imu_acc,
                imu_gyr=inp.imu_gyr, imu_cnt=inp.imu_cnt,
            ))
        return carry, chunked.stack_image_inputs(frames)

    def test_vmapped_image_fleet_matches_sequential(self):
        from mobile_slam_tpu.engine import chunked

        cfg = tiny_config()
        params = est.make_params(cfg, jnp.float32)
        from mobile_slam_tpu.models.cameras.base import make_camera
        cam = make_camera(cfg.camera, dtype=jnp.float32)
        B, T = 2, 2
        pairs = [self._carry_and_inputs(cfg, params, s, T) for s in range(B)]

        # Sequential single-sequence runs (no donation: reuse inputs).
        step1 = chunked.make_chunked_image_step(
            params, cfg.estimator.num_iterations, cfg.tracker, cam,
            cfg.camera.focal_length)
        seq_out = []
        for carry, inputs in pairs:
            _, out = step1(jax.tree.map(jnp.copy, carry), inputs)
            seq_out.append(jax.tree.map(np.asarray, out))

        # Batched fleet run.
        bcarry = pbatch.batch_states([c for c, _ in pairs])
        binputs = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                               *[i for _, i in pairs])
        bstep = pbatch.make_batched_image_step(
            params, cfg.estimator.num_iterations, cfg.tracker, cam,
            cfg.camera.focal_length)
        bcarry2, bout = bstep(bcarry, binputs)
        bout = jax.tree.map(np.asarray, bout)

        for s in range(B):
            p_b, q_b, ok_b, kf_b = (bout[0][:, s], bout[1][:, s],
                                    bout[2][:, s], bout[3][:, s])
            p_s, q_s, ok_s, kf_s = seq_out[s]
            assert np.isfinite(p_b).all()
            np.testing.assert_allclose(p_b, p_s, rtol=2e-3, atol=2e-4)
            np.testing.assert_array_equal(kf_b, kf_s)


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
