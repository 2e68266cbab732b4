"""Batched dual-candidate LM (lm.BATCH_CANDIDATES) vs the sequential path.

The batched path evaluates the near-GN and damped candidates with one
vmapped Schur solve + one vmapped cost evaluation instead of two serial
chains. The per-candidate arithmetic is identical, so in f64 on CPU the
solutions must agree to rounding; this test pins that equivalence on the
example problem (the on-chip perf/accuracy gate is the multiseed A/B per
ROUND2_NOTES).

Runs in a subprocess for the same XLA:CPU full-suite-segfault reason as
tests/test_solver_early_exit.py.
"""

import os
import subprocess
import sys

import numpy as np


def _run_checks():
    import jax.numpy as jnp

    from mobile_slam_tpu.engine import estimator as est
    from mobile_slam_tpu.engine.example import make_example_state, tiny_config
    from mobile_slam_tpu.solver import lm

    def solved(state, params, n_iter):
        state2, p, q, diag = est.solve_and_slide(
            state, jnp.asarray(True), params, n_iter)
        return (np.asarray(p), np.asarray(q), float(diag.solver_cost),
                int(diag.accepted_steps))

    cfg = tiny_config(max_features=48, num_iterations=8)
    params = est.make_params(cfg, jnp.float64)
    state, inp = make_example_state(cfg, params, jnp.float64)
    state, _ = est.bookkeeping_step(state, inp, params)

    lm.BATCH_CANDIDATES = False
    p0, q0, c0, a0 = solved(state, params, 8)
    lm.BATCH_CANDIDATES = True
    p1, q1, c1, a1 = solved(state, params, 8)
    lm.BATCH_CANDIDATES = False

    # f64 tolerances: the batched Cholesky may schedule reductions
    # differently, so allow rounding-level drift but nothing structural.
    assert a0 == a1, (a0, a1)
    assert abs(c1 - c0) <= 1e-9 * max(c0, 1.0), (c0, c1)
    np.testing.assert_allclose(p1, p0, atol=1e-8)
    np.testing.assert_allclose(q1, q0, atol=1e-8)
    print("BATCHCAND_OK", flush=True)


class TestBatchedCandidates:
    def test_batch_candidates_subprocess(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, PYTHONPATH=repo)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], cwd=repo, env=env,
            capture_output=True, text=True, timeout=1800,
        )
        assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
        assert "BATCHCAND_OK" in out.stdout


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    _run_checks()
