"""Early-exit (function-tolerance) LM loop vs the fixed-count loop.

The reference runs Ceres with an 8-iteration budget AND default
function_tolerance, so it stops early on converged frames
(optimizer.cpp:145-155). lm.EARLY_EXIT_FTOL reproduces that contract with a
while_loop; these tests pin the safety property: executed iterations are
numerically identical, only trailing converged iterations are skipped.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.solver import lm


def _solved(state, params, n_iter):
    state2, p, q, diag = est.solve_and_slide(
        state, jnp.asarray(True), params, n_iter)
    return (np.asarray(p), np.asarray(q), float(diag.solver_cost),
            int(diag.accepted_steps))


class TestEarlyExitLM:
    def setup_method(self):
        cfg = tiny_config(max_features=48, num_iterations=8)
        self.params = est.make_params(cfg, jnp.float64)
        state, inp = make_example_state(cfg, self.params, jnp.float64)
        self.state, _ = est.bookkeeping_step(state, inp, self.params)

    def teardown_method(self):
        lm.EARLY_EXIT_FTOL = None

    def test_ftol_zero_is_bit_identical(self):
        """ftol=0 can never trigger (an accepted step has improvement > 0),
        so the while_loop must reproduce the fori_loop exactly."""
        lm.EARLY_EXIT_FTOL = None
        p0, q0, c0, a0 = _solved(self.state, self.params, 8)
        lm.EARLY_EXIT_FTOL = 0.0
        p1, q1, c1, a1 = _solved(self.state, self.params, 8)
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_array_equal(q0, q1)
        assert c0 == c1 and a0 == a1

    def test_small_ftol_converges_to_same_solution(self):
        """ftol=1e-6 may skip trailing iterations but the solution must
        agree to the convergence tolerance, with no more accepted steps."""
        lm.EARLY_EXIT_FTOL = None
        p0, q0, c0, a0 = _solved(self.state, self.params, 8)
        lm.EARLY_EXIT_FTOL = 1e-6
        p1, q1, c1, a1 = _solved(self.state, self.params, 8)
        assert a1 <= a0
        assert abs(c1 - c0) <= 1e-5 * max(c0, 1.0)
        np.testing.assert_allclose(p1, p0, atol=1e-5)

    def test_loose_ftol_stops_early(self):
        """A loose tolerance must actually cut iterations once the cost
        plateaus (the perf property being bought). The cold-start example
        problem still improves >1%/iteration at 8 iterations, so this uses
        a budget deep enough to reach the plateau."""
        lm.EARLY_EXIT_FTOL = None
        _, _, _, a0 = _solved(self.state, self.params, 24)
        lm.EARLY_EXIT_FTOL = 1e-2
        _, _, _, a1 = _solved(self.state, self.params, 24)
        assert a1 < a0
