"""Intrinsic refinement tests (CostFunctionFactory analog): perturbed
intrinsics must be recovered from synthetic observations for each model."""

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.models.cameras import equidistant, pinhole
from mobile_slam_tpu.models.cameras.calibration import refine_intrinsics


def synthetic_points(n=300, seed=0, spread=1.2):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(2.0, 6.0, n),
    ], -1)
    return pts


class TestRefineIntrinsics:
    def test_pinhole_recovery(self):
        true = pinhole.make_params(460.0, 458.0, 376.0, 240.0,
                                   -0.28, 0.07, 1e-4, -2e-4,
                                   dtype=jnp.float64)
        pts = synthetic_points()
        uv = pinhole.project(true, jnp.asarray(pts))
        # Perturb focal/center by ~2%, zero the distortion.
        init = pinhole.make_params(450.0, 450.0, 370.0, 245.0,
                                   0.0, 0.0, 0.0, 0.0, dtype=jnp.float64)
        refined, rms0, rms1 = refine_intrinsics("PINHOLE", init, pts, uv,
                                                iters=40)
        assert rms1 < 1e-4, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(refined[:4], np.asarray(true[:4]),
                                   atol=0.05)

    def test_kannala_brandt_recovery(self):
        true = equidistant.make_params(191.0, 190.9, 255.0, 257.0,
                                       0.0035, 0.0007, -0.002, 0.0002,
                                       dtype=jnp.float64)
        rng = np.random.default_rng(1)
        # Wide-angle rays for a fisheye.
        theta = rng.uniform(0.05, 1.1, 400)
        phi = rng.uniform(-np.pi, np.pi, 400)
        pts = np.stack([np.sin(theta) * np.cos(phi),
                        np.sin(theta) * np.sin(phi),
                        np.cos(theta)], -1) * rng.uniform(2, 6, 400)[:, None]
        uv = equidistant.project(true, jnp.asarray(pts))
        init = equidistant.make_params(185.0, 185.0, 250.0, 252.0,
                                       0.0, 0.0, 0.0, 0.0, dtype=jnp.float64)
        refined, rms0, rms1 = refine_intrinsics("KANNALA_BRANDT", init, pts,
                                                uv, iters=40)
        assert rms1 < 1e-3, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(refined[:4], np.asarray(true[:4]),
                                   atol=0.1)
