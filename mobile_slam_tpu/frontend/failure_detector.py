"""Failure detector — threshold checks over the estimator state.

Parity with ``frontend::FailureDetector`` (src/frontend/failure_detector.cpp:
15-45), which carries the original VINS-Mono failure thresholds. Note: like
in the reference, the active failure handling lives inline in the engine
(divergence gates in vio_engine.py / the estimator diagnostics); this class
exposes the same standalone checks for callers that want them
(the reference constructs it but never calls detectFailure — documented in
SURVEY §2.1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.models.state import FeatureTable, WindowState
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS

BA_LIMIT = 2.5      # |accel bias| (failure_detector.cpp)
BG_LIMIT = 1.0      # |gyro bias|
DP_LIMIT = 5.0      # position jump between updates (m)
DZ_LIMIT = 1.0      # vertical jump (m)
DROT_LIMIT_DEG = 50.0  # rotation jump


class FailureReport(NamedTuple):
    failed: jax.Array
    big_acc_bias: jax.Array
    big_gyr_bias: jax.Array
    big_translation: jax.Array
    big_z: jax.Array
    big_rotation: jax.Array
    tracked_features: jax.Array


def detect_failure(window: WindowState, table: FeatureTable,
                   last_p: jax.Array, last_q: jax.Array) -> FailureReport:
    """All checks from FailureDetector::detectFailure, vectorized."""
    tip = W - 1
    ba = jnp.linalg.norm(window.ba[tip])
    bg = jnp.linalg.norm(window.bg[tip])
    dp = window.p[tip] - last_p
    big_t = jnp.linalg.norm(dp) > DP_LIMIT
    big_z = jnp.abs(dp[2]) > DZ_LIMIT
    dtheta = rot.quat_boxminus(window.q[tip], last_q)
    big_r = jnp.linalg.norm(dtheta) > jnp.deg2rad(DROT_LIMIT_DEG)
    n_tracked = jnp.sum(table.fid >= 0)
    report = FailureReport(
        failed=(ba > BA_LIMIT) | (bg > BG_LIMIT) | big_t | big_z | big_r,
        big_acc_bias=ba > BA_LIMIT,
        big_gyr_bias=bg > BG_LIMIT,
        big_translation=big_t,
        big_z=big_z,
        big_rotation=big_r,
        tracked_features=n_tracked,
    )
    return report
