"""Core fixed-shape state pytrees for the sliding-window estimator.

The reference's mutable object graph (SlidingWindow of Frame objects,
src/backend/sliding_window.h:44; FeatureManager's list<FeaturePerId>,
include/frontend/feature_manager.h) becomes two dense, jit-stable pytrees:

* ``WindowState`` — 11 keyframe slots as (11, ...) arrays, including the
  per-interval preintegration results and raw IMU ring buffers (needed for
  repropagation and the slide-window merge of general frames).
* ``FeatureTable`` — a padded (F, 11) observation grid with validity masks
  replacing the per-feature dynamic vectors. Observations of one feature are
  contiguous in window slots (LK ids never revive), so ``end = start +
  count - 1`` holds and every FeatureManager operation becomes a masked
  column shift/permutation.

All leaves take arbitrary leading batch dims so a fleet of sequences is just
a vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.imu.preintegration import Preintegration, identity_preintegration


class WindowState(NamedTuple):
    """One sliding window: 11 frame slots (common::Frame, include/common/frame.h)."""

    ts: jax.Array        # (11,)
    p: jax.Array         # (11, 3) world position
    q: jax.Array         # (11, 4) world orientation (wxyz)
    v: jax.Array         # (11, 3) world velocity
    ba: jax.Array        # (11, 3) accel bias
    bg: jax.Array        # (11, 3) gyro bias
    # Preintegration of interval (slot-1, slot], stored at `slot` (slot 0 unused).
    pre: Preintegration  # leaves have leading dim (11,)
    # Raw IMU buffers per slot (dt/acc/gyr + count + interval-start measurement),
    # the equivalent of Frame::{dt_buf, linear_acceleration_buf, angular_velocity_buf}.
    imu_dt: jax.Array    # (11, M)
    imu_acc: jax.Array   # (11, M, 3)
    imu_gyr: jax.Array   # (11, M, 3)
    imu_cnt: jax.Array   # (11,) int32
    imu_acc0: jax.Array  # (11, 3) measurement at interval start
    imu_gyr0: jax.Array  # (11, 3)


class FeatureTable(NamedTuple):
    """Padded landmark bank (FeatureManager's feature_bank_ as dense arrays)."""

    fid: jax.Array        # (F,) int32 feature id, -1 = free slot
    start: jax.Array      # (F,) int32 start frame in window
    obs: jax.Array        # (F, 11, 3) unit-z ray observations (x, y, 1)
    uv: jax.Array         # (F, 11, 2) raw pixel coords
    vel: jax.Array        # (F, 11, 2) normalized-plane velocity
    mask: jax.Array       # (F, 11) bool observation validity
    depth: jax.Array      # (F,) estimated depth in the anchor frame, -1 = unset
    solve_flag: jax.Array # (F,) int32: 0 unsolved, 1 solved, 2 failed

    @property
    def used_num(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)

    def slot_used(self) -> jax.Array:
        return self.fid >= 0


def init_window(max_imu: int, dtype=jnp.float32) -> WindowState:
    """Zero-initialized window (Estimator::clearState parity)."""
    W = NUM_SLOTS
    zeros3 = jnp.zeros((W, 3), dtype)
    ident_pre = jax.vmap(
        lambda _: identity_preintegration(jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    )(jnp.arange(W))
    q0 = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), (W, 1))
    return WindowState(
        ts=jnp.zeros((W,), dtype),
        p=zeros3, q=q0, v=zeros3, ba=zeros3, bg=zeros3,
        pre=ident_pre,
        imu_dt=jnp.zeros((W, max_imu), dtype),
        imu_acc=jnp.zeros((W, max_imu, 3), dtype),
        imu_gyr=jnp.zeros((W, max_imu, 3), dtype),
        imu_cnt=jnp.zeros((W,), jnp.int32),
        imu_acc0=zeros3, imu_gyr0=zeros3,
    )


def init_feature_table(max_features: int, dtype=jnp.float32) -> FeatureTable:
    F, W = max_features, NUM_SLOTS
    return FeatureTable(
        fid=jnp.full((F,), -1, jnp.int32),
        start=jnp.zeros((F,), jnp.int32),
        obs=jnp.zeros((F, W, 3), dtype),
        uv=jnp.zeros((F, W, 2), dtype),
        vel=jnp.zeros((F, W, 2), dtype),
        mask=jnp.zeros((F, W), bool),
        depth=jnp.full((F,), -1.0, dtype),
        solve_flag=jnp.zeros((F,), jnp.int32),
    )


def eligible_mask(table: FeatureTable, window_size: int = NUM_SLOTS - 1) -> jax.Array:
    """Solver eligibility: used_num >= 2 and start_frame < WINDOW_SIZE - 2
    (feature_manager.cpp:20)."""
    return (
        (table.fid >= 0)
        & (table.used_num >= 2)
        & (table.start < window_size - 2)
    )
