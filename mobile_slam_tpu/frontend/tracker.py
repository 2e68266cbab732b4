"""Feature tracker — the full per-frame image pipeline (TPU-native).

``frontend::FeatureTracker`` (src/frontend/feature_tracker.cpp) rebuilt as a
single jitted function over fixed-size point slots:

  CLAHE equalization (:102-108) -> Gaussian pyramid (:123) -> pyramidal LK
  (:130-136) -> border/status masking (:138-147) -> motion-gated F-matrix
  RANSAC with edge recovery (:153-173, :203-307) -> track-count-priority
  min-distance suppression (setMask, :38-87) -> Shi-Tomasi refill
  (:185-186) -> per-point undistortion + normalized-plane velocity
  (undistortedPoints, :338-380) -> monotone id assignment (updateID,
  :309-316).

The sequential mask-paint and greedy goodFeaturesToTrack become grid-cell
arg-max selections (ops/corners.py); RANSAC becomes a fixed batch of
parallel hypotheses (ops/ransac.py). Dead point slots are masked, so the
same XLA program serves every frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import TrackerConfig
from mobile_slam_tpu.models.cameras.base import Camera
from mobile_slam_tpu.ops import clahe as clahe_op
from mobile_slam_tpu.ops import corners, image as im, lk, lk_pallas, ransac


class TrackerState(NamedTuple):
    pyr: tuple                  # previous frame pyramid (levels+1 arrays)
    pts: jax.Array              # (K, 2) point positions in the previous frame
    norm_pts: jax.Array         # (K, 2) undistorted normalized coords (prev)
    ids: jax.Array              # (K,) int32
    track_cnt: jax.Array        # (K,) int32
    active: jax.Array           # (K,) bool
    next_id: jax.Array          # () int32 (static n_id, feature_tracker.cpp:10)
    prev_ts: jax.Array          # ()
    has_prev: jax.Array         # () bool
    # Anchor templates (first-observation appearance) for drift-free
    # re-localization: (K, win*win) patch + Scharr gradient patches.
    anchor_tp: jax.Array
    anchor_gx: jax.Array
    anchor_gy: jax.Array


class TrackerOutput(NamedTuple):
    """Per-frame features for the estimator: the reference's 7-vector
    [ray_x, ray_y, 1, u, v, vx, vy] contract (include/common/image_frame.h:14),
    emitted only for track_cnt > 1 (vio_engine.cpp:219-239)."""

    ids: jax.Array        # (K,)
    obs: jax.Array        # (K, 3) unit-z rays
    uv: jax.Array         # (K, 2)
    vel: jax.Array        # (K, 2)
    valid: jax.Array      # (K,)
    num_tracked: jax.Array


def init_tracker_state(cfg: TrackerConfig, height: int, width: int,
                       dtype=jnp.float32) -> TrackerState:
    K = cfg.max_points
    pyr = tuple(
        jnp.zeros((height // (2 ** l), width // (2 ** l)), dtype)
        for l in range(cfg.lk_pyramid_levels + 1)
    )
    p = cfg.lk_window_size * cfg.lk_window_size
    return TrackerState(
        pyr=pyr,
        pts=jnp.zeros((K, 2), dtype),
        norm_pts=jnp.zeros((K, 2), dtype),
        ids=jnp.full((K,), -1, jnp.int32),
        track_cnt=jnp.zeros((K,), jnp.int32),
        active=jnp.zeros((K,), bool),
        next_id=jnp.asarray(0, jnp.int32),
        prev_ts=jnp.asarray(0.0, dtype),
        has_prev=jnp.asarray(False),
        anchor_tp=jnp.zeros((K, p), dtype),
        anchor_gx=jnp.zeros((K, p), dtype),
        anchor_gy=jnp.zeros((K, p), dtype),
    )


def _grid_cell_dedup(pts, active, track_cnt, min_dist, width, height):
    """setMask equivalent (feature_tracker.cpp:38-87): within each
    min_dist-sized cell keep only the highest-track_cnt point."""
    K = pts.shape[0]
    gw = -(-width // min_dist)
    gh = -(-height // min_dist)
    cx = jnp.clip((pts[:, 0] // min_dist).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((pts[:, 1] // min_dist).astype(jnp.int32), 0, gh - 1)
    cell = cy * gw + cx
    cell = jnp.where(active, cell, gh * gw)  # park inactive out of range
    # Priority: higher track_cnt wins; ties -> lower slot index.
    prio = (track_cnt.astype(jnp.int32) * (K + 1)
            + (K - jnp.arange(K, dtype=jnp.int32)))
    best = jnp.zeros((gh * gw + 1,), jnp.int32).at[cell].max(
        jnp.where(active, prio, 0)
    )
    keep = active & (prio == best[cell])
    return keep


def _virtual_pinhole(camera: Camera, pts, focal, cx, cy):
    """Reproject raw pixels through lift to an ideal pinhole
    (rejectWithFundamentalMatrix's normalization, :212-225)."""
    ray = camera.lift_normalized(pts)
    return jnp.stack(
        [focal * ray[..., 0] + cx, focal * ray[..., 1] + cy], axis=-1
    )


def preprocess_frame(img: jax.Array, cfg: TrackerConfig):
    """State-independent per-frame image work: CLAHE, pyramid, Shi-Tomasi
    response (+ fisheye border mask). Split out so chunked serving can
    batch it across a whole chunk with vmap OUTSIDE the sequential scan —
    batched image ops keep the MXU/VPU busy, while inside the scan they
    run one frame at a time. Returns (equalized img, pyramid tuple,
    corner response)."""
    dtype = img.dtype
    h, w = img.shape
    if cfg.equalize:
        img = clahe_op.clahe(img, clip_limit=3.0, tiles=8)
    pyr = tuple(im.build_pyramid(img, cfg.lk_pyramid_levels))
    response = corners.min_eig_response(img)
    if cfg.fisheye:
        yy = jnp.arange(h, dtype=dtype)[:, None] - h / 2.0
        xx = jnp.arange(w, dtype=dtype)[None, :] - w / 2.0
        rad = jnp.sqrt(yy * yy + xx * xx)
        response = jnp.where(rad < min(h, w) / 2.0 - 4.0, response, 0.0)
    return img, pyr, response


def detect_and_track(
    state: TrackerState,
    img: jax.Array,          # (H, W) float 0..255 grayscale
    ts: jax.Array,           # ()
    camera: Camera,
    cfg: TrackerConfig,
    key: jax.Array,          # PRNG key for RANSAC sampling
    focal: float,
    banned_ids: jax.Array | None = None,  # ids rejected by the estimator
    preprocessed=None,       # optional (img, pyr, response) from
                             # preprocess_frame (chunked batching)
) -> tuple[TrackerState, TrackerOutput]:
    dtype = img.dtype
    h, w = img.shape
    K = cfg.max_points

    if banned_ids is not None:
        # Estimator outlier feedback: drop rejected landmarks before
        # tracking so they are not re-fed to the filter.
        banned = jnp.any(
            state.ids[:, None] == banned_ids[None, :], axis=1
        ) & (state.ids >= 0)
        state = state._replace(active=state.active & ~banned)

    if preprocessed is None:
        preprocessed = preprocess_frame(img, cfg)
    img, pyr, st_response = preprocessed

    # Kernel dispatch: the Pallas kernel replaces XLA's serialized element
    # gathers with VMEM dynamic slices (~100x on TPU, ops/lk_pallas.py);
    # CPU keeps the pure-XLA path (Pallas-CPU is interpret-only).
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    lk_track = lk_pallas.track_pyramidal if use_pallas else (
        lambda p0, p1, pts, act, prm: lk.track_pyramidal(
            list(p0), list(p1), pts, act, prm))
    lk_refine = (lk_pallas.refine_template if use_pallas
                 else lk.refine_template)
    extract = (lk_pallas.extract_patches if use_pallas
               else lk.extract_patches)

    # --- LK tracking of existing points -------------------------------
    params = lk.LKParams(
        window=cfg.lk_window_size, levels=cfg.lk_pyramid_levels,
        iters=cfg.lk_iterations, eps=cfg.lk_eps,
    )
    can_track = state.active & state.has_prev
    new_pts, ok = lk_track(tuple(state.pyr), pyr, state.pts, can_track,
                           params)
    border = 1  # inBorder check (:138-147)
    inside = (
        (new_pts[:, 0] >= border) & (new_pts[:, 0] < w - border)
        & (new_pts[:, 1] >= border) & (new_pts[:, 1] < h - border)
    )
    active = can_track & ok & inside

    # --- Forward-backward verification ----------------------------------
    # Track next->prev from the forward result; a good track round-trips to
    # its origin. Culls occlusion/aperture drifts that pass the min-eig
    # health check (the reference relies on F-RANSAC alone here).
    if cfg.fb_check:
        if cfg.fb_mode == "prior0":
            # Prior-initialized finest-level verification (TrackerConfig
            # docstring): match the NEW frame's patch at the tracked point
            # against the PREVIOUS frame starting from the old position —
            # a good track is a fixed point there; a drifted/occluded one
            # pulls away or fails. ~1/5 the cost of the pyramidal pass.
            tp_b, gx_b, gy_b = extract(img, new_pts, cfg.lk_window_size)
            back_pts, ok_b, _resid_b = lk_refine(
                state.pyr[0], tp_b, gx_b, gy_b, state.pts, active,
                cfg.lk_window_size, cfg.lk_iterations, cfg.lk_eps,
                2.0 + cfg.fb_max_err)
        else:
            back_pts, ok_b = lk_track(pyr, tuple(state.pyr), new_pts,
                                      active, params)
        fb2 = jnp.sum((back_pts - state.pts) ** 2, axis=-1)
        active = active & ok_b & (fb2 <= cfg.fb_max_err ** 2)

    # --- Anchor-template refinement --------------------------------------
    # Re-localize against the first-observation patch so per-frame LK errors
    # do not accumulate into a random walk; re-anchor when appearance has
    # genuinely changed (viewpoint/scale) rather than fight it.
    reanchor = jnp.zeros((K,), bool)
    if cfg.anchor_refine:
        ref_pos, ok_r, resid = lk_refine(
            img, state.anchor_tp, state.anchor_gx, state.anchor_gy,
            new_pts, active, cfg.lk_window_size, cfg.anchor_iters,
            cfg.lk_eps, cfg.anchor_max_shift,
        )
        shift2 = jnp.sum((ref_pos - new_pts) ** 2, axis=-1)
        # A refinement that saturated the search radius is distrusted.
        good = (ok_r & (shift2 < (cfg.anchor_max_shift - 1e-3) ** 2)
                & (resid <= cfg.anchor_resid))
        new_pts = jnp.where((active & good)[:, None], ref_pos, new_pts)
        reanchor = active & ~good

    # --- Motion-gated F-matrix rejection (:153-173) --------------------
    disp2 = jnp.sum((new_pts - state.pts) ** 2, axis=-1)
    n_act = jnp.sum(active)
    rms = jnp.sqrt(jnp.sum(jnp.where(active, disp2, 0.0))
                   / jnp.maximum(n_act, 1))
    run_ransac = (n_act >= 30) & (rms >= 2.0)

    cx_v = jnp.asarray(w / 2.0, dtype)
    cy_v = jnp.asarray(h / 2.0, dtype)
    und_prev = _virtual_pinhole(camera, state.pts, focal, cx_v, cy_v)
    und_next = _virtual_pinhole(camera, new_pts, focal, cx_v, cy_v)

    def do_ransac(_):
        F, status = ransac.find_fundamental_ransac(
            und_prev, und_next, active,
            jnp.asarray(cfg.f_threshold, dtype), key,
            num_hypotheses=cfg.ransac_iters,
        )
        status = ransac.edge_recovery(
            F, und_prev, und_next, new_pts, status, active,
            jnp.asarray(cfg.f_threshold, dtype),
            jnp.asarray(cfg.f_threshold_edge_factor, dtype), cx_v, cy_v,
        )
        return status

    status = jax.lax.cond(run_ransac, do_ransac, lambda _: active, None)
    active = active & status
    track_cnt = jnp.where(active, state.track_cnt + 1, 0)

    # --- Min-distance dedup of survivors (setMask) ----------------------
    keep = _grid_cell_dedup(new_pts, active, track_cnt, cfg.min_dist, w, h)
    active = keep
    n_kept = jnp.sum(active)

    # --- Shi-Tomasi refill (:185-186) -----------------------------------
    # Gated on the slot deficit: with refill_min_deficit > 1, the whole
    # response/occupancy/NMS block is skipped (lax.cond runs one branch on
    # TPU) while tracking keeps the count within the deficit band.
    n_needed = jnp.clip(cfg.max_cnt - n_kept, 0, K)

    def do_detect(_):
        response = corners.occupancy_suppression(
            st_response, new_pts, active, cfg.min_dist
        )
        return corners.detect_grid(
            response, cfg.min_dist, K, quality_level=cfg.quality_level
        )

    def skip_detect(_):
        return (jnp.zeros((K, 2), dtype), jnp.zeros((K,), bool))

    cand_pts, cand_valid = jax.lax.cond(
        n_needed >= max(1, cfg.refill_min_deficit),
        do_detect, skip_detect, None)
    cand_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    take = cand_valid & (cand_rank < n_needed)

    # Allocate free slots for the new detections.
    free_order = jnp.argsort(active)  # inactive slots first (stable)
    n_free = K - n_kept
    new_rank = jnp.where(take, cand_rank, K)
    can_place = take & (cand_rank < n_free)
    slot = free_order[jnp.clip(new_rank, 0, K - 1)]
    slot = jnp.where(can_place, slot, K)  # out-of-bounds drop

    pts_out = new_pts
    pts_out = pts_out.at[slot].set(cand_pts, mode="drop")
    ids = jnp.where(active, state.ids, -1)
    new_ids = state.next_id + cand_rank.astype(jnp.int32)
    ids = ids.at[slot].set(new_ids, mode="drop")
    track_cnt = track_cnt.at[slot].set(1, mode="drop")
    placed = jnp.zeros((K,), bool).at[slot].set(True, mode="drop")
    active_out = active | placed
    next_id = state.next_id + jnp.sum(can_place).astype(jnp.int32)

    # --- Anchor updates: new detections + appearance-change re-anchors ---
    if cfg.anchor_refine:
        tp_new, gx_new, gy_new = extract(img, pts_out, cfg.lk_window_size)
        upd = (placed | reanchor)[:, None]
        anchor_tp = jnp.where(upd, tp_new, state.anchor_tp)
        anchor_gx = jnp.where(upd, gx_new, state.anchor_gx)
        anchor_gy = jnp.where(upd, gy_new, state.anchor_gy)
    else:
        anchor_tp, anchor_gx, anchor_gy = (
            state.anchor_tp, state.anchor_gx, state.anchor_gy)

    # --- Undistortion + velocity (undistortedPoints, :338-380) ----------
    rays = camera.lift_normalized(pts_out)
    norm_pts = rays[:, 0:2]
    dt = ts - state.prev_ts
    # Velocity only for points tracked from the previous frame.
    tracked_prev = active  # survivors (new detections excluded)
    vel = jnp.where(
        (tracked_prev & (dt > 1e-6) & state.has_prev)[:, None],
        (norm_pts - state.norm_pts) / jnp.maximum(dt, 1e-6),
        0.0,
    )

    new_state = TrackerState(
        pyr=pyr, pts=pts_out, norm_pts=norm_pts, ids=ids,
        track_cnt=track_cnt, active=active_out, next_id=next_id,
        prev_ts=ts, has_prev=jnp.asarray(True),
        anchor_tp=anchor_tp, anchor_gx=anchor_gx, anchor_gy=anchor_gy,
    )

    obs = jnp.concatenate([norm_pts, jnp.ones((K, 1), dtype)], axis=-1)
    out = TrackerOutput(
        ids=ids,
        obs=obs,
        uv=pts_out,
        vel=vel,
        valid=active_out & (track_cnt > 1),  # vio_engine.cpp:226
        num_tracked=jnp.sum(active),
    )
    return new_state, out
