"""Feature bank operations on the fixed (F, 11) observation grid.

TPU-native FeatureManager (src/frontend/feature_manager.cpp): every
list-walking operation becomes a masked array op —

* ``add_and_check_parallax``  — addFeatureAndCheckParallax (:27-73): id
  matching by equality matmul, free-slot allocation by argsort rank, keyframe
  decision via compensated parallax between the 2nd/3rd-last frames
  (compensatedParallax2, :266-295; the compensation is a no-op, as in the
  reference).
* ``triangulate``             — triangulateAcrossAllViews (:142-196): batched
  multi-view DLT solved as a 4x4 eigenproblem of AᵀA per landmark, with the
  depth<0.1 -> init_depth floor (:190-192).
* ``slide_old`` / ``slide_new`` — removeBackShiftDepth/removeBack (:208-246)
  and removeFront (:249-264) as column shifts; depth re-anchoring included.
* ``remove_failures``          — removeFailures (:112-118).

Observations of a feature are contiguous in window slots (LK never revives an
id), so end = start + count - 1 throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.models.state import FeatureTable
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS


class AddResult(NamedTuple):
    table: FeatureTable
    is_keyframe: jax.Array      # bool — True => MARGIN_OLD_KEYFRAME
    last_track_num: jax.Array   # int
    parallax: jax.Array         # mean parallax (normalized coords)


def add_and_check_parallax(
    table: FeatureTable,
    ids: jax.Array,        # (K,) int32 incoming feature ids
    obs: jax.Array,        # (K, 3) unit-z rays
    uv: jax.Array,         # (K, 2)
    vel: jax.Array,        # (K, 2)
    valid: jax.Array,      # (K,) bool
    frame_count: jax.Array,  # () int — window slot receiving the observations
    min_parallax_norm: jax.Array,  # () min_parallax / focal
) -> AddResult:
    F = table.fid.shape[0]
    K = ids.shape[0]

    used = table.fid >= 0
    # Id match (F, K); at most one slot per id.
    match = (table.fid[:, None] == ids[None, :]) & used[:, None] & valid[None, :]
    tracked = jnp.any(match, axis=0)                      # (K,)
    matched_slot = jnp.argmax(match, axis=0)              # (K,) valid iff tracked
    last_track_num = jnp.sum(tracked & valid)

    # Free-slot allocation for the new features, in deterministic order.
    is_new = valid & ~tracked
    free_slots_first = jnp.argsort(used)                  # free slots lead (stable)
    num_free = F - jnp.sum(used)
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1   # (K,)
    can_alloc = is_new & (new_rank < num_free)
    new_slot = free_slots_first[jnp.clip(new_rank, 0, F - 1)]

    tslot = jnp.where(tracked, matched_slot,
                      jnp.where(can_alloc, new_slot, F))  # F = out-of-bounds drop
    write = valid & (tracked | can_alloc)
    tslot = jnp.where(write, tslot, F)

    # Clear rows for newly-allocated slots, then scatter the new observations.
    clear = jnp.zeros((F,), bool).at[jnp.where(can_alloc, new_slot, F)].set(
        True, mode="drop"
    )
    def clr(a, fill=0):
        return jnp.where(
            clear.reshape((F,) + (1,) * (a.ndim - 1)), fill, a
        )
    fid = clr(table.fid, -1)
    start = clr(table.start)
    obs_g = clr(table.obs)
    uv_g = clr(table.uv)
    vel_g = clr(table.vel)
    mask_g = clr(table.mask, False)
    depth = clr(table.depth, -1.0)
    solve_flag = clr(table.solve_flag)

    fc = frame_count
    fid = fid.at[tslot].set(ids, mode="drop")
    start = start.at[tslot].set(
        jnp.where(tracked, start[jnp.clip(tslot, 0, F - 1)], fc), mode="drop"
    )
    obs_g = obs_g.at[tslot, fc].set(obs, mode="drop")
    uv_g = uv_g.at[tslot, fc].set(uv, mode="drop")
    vel_g = vel_g.at[tslot, fc].set(vel, mode="drop")
    mask_g = mask_g.at[tslot, fc].set(True, mode="drop")

    new_table = FeatureTable(
        fid=fid, start=start, obs=obs_g, uv=uv_g, vel=vel_g, mask=mask_g,
        depth=depth, solve_flag=solve_flag,
    )

    # --- Parallax / keyframe decision (feature_manager.cpp:50-72) ---
    used_num = new_table.used_num
    end = new_table.start + used_num - 1
    c1 = jnp.clip(fc - 2, 0, W - 1)
    c2 = jnp.clip(fc - 1, 0, W - 1)
    cond = (
        (new_table.fid >= 0)
        & (new_table.start <= fc - 2)
        & (end >= fc - 1)
    )
    p_i = new_table.obs[:, c1]   # (F, 3)
    p_j = new_table.obs[:, c2]
    u_i = p_i[:, 0] / p_i[:, 2].clip(1e-6)
    v_i = p_i[:, 1] / p_i[:, 2].clip(1e-6)
    du = u_i - p_j[:, 0]
    dv = v_i - p_j[:, 1]
    par = jnp.sqrt(du * du + dv * dv)
    parallax_num = jnp.sum(cond)
    parallax_sum = jnp.sum(jnp.where(cond, par, 0.0))
    mean_par = parallax_sum / jnp.maximum(parallax_num, 1)

    is_kf = (
        (fc < 2)
        | (last_track_num < 20)
        | (parallax_num == 0)
        | (mean_par >= min_parallax_norm)
    )
    return AddResult(new_table, is_kf, last_track_num, mean_par)


# Triangulation solver: closed-form adjugate (fast) vs batched 4x4 eigh
# (the round-1 implementation). Module-level for A/B harness toggling.
ADJUGATE_TRIANGULATION = True


def triangulate(
    table: FeatureTable,
    p: jax.Array, q: jax.Array,      # (11, 3), (11, 4) window body poses
    ex_t: jax.Array, ex_q: jax.Array,
    init_depth: jax.Array,
    window_size: int = W - 1,
    td: jax.Array | float = 0.0,
) -> FeatureTable:
    """Multi-view DLT for eligible features without a depth
    (triangulateAcrossAllViews, feature_manager.cpp:142-196).

    ``td``: camera-IMU time offset — observations are corrected
    (ray - td*vel) before the DLT, matching the projection factor's model
    (factors/projection.py). Without this, freshly-seeded depths are
    consistent with td=0 and continuously bias the decoupled td update
    toward zero (measured in scripts/dev_td_probe.py)."""
    dtype = p.dtype
    elig = (
        (table.fid >= 0) & (table.used_num >= 2)
        & (table.start < window_size - 2)
    )
    need = elig & (table.depth <= 0)

    R_wc = rot.quat_to_rot(q) @ rot.quat_to_rot(ex_q)[None]     # (11,3,3)
    t_wc = p + jnp.einsum("wij,j->wi", rot.quat_to_rot(q), ex_t)  # (11,3)

    start = jnp.clip(table.start, 0, W - 1)
    R0 = R_wc[start]                    # (F,3,3)
    t0 = t_wc[start]                    # (F,3)
    # Relative camera poses of every window frame w.r.t. the anchor.
    R_rel = jnp.einsum("fji,wjk->fwik", R0, R_wc)               # R0ᵀ R_w (F,11,3,3)
    t_rel = jnp.einsum("fji,fwj->fwi", R0, t_wc[None] - t0[:, None])  # (F,11,3)
    # P = [R_relᵀ | -R_relᵀ t_rel] (projection into frame w from anchor coords).
    P_rot = jnp.swapaxes(R_rel, -1, -2)                          # (F,11,3,3)
    P_t = -jnp.einsum("fwij,fwj->fwi", P_rot, t_rel)             # (F,11,3)
    P = jnp.concatenate([P_rot, P_t[..., None]], axis=-1)        # (F,11,3,4)

    obs_c = table.obs.at[..., :2].add(-jnp.asarray(td, dtype) * table.vel)
    f = obs_c / jnp.linalg.norm(obs_c, axis=-1, keepdims=True).clip(1e-9)
    row0 = f[..., 0:1] * P[..., 2, :] - f[..., 2:3] * P[..., 0, :]  # (F,11,4)
    row1 = f[..., 1:2] * P[..., 2, :] - f[..., 2:3] * P[..., 1, :]
    m = table.mask.astype(dtype)[..., None]
    rows = jnp.concatenate([row0 * m, row1 * m], axis=1)         # (F,22,4)
    AtA = jnp.einsum("fri,frj->fij", rows, rows)                 # (F,4,4)
    if ADJUGATE_TRIANGULATION:
        # Inhomogeneous DLT: fix w=1 and solve the 3x3 normal equations
        # M x = b with M = AtA[:3,:3], b = -AtA[:3,3] in closed form
        # (adjugate). The reference takes the smallest singular vector of
        # A (feature_manager.cpp:142-196); the two agree away from
        # degeneracy, and a batched 4x4 eigh is an iterative, scalar-heavy
        # op on TPU (~2.7 ms/frame at 384 slots — half the LM budget)
        # while the adjugate solve is effectively free. Low-parallax
        # landmarks make M ill-conditioned and the solve noise-amplifying,
        # so a RELATIVE conditioning gate (det vs mean-diagonal cubed)
        # rejects those to init_depth — the |det| test must be relative:
        # an absolute epsilon passes ill-conditioned f32 systems whose
        # amplified depths later trip the scale gate.
        M = AtA[:, :3, :3]                                       # (F,3,3)
        b = -AtA[:, :3, 3]                                       # (F,3)
        cof = jnp.stack([
            jnp.cross(M[:, 1], M[:, 2]),
            jnp.cross(M[:, 2], M[:, 0]),
            jnp.cross(M[:, 0], M[:, 1]),
        ], axis=-1)                                              # adj(M)ᵀ
        det = jnp.einsum("fi,fi->f", M[:, 0], cof[:, :, 0])
        scale3 = (jnp.trace(M, axis1=-2, axis2=-1) / 3.0) ** 3
        ill = det <= 1e-6 * jnp.maximum(scale3, 1e-30)
        x = jnp.einsum("fij,fj->fi", cof, b) / jnp.where(
            ill, 1.0, det)[:, None]
        depth = jnp.where(ill, init_depth, x[:, 2])
    else:
        _, vecs = jnp.linalg.eigh(AtA)
        vmin = vecs[..., 0]                                      # (F,4)
        depth = vmin[:, 2] / jnp.where(jnp.abs(vmin[:, 3]) < 1e-12,
                                       1e-12, vmin[:, 3])
    depth = jnp.where(depth < 0.1, init_depth, depth)
    new_depth = jnp.where(need, depth.astype(dtype), table.depth)
    return table._replace(depth=new_depth)


def _shift_left(a: jax.Array, fill=0) -> jax.Array:
    """Drop window column 0, shift 1..10 -> 0..9, clear column 10."""
    out = jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)
    if fill != 0:
        out = out.at[:, -1].set(fill)
    return out


def _free_slots(table: FeatureTable, free: jax.Array) -> FeatureTable:
    return FeatureTable(
        fid=jnp.where(free, -1, table.fid),
        start=jnp.where(free, 0, table.start),
        obs=jnp.where(free[:, None, None], 0.0, table.obs),
        uv=jnp.where(free[:, None, None], 0.0, table.uv),
        vel=jnp.where(free[:, None, None], 0.0, table.vel),
        mask=jnp.where(free[:, None], False, table.mask),
        depth=jnp.where(free, -1.0, table.depth),
        solve_flag=jnp.where(free, 0, table.solve_flag),
    )


def slide_old(
    table: FeatureTable,
    shift_depth: bool | jax.Array,
    marg_R_wc: jax.Array, marg_t_wc: jax.Array,  # old frame-0 camera pose
    new_R_wc: jax.Array, new_t_wc: jax.Array,    # new frame-0 camera pose
    init_depth: jax.Array,
    td: jax.Array | float = 0.0,
) -> FeatureTable:
    """Marginalize-old slide: removeBackShiftDepth (NON_LINEAR,
    feature_manager.cpp:208-233) / removeBack (INITIAL, :236-246)."""
    anchored = (table.fid >= 0) & (table.start == 0)
    # td-corrected anchor observation (see triangulate docstring).
    ray0 = table.obs[:, 0].at[..., :2].add(
        -jnp.asarray(td, table.obs.dtype) * table.vel[:, 0])  # (F,3)
    old_depth = table.depth

    new_obs = _shift_left(table.obs)
    new_uv = _shift_left(table.uv)
    new_vel = _shift_left(table.vel)
    new_mask = _shift_left(table.mask.astype(jnp.int32)).astype(bool)
    new_start = jnp.where(anchored, 0, jnp.maximum(table.start - 1, 0))

    used_after = jnp.sum(new_mask, axis=1)
    # removeBackShiftDepth frees features left with <2 obs; removeBack with 0.
    min_keep = jnp.where(jnp.asarray(shift_depth), 2, 1)
    free = (table.fid >= 0) & anchored & (used_after < min_keep)

    # Depth re-anchoring for surviving anchored features (:219-231).
    pts_i = ray0 * jnp.where(old_depth > 0, old_depth, init_depth)[:, None]
    w_pts = jnp.einsum("ij,fj->fi", marg_R_wc, pts_i) + marg_t_wc
    pts_j = jnp.einsum("ji,fj->fi", new_R_wc, w_pts - new_t_wc)
    dep_j = pts_j[:, 2]
    reanchored = jnp.where(dep_j > 0, dep_j, init_depth)
    keep_anchor = anchored & ~free
    new_depth = jnp.where(
        keep_anchor & jnp.asarray(shift_depth) & (old_depth > 0),
        reanchored, table.depth,
    )
    # Anchored features in the INITIAL phase keep no depth state anyway.

    out = FeatureTable(
        fid=table.fid, start=new_start, obs=new_obs, uv=new_uv, vel=new_vel,
        mask=new_mask, depth=new_depth, solve_flag=table.solve_flag,
    )
    return _free_slots(out, free)


def slide_new(table: FeatureTable) -> FeatureTable:
    """Marginalize-new slide: removeFront(WINDOW_SIZE)
    (feature_manager.cpp:249-264) — the frame at slot W-1 is discarded and
    slot W's observation takes its place."""
    def move(a):
        return a.at[:, W - 2].set(a[:, W - 1]).at[:, W - 1].set(
            jnp.zeros_like(a[:, W - 1])
        )

    new_obs = move(table.obs)
    new_uv = move(table.uv)
    new_vel = move(table.vel)
    new_mask = table.mask.at[:, W - 2].set(table.mask[:, W - 1]).at[:, W - 1].set(False)
    new_start = jnp.where(table.start == W - 1, W - 2, table.start)
    used_after = jnp.sum(new_mask, axis=1)
    free = (table.fid >= 0) & (used_after == 0)
    out = table._replace(obs=new_obs, uv=new_uv, vel=new_vel, mask=new_mask,
                         start=new_start)
    return _free_slots(out, free)


def remove_failures(table: FeatureTable) -> FeatureTable:
    """Drop solve_flag==2 landmarks (removeFailures, feature_manager.cpp:112-118)."""
    return _free_slots(table, (table.fid >= 0) & (table.solve_flag == 2))
