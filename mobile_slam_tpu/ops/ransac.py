"""Vectorized fundamental-matrix RANSAC (TPU-native).

Replaces cv::findFundamentalMat(FM_RANSAC) in the reference's outlier
rejection (FeatureTracker::rejectWithFundamentalMatrix,
src/frontend/feature_tracker.cpp:203-307): instead of a sequential
hypothesize-and-verify loop, a fixed batch of 8-point hypotheses is solved
and scored in parallel (batched SVDs + one epipolar-distance matrix), the
best model is refit on its inliers, and the reference's distance-aware
edge-feature recovery (adaptive threshold * (1 + k*r^2), :236-285) is applied
to the final status. Fixed shapes, one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hartley_normalize(pts, valid):
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1)) * w
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d) / n, 1e-8)
    T = jnp.asarray(
        [[scale, 0, -scale * mean[0]],
         [0, scale, -scale * mean[1]],
         [0, 0, 1]], pts.dtype,
    )
    pn = (pts - mean) * scale
    return pn, T


def _eight_point(p1, p2):
    """F from 8 correspondences (..., 8, 2) via the f9=1 parameterization.

    Solving A[:, :8] f8 = -A[:, 8] (batched 8x8 LU) replaces the batched
    9x9 eigensolve: eigh is an iterative, scalar-heavy op on TPU, while a
    fixed-size LU is one pass. Degenerate draws (true F33 ~ 0, or a
    singular sample) produce garbage hypotheses that simply score zero
    inliers and lose the vote — RANSAC is robust to bad hypotheses by
    construction. Rank-2 enforcement is deferred to the winning model
    (find_fundamental_ransac below); epipolar-distance scoring measures
    algebraic fit and does not need it.
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (..., 8, 9)
    f8 = jnp.linalg.solve(A[..., :8], -A[..., 8][..., None])[..., 0]
    f = jnp.concatenate([f8, jnp.ones_like(f8[..., :1])], axis=-1)
    # Degenerate samples (duplicate points -> singular A) must score ZERO
    # inliers, not zero distance: poison them with NaN so every epipolar
    # comparison comes out False. (A zero matrix would give d=0 for all
    # points and win the vote with a spurious full-inlier score.)
    f = jnp.where(jnp.all(jnp.isfinite(f8), axis=-1, keepdims=True), f,
                  jnp.nan)
    return f.reshape(f.shape[:-1] + (3, 3))


def _epipolar_dist(F, p1, p2):
    """Point-to-epipolar-line distances in both images: (K,) each."""
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)  # (K, 3)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = h1 @ F.T          # lines in image 2
    l1 = h2 @ F            # lines in image 1
    d2 = jnp.abs(jnp.sum(l2 * h2, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(l2[:, :2], axis=-1), 1e-12)
    d1 = jnp.abs(jnp.sum(l1 * h1, axis=-1)) / jnp.maximum(
        jnp.linalg.norm(l1[:, :2], axis=-1), 1e-12)
    return jnp.maximum(d1, d2)


def find_fundamental_ransac(
    pts1: jax.Array,      # (K, 2)
    pts2: jax.Array,      # (K, 2)
    valid: jax.Array,     # (K,)
    threshold: jax.Array, # () pixels
    key: jax.Array,       # PRNG key
    num_hypotheses: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Returns (F (3,3), inlier mask (K,))."""
    K = pts1.shape[0]
    dtype = pts1.dtype

    p1n, T1 = _hartley_normalize(pts1, valid)
    p2n, T2 = _hartley_normalize(pts2, valid)

    # Sample indices among valid points.
    order = jnp.argsort(~valid)           # valid slots first
    n_valid = jnp.sum(valid)
    r = jax.random.randint(key, (num_hypotheses, 8), 0, 1 << 30)
    idx = order[(r % jnp.maximum(n_valid, 1)).astype(jnp.int32)]  # (N, 8)

    Fn = _eight_point(p1n[idx], p2n[idx])                 # (N, 3, 3)
    F = jnp.swapaxes(T2, 0, 1)[None] @ Fn @ T1[None]      # denormalize

    d = jax.vmap(lambda f: _epipolar_dist(f, pts1, pts2))(F)  # (N, K)
    inl = (d < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # Refit on the best hypothesis' inliers (normalized coords, weighted
    # f9=1 least squares), then rescore. A degenerate refit yields a
    # garbage model that the `better` vote below rejects in favor of the
    # winning hypothesis, so no fallback branch is needed.
    w = inl[best].astype(dtype)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
         jnp.ones_like(x1)], axis=-1)
    AtA = jnp.einsum("ri,r,rj->ij", A, w, A)
    f8 = jnp.linalg.solve(
        AtA[:8, :8] + 1e-10 * jnp.eye(8, dtype=dtype), -AtA[:8, 8])
    Fr = jnp.concatenate([f8, jnp.ones_like(f8[:1])]).reshape(3, 3)
    # Rank-2 enforcement on the final model only (one 3x3 SVD).
    u, s, vt = jnp.linalg.svd(Fr)
    Fr = u @ (s.at[2].set(0.0)[:, None] * vt)
    Fr = T2.T @ Fr @ T1
    Fr = jnp.where(jnp.all(jnp.isfinite(Fr)), Fr, jnp.eye(3, dtype=dtype))
    # Rank-2-enforce the winning raw hypothesis too (hypotheses skip
    # enforcement for speed) and rescore both candidates consistently, so
    # the returned model is always a valid rank-2 F matching its status.
    ub, sb, vtb = jnp.linalg.svd(F[best])
    Fb = ub @ (sb.at[2].set(0.0)[:, None] * vtb)
    d_best = _epipolar_dist(Fb, pts1, pts2)
    inl_best = (d_best < threshold) & valid
    d_refit = _epipolar_dist(Fr, pts1, pts2)
    inl_refit = (d_refit < threshold) & valid
    better = jnp.sum(inl_refit) >= jnp.sum(inl_best)
    F_out = jnp.where(better, Fr, Fb)
    status = jnp.where(better, inl_refit, inl_best)
    return F_out, status


def edge_recovery(
    F: jax.Array,
    und1: jax.Array, und2: jax.Array,  # (K, 2) virtual-pinhole points
    raw2: jax.Array,                   # (K, 2) raw pixel positions (next_pts)
    status: jax.Array,                 # (K,) inliers so far
    valid: jax.Array,
    threshold: jax.Array,
    edge_factor: jax.Array,
    cx: jax.Array, cy: jax.Array,
) -> jax.Array:
    """Distance-aware edge-feature recovery
    (feature_tracker.cpp:236-285): outliers beyond 0.3 r_max whose epipolar
    distance fits the radius-boosted threshold are restored."""
    r_max = jnp.sqrt(cx * cx + cy * cy)
    dx = raw2[:, 0] - cx
    dy = raw2[:, 1] - cy
    r_ratio = jnp.sqrt(dx * dx + dy * dy) / jnp.maximum(r_max, 1e-6)
    ones = jnp.ones_like(und1[:, :1])
    h1 = jnp.concatenate([und1, ones], axis=-1)
    h2 = jnp.concatenate([und2, ones], axis=-1)
    l = h1 @ F.T
    norm_ab = jnp.linalg.norm(l[:, :2], axis=-1)
    dist = jnp.abs(jnp.sum(l * h2, axis=-1)) / jnp.maximum(norm_ab, 1e-12)
    adaptive = threshold * (1.0 + edge_factor * r_ratio * r_ratio)
    restore = (
        valid & ~status & (edge_factor > 0) & (r_ratio >= 0.3)
        & (norm_ab >= 1e-12) & (dist < adaptive)
    )
    return status | restore
