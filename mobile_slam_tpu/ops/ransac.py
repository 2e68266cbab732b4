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


# Hypothesis nullspace solver. False (default) = batched 9x9 eigensolve +
# SVD rank-2 enforcement, the direct analog of cv2's 8-point; True = the
# faster shifted-inverse-power + epipole-projection path below.
#
# E2E VERDICT (scripts/dev_multiseed.py, 8 seeds x 14 s full image path on
# chip, /tmp/multiseed_rs2.json 2026-08-17): eigh median ATE 0.030 m /
# max 0.046 m / 0 gate trips; inverse-power median 0.063 m / max 1.240 m
# with 1 runaway — and an earlier naive f9=1 LU variant was far worse
# (median 0.578 m, 4/8 runaways). Low-parallax frames make the 8-point
# system near-degenerate every few frames at 20 fps; eigh's exact ordered
# smallest-eigvec is the only variant tried whose model choice is stable
# enough there. The ~1 ms/frame eigh cost is worth it; flip only with
# multiseed evidence.
USE_LU_HYPOTHESES = False


def _eight_point_eigh(p1, p2):
    """F from 8 correspondences via the nullspace of A (batched eigh)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    AtA = jnp.einsum("...ri,...rj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    u, s, vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., :, None] * vt)


def _min_eigvec_inv_power(AtA, iters: int = 3):
    """Smallest-eigenvector of a batched SPD (..., 9, 9) Gram matrix via
    shifted inverse power iteration: one Cholesky of (AtA + eps*I), then
    `iters` triangular solves. Matches eigh's MIN-NORM nullspace direction
    — critical for near-degenerate (low-parallax / rotation-only) frames,
    where a naive f9=1 LU solve amplifies noise into a garbage model that
    culls half the live tracks (cv2's SVD keeps them; measured 0.49 vs
    0.72 kept-inlier fraction on rotation-only flow). Cost: one 9x9
    Cholesky + a few solves per hypothesis vs an iterative eigensolver.
    """
    n = AtA.shape[-1]
    eps = 1e-7 * (jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / n
                  + 1e-30)
    eye = jnp.eye(n, dtype=AtA.dtype)
    chol = jax.scipy.linalg.cho_factor(AtA + eps * eye, lower=True)
    x = jnp.ones(AtA.shape[:-1], AtA.dtype)
    for _ in range(iters):
        x = jax.scipy.linalg.cho_solve(chol, x[..., None])[..., 0]
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    # A non-finite solve (defective Gram from duplicate sample points)
    # must score zero inliers: poison with NaN so comparisons are False.
    ok = jnp.all(jnp.isfinite(x), axis=-1, keepdims=True)
    return jnp.where(ok, x, jnp.nan)


def _rank2_project(F):
    """Batched rank-2 enforcement without SVD: find the right epipole e
    (nullspace of FᵀF via the closed-form symmetric 3x3 eigensystem) and
    project F <- F(I - eeᵀ), which zeroes Fe exactly. For near-rank-2
    inputs this matches the SVD projection to O(sigma3); scoring with
    rank-2-valid models is what cv2's RANSAC does per hypothesis, and
    skipping it measurably degrades hypothesis selection. All elementwise
    math (trigonometric eigenvalue formula + cross products)."""
    M = jnp.einsum("...ji,...jk->...ik", F, F)               # FᵀF, SPD
    q = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B0 = M - q * jnp.eye(3, dtype=F.dtype)
    p = jnp.sqrt(jnp.maximum(
        jnp.sum(B0 * B0, axis=(-2, -1)) / 6.0, 1e-30))[..., None, None]
    B = B0 / p
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r)[..., None, None] / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    C = M - lam_min * jnp.eye(3, dtype=F.dtype)
    # Null direction of C: the largest cross product of two of its rows.
    c01 = jnp.cross(C[..., 0, :], C[..., 1, :])
    c02 = jnp.cross(C[..., 0, :], C[..., 2, :])
    c12 = jnp.cross(C[..., 1, :], C[..., 2, :])
    cands = jnp.stack([c01, c02, c12], axis=-2)              # (..., 3, 3)
    norms = jnp.sum(cands * cands, axis=-1)
    pick = jnp.argmax(norms, axis=-1)
    e = jnp.take_along_axis(cands, pick[..., None, None], axis=-2)[..., 0, :]
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-30)
    return F - jnp.einsum("...ij,...j,...k->...ik", F, e, e)


def _eight_point(p1, p2):
    """F from 8 correspondences (..., 8, 2) via inverse power iteration
    on the 9x9 Gram matrix (see _min_eigvec_inv_power), rank-2 enforced
    per hypothesis via the epipole projection (_rank2_project)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (..., 8, 9)
    AtA = jnp.einsum("...ri,...rj->...ij", A, A)
    f = _min_eigvec_inv_power(AtA)
    return _rank2_project(f.reshape(f.shape[:-1] + (3, 3)))


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

    eight_pt = _eight_point if USE_LU_HYPOTHESES else _eight_point_eigh
    Fn = eight_pt(p1n[idx], p2n[idx])                     # (N, 3, 3)
    F = jnp.swapaxes(T2, 0, 1)[None] @ Fn @ T1[None]      # denormalize

    d = jax.vmap(lambda f: _epipolar_dist(f, pts1, pts2))(F)  # (N, K)
    inl = (d < threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # Refit on the best hypothesis' inliers (normalized coords, weighted
    # min-norm nullspace), then rescore. A degenerate refit yields a
    # garbage model that the `better` vote below rejects in favor of the
    # winning hypothesis, so no fallback branch is needed.
    w = inl[best].astype(dtype)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
         jnp.ones_like(x1)], axis=-1)
    AtA = jnp.einsum("ri,r,rj->ij", A, w, A)
    if USE_LU_HYPOTHESES:
        Fr = _min_eigvec_inv_power(AtA).reshape(3, 3)
    else:
        _, vecs = jnp.linalg.eigh(AtA)
        Fr = vecs[:, 0].reshape(3, 3)
    # Rank-2 enforcement on the final model only (one 3x3 SVD).
    u, s, vt = jnp.linalg.svd(Fr)
    Fr = u @ (s.at[2].set(0.0)[:, None] * vt)
    Fr = T2.T @ Fr @ T1
    Fr = jnp.where(jnp.all(jnp.isfinite(Fr)), Fr, jnp.eye(3, dtype=dtype))
    # Keep the refit only if it does not lose inliers (hypotheses are
    # already rank-2 enforced, so inl[best] is that model's true score).
    d_refit = _epipolar_dist(Fr, pts1, pts2)
    inl_refit = (d_refit < threshold) & valid
    better = jnp.sum(inl_refit) >= scores[best]
    F_out = jnp.where(better, Fr, F[best])
    status = jnp.where(better, inl_refit, inl[best])
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
