"""Host-side (numpy, float64) geometry kernels for one-time initialization.

Initialization is the cold path (runs once per session / reset), so it runs
on host in double precision, mirroring the reference's design where the
init pipeline is CPU-side OpenCV+Ceres
(src/frontend/initialization/solve_5pts.cpp, initial_sfm.cpp).

Self-contained replacements for the OpenCV calls the reference uses:
* ``solve_relative_rt``  — cv::findEssentialMat(RANSAC) + cv::recoverPose
  (solve_5pts.cpp:7-43), built on the normalized 8-point algorithm with
  cheirality-based disambiguation.
* ``triangulate_point``  — the 4x4 DLT SVD (initial_sfm.cpp:8-20).
* ``solve_pnp``          — cv::solvePnP with K = I (initial_sfm.cpp:22-66):
  DLT initialization + Gauss-Newton refinement on SE(3).
"""

from __future__ import annotations

import numpy as np


def quat_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rot_to_quat(R):
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = np.argmax(np.diag(R))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.empty(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def exp_so3(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + skew(w)
    k = w / th
    K = skew(k)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


# ---------------------------------------------------------------------------
# Essential matrix + relative pose
# ---------------------------------------------------------------------------

def _essential_8pt(p1, p2):
    """E from >=8 normalized-image-plane correspondences (N,2)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = np.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                  x1, y1, np.ones_like(x1)], axis=-1)
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    E = vt[-1].reshape(3, 3)
    u, s, vt = np.linalg.svd(E)
    # Project onto the essential manifold (two equal singular values).
    return u @ np.diag([1.0, 1.0, 0.0]) @ vt


def _epipolar_dist(E, p1, p2):
    h1 = np.concatenate([p1, np.ones((len(p1), 1))], axis=1)
    h2 = np.concatenate([p2, np.ones((len(p2), 1))], axis=1)
    l2 = h1 @ E.T
    l1 = h2 @ E
    d2 = np.abs(np.sum(l2 * h2, axis=1)) / np.maximum(
        np.linalg.norm(l2[:, :2], axis=1), 1e-12)
    d1 = np.abs(np.sum(l1 * h1, axis=1)) / np.maximum(
        np.linalg.norm(l1[:, :2], axis=1), 1e-12)
    return np.maximum(d1, d2)


def triangulate_point(pose0, pose1, p0, p1):
    """Two-view DLT (initial_sfm.cpp:8-20). pose = (3,4) [R|t] cam-from-world;
    p = (2,) normalized image coords. Returns (3,) world point."""
    A = np.empty((4, 4))
    A[0] = p0[0] * pose0[2] - pose0[0]
    A[1] = p0[1] * pose0[2] - pose0[1]
    A[2] = p1[0] * pose1[2] - pose1[0]
    A[3] = p1[1] * pose1[2] - pose1[1]
    _, _, vt = np.linalg.svd(A)
    X = vt[-1]
    return X[:3] / X[3]


def solve_relative_rt(corres, threshold_focal: float = 460.0,
                      seed: int = 0):
    """Relative pose from normalized-plane correspondences
    (MotionEstimator::solveRelativeRT, solve_5pts.cpp:7-43): RANSAC essential
    (threshold 1/focal, 0.99 confidence budget ~ fixed 200 hypotheses) +
    cheirality pose recovery. corres: list of (ray_i (3,), ray_j (3,)).

    Returns (ok, R, t) with the reference's output convention: R, t map
    frame-j points into frame-i (R = R_ij^T applied as in solve_5pts.cpp's
    final transpose — here directly the i<-j rotation)."""
    if len(corres) < 15:
        return False, None, None
    p1 = np.asarray([c[0][:2] / c[0][2] for c in corres])
    p2 = np.asarray([c[1][:2] / c[1][2] for c in corres])
    n = len(p1)
    # Adaptive RANSAC threshold ~1px in normalized coords (solve_5pts.cpp:17-19),
    # scaled per-point by the local pixel->normalized-plane Jacobian
    # (1 + r^2)/f so wide-FOV edge features are judged in pixel units rather
    # than dominating the normalized-coordinate metric.
    base = 1.0 / threshold_focal if threshold_focal > 0 else 0.003
    r2 = np.minimum(np.sum(p1 * p1, axis=1), np.sum(p2 * p2, axis=1))
    thresh = base * (1.0 + r2)

    rng = np.random.default_rng(seed)
    best_inl = None
    best_cnt = -1
    for _ in range(200):
        idx = rng.choice(n, 8, replace=False)
        E = _essential_8pt(p1[idx], p2[idx])
        d = _epipolar_dist(E, p1, p2)
        inl = d < thresh
        if inl.sum() > best_cnt:
            best_cnt = int(inl.sum())
            best_inl = inl
    if best_cnt < 12:
        return False, None, None
    # Two refit passes on the inlier set.
    inl = best_inl
    for _ in range(2):
        E = _essential_8pt(p1[inl], p2[inl])
        new_inl = _epipolar_dist(E, p1, p2) < thresh
        if new_inl.sum() < 8:
            break
        inl = new_inl

    # Pose recovery with cheirality test (cv::recoverPose equivalent).
    u, _, vt = np.linalg.svd(E)
    if np.linalg.det(u) < 0:
        u = -u
    if np.linalg.det(vt) < 0:
        vt = -vt
    W = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    candidates = []
    for R2 in (u @ W @ vt, u @ W.T @ vt):
        for t2 in (u[:, 2], -u[:, 2]):
            candidates.append((R2, t2))

    def count_front(R2, t2):
        # Camera 1 at identity; camera 2 = [R2 | t2] (cam2-from-cam1).
        P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P1 = np.hstack([R2, t2[:, None]])
        cnt = 0
        for a, b in zip(p1[inl], p2[inl]):
            X = triangulate_point(P0, P1, a, b)
            z1 = X[2]
            z2 = (R2 @ X + t2)[2]
            if z1 > 0 and z2 > 0:
                cnt += 1
        return cnt

    counts = [count_front(R2, t2) for R2, t2 in candidates]
    R21, t21 = candidates[int(np.argmax(counts))]
    if max(counts) < max(8, 0.5 * inl.sum()):
        return False, None, None
    if inl.sum() <= 12:
        return False, None, None
    # Convention per solve_5pts.cpp:30-41: return R = R21^T, T = -R21^T t21
    # (the transform of frame-j coordinates into frame-i).
    R = R21.T
    T = -R21.T @ t21
    return True, R, T


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------

def solve_pnp(pts3d, pts2d, R_init=None, t_init=None, iters=10):
    """Minimal PnP on normalized coordinates (K = I): optional DLT init,
    Gauss-Newton refinement of the cam-from-world pose. Returns
    (ok, R_cw, t_cw)."""
    pts3d = np.asarray(pts3d, float)
    pts2d = np.asarray(pts2d, float)
    n = len(pts3d)
    if n < 6:
        return False, None, None

    if R_init is None:
        # DLT for P = [R|t] up to scale.
        A = np.zeros((2 * n, 12))
        for i, (X, x) in enumerate(zip(pts3d, pts2d)):
            Xh = np.append(X, 1.0)
            A[2 * i, 0:4] = Xh
            A[2 * i, 8:12] = -x[0] * Xh
            A[2 * i + 1, 4:8] = Xh
            A[2 * i + 1, 8:12] = -x[1] * Xh
        _, _, vt = np.linalg.svd(A)
        P = vt[-1].reshape(3, 4)
        Rr = P[:, :3]
        u, s, vt2 = np.linalg.svd(Rr)
        R = u @ vt2
        if np.linalg.det(R) < 0:
            R = -R
            P = -P
            u, s, vt2 = np.linalg.svd(-Rr)
        scale = np.mean(s)
        t = P[:, 3] / scale
        # Cheirality fix.
        z = (pts3d @ R.T + t)[:, 2]
        if np.median(z) < 0:
            return False, None, None
    else:
        R, t = R_init.copy(), t_init.copy()

    for _ in range(iters):
        pc = pts3d @ R.T + t
        z = pc[:, 2]
        z = np.where(np.abs(z) < 1e-8, 1e-8, z)
        proj = pc[:, :2] / z[:, None]
        r = (proj - pts2d).reshape(-1)
        # Jacobian wrt (δθ (right-perturbation R·exp(δθ)), δt).
        J = np.zeros((2 * n, 6))
        inv_z = 1.0 / z
        x, y = pc[:, 0], pc[:, 1]
        # d proj / d pc
        dp = np.zeros((n, 2, 3))
        dp[:, 0, 0] = inv_z
        dp[:, 0, 2] = -x * inv_z * inv_z
        dp[:, 1, 1] = inv_z
        dp[:, 1, 2] = -y * inv_z * inv_z
        # d pc / dδθ = -R [X]x ; d pc / dδt = I
        for i in range(n):
            J[2 * i:2 * i + 2, 0:3] = dp[i] @ (-R @ skew(pts3d[i]))
            J[2 * i:2 * i + 2, 3:6] = dp[i]
        H = J.T @ J + 1e-9 * np.eye(6)
        g = J.T @ r
        try:
            delta = -np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            return False, None, None
        R = R @ exp_so3(delta[0:3])
        t = t + delta[3:6]
        if np.linalg.norm(delta) < 1e-10:
            break
    if not (np.all(np.isfinite(R)) and np.all(np.isfinite(t))):
        return False, None, None
    return True, R, t
