"""Camera intrinsic refinement — the CostFunctionFactory analog.

The reference ships a Ceres auto-diff reprojection-cost factory per camera
model for intrinsic/extrinsic self-calibration
(src/common/camera_models/CostFunctionFactory.cc:446-470). Here the
functional camera design makes this generic: every model exposes
``project(params, pts)``, so one Gauss-Newton refiner with ``jax.jacfwd``
over the parameter vector serves Pinhole, Kannala-Brandt and Mei alike
(Scaramuzza's polynomial fit has its own least-squares path,
models/cameras/scaramuzza.py: fit_inverse_poly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.models.cameras import equidistant, mei, pinhole, scaramuzza
from mobile_slam_tpu.utils import rotations as rot


def _scaramuzza_project_flat(params: jax.Array, pts: jax.Array) -> jax.Array:
    """Scaramuzza projection over a FLAT parameter vector so the generic
    refiner can differentiate it: [inv_poly (INV_POLY_SIZE), cx, cy, c, d, e]
    (the parameters the reference's Scaramuzza reprojection cost refines,
    CostFunctionFactory.cc:446-470 SCARAMUZZA branch). The forward poly only
    enters lifting, not projection, so it is refit afterwards if needed
    (scaramuzza.fit_inverse_poly's dual)."""
    q = scaramuzza.INV_POLY_SIZE
    return scaramuzza.project(
        {"inv_poly": params[:q], "center": params[q:q + 2],
         "affine": params[q + 2:q + 5]}, pts)


def scaramuzza_flat_params(params: dict) -> np.ndarray:
    return np.concatenate([np.asarray(params["inv_poly"], np.float64),
                           np.asarray(params["center"], np.float64),
                           np.asarray(params["affine"], np.float64)])


_PROJECT = {
    "PINHOLE": pinhole.project,
    "KANNALA_BRANDT": equidistant.project,
    "MEI": mei.project,
    "SCARAMUZZA": _scaramuzza_project_flat,
}


def refine_intrinsics(
    model_type: str,
    params0: jax.Array,     # initial parameter vector for the model
    pts_cam: jax.Array,     # (N, 3) points in the camera frame
    uv_obs: jax.Array,      # (N, 2) observed pixels
    iters: int = 20,
    mask: jax.Array | None = None,  # optional bool mask of free parameters
):
    """Gauss-Newton refinement of the intrinsic vector. Returns
    (params, rms_px_before, rms_px_after)."""
    project = _PROJECT[model_type.upper()]
    params0 = jnp.asarray(params0, jnp.float64)
    pts = jnp.asarray(pts_cam, jnp.float64)
    uv = jnp.asarray(uv_obs, jnp.float64)
    free = (jnp.ones_like(params0, bool) if mask is None
            else jnp.asarray(mask, bool))

    def residual(p):
        return (project(p, pts) - uv).reshape(-1)

    r0 = residual(params0)
    rms_before = float(jnp.sqrt(jnp.mean(r0 ** 2)))

    params = params0
    jac_fn = jax.jacfwd(residual)
    mu = 1e-6
    cost = float(jnp.sum(r0 ** 2))
    for _ in range(iters):
        r = residual(params)
        J = jac_fn(params)
        J = jnp.where(free[None, :], J, 0.0)
        H = J.T @ J
        g = J.T @ r
        H = H + mu * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-12))
        H = H + (1e-12) * jnp.eye(H.shape[0])
        try:
            delta = -jnp.linalg.solve(H, g)
        except Exception:
            break
        new_params = params + jnp.where(free, delta, 0.0)
        new_cost = float(jnp.sum(residual(new_params) ** 2))
        if new_cost < cost:
            params, cost = new_params, new_cost
            mu = max(mu / 3, 1e-12)
        else:
            mu = min(mu * 10, 1e6)
    rms_after = float(jnp.sqrt(cost / r0.shape[0]))
    return np.asarray(params), rms_before, rms_after


def refine_extrinsics(
    model_type: str,
    params: jax.Array,       # fixed intrinsic vector
    q0: jax.Array,           # (4,) wxyz cam-from-world rotation, initial
    t0: jax.Array,           # (3,) cam-from-world translation, initial
    world_pts: jax.Array,    # (N, 3)
    uv_obs: jax.Array,       # (N, 2)
    iters: int = 20,
):
    """Gauss-Newton refinement of a camera pose with intrinsics held fixed —
    the reference factory's camera-pose auto-diff costs
    (CostFunctionFactory.cc generateCostFunction CAMERA_POSE variants,
    :446-470). Tangent update is quaternion box-plus (the same manifold the
    VIO solver uses). Returns (q, t, rms_before, rms_after)."""
    project = _PROJECT[model_type.upper()]
    params = jnp.asarray(params, jnp.float64)
    wp = jnp.asarray(world_pts, jnp.float64)
    uv = jnp.asarray(uv_obs, jnp.float64)
    q = jnp.asarray(q0, jnp.float64)
    t = jnp.asarray(t0, jnp.float64)

    def residual(dx, q_lin, t_lin):
        q_new = rot.quat_boxplus(q_lin, dx[:3])
        t_new = t_lin + dx[3:]
        pc = wp @ rot.quat_to_rot(q_new).T + t_new
        return (project(params, pc) - uv).reshape(-1)

    zero = jnp.zeros(6, jnp.float64)
    rms_before = float(jnp.sqrt(jnp.mean(residual(zero, q, t) ** 2)))
    jac_fn = jax.jacfwd(residual, argnums=0)
    mu = 1e-6
    cost = float(jnp.sum(residual(zero, q, t) ** 2))
    for _ in range(iters):
        r = residual(zero, q, t)
        J = jac_fn(zero, q, t)
        H = J.T @ J + mu * jnp.eye(6)
        delta = -jnp.linalg.solve(H, J.T @ r)
        q_new = rot.quat_boxplus(q, delta[:3])
        t_new = t + delta[3:]
        new_cost = float(jnp.sum(residual(zero, q_new, t_new) ** 2))
        if new_cost < cost:
            q, t, cost = q_new, t_new, new_cost
            mu = max(mu / 3, 1e-12)
        else:
            mu = min(mu * 10, 1e6)
    rms_after = float(jnp.sqrt(cost / (2 * wp.shape[0])))
    return np.asarray(q), np.asarray(t), rms_before, rms_after


def calibrate_camera_odometry(
    model_type: str,
    params: jax.Array,        # fixed intrinsic vector
    q_oc0: jax.Array, t_oc0: jax.Array,   # camera-from-odometry initial
    odo_q0: jax.Array,        # (V, 4) world-from-odometry rotations, initial
    odo_t0: jax.Array,        # (V, 3) world-from-odometry translations
    world_pts: jax.Array,     # (V, N, 3) points observed per view
    uv_obs: jax.Array,        # (V, N, 2)
    iters: int = 25,
):
    """Joint hand-eye calibration: refine the camera-odometry transform AND
    the per-view 6D odometry poses with intrinsics fixed — the reference
    factory's CAMERA_ODOMETRY_TRANSFORM | ODOMETRY_6D_POSE variant
    (CostFunctionFactory.cc:471+; ReprojectionError1 with fixed
    intrinsic_params). The first odometry pose is held constant to pin the
    6-dof gauge (T_wc_i = T_wo_i ∘ T_oc is invariant to T_wo_i → T_wo_i·G,
    T_oc → G⁻¹·T_oc). Returns (q_oc, t_oc, odo_q, odo_t, rms_before,
    rms_after)."""
    project = _PROJECT[model_type.upper()]
    params = jnp.asarray(params, jnp.float64)
    wp = jnp.asarray(world_pts, jnp.float64)
    uv = jnp.asarray(uv_obs, jnp.float64)
    V = wp.shape[0]
    q_oc = jnp.asarray(q_oc0, jnp.float64)
    t_oc = jnp.asarray(t_oc0, jnp.float64)
    odo_q = jnp.asarray(odo_q0, jnp.float64)
    odo_t = jnp.asarray(odo_t0, jnp.float64)
    ndx = 6 + 6 * (V - 1)

    def unpack(dx, q_oc_l, t_oc_l, odo_q_l, odo_t_l):
        q1 = rot.quat_boxplus(q_oc_l, dx[0:3])
        t1 = t_oc_l + dx[3:6]
        d = dx[6:].reshape(V - 1, 6)
        dq = jnp.concatenate([jnp.zeros((1, 3)), d[:, 0:3]])
        dt = jnp.concatenate([jnp.zeros((1, 3)), d[:, 3:6]])
        oq = rot.quat_boxplus(odo_q_l, dq)
        ot = odo_t_l + dt
        return q1, t1, oq, ot

    def residual(dx, q_oc_l, t_oc_l, odo_q_l, odo_t_l):
        q1, t1, oq, ot = unpack(dx, q_oc_l, t_oc_l, odo_q_l, odo_t_l)
        # world -> odometry -> camera
        x_o = jnp.einsum(
            "vij,vnj->vni", jnp.swapaxes(jax.vmap(rot.quat_to_rot)(oq), 1, 2),
            wp - ot[:, None, :])
        r_co = rot.quat_to_rot(q1).T
        x_c = jnp.einsum("ij,vnj->vni", r_co, x_o - t1[None, None, :])
        return (project(params, x_c.reshape(-1, 3))
                - uv.reshape(-1, 2)).reshape(-1)

    zero = jnp.zeros(ndx, jnp.float64)
    r0 = residual(zero, q_oc, t_oc, odo_q, odo_t)
    rms_before = float(jnp.sqrt(jnp.mean(r0 ** 2)))
    jac_fn = jax.jacfwd(residual, argnums=0)
    mu = 1e-6
    cost = float(jnp.sum(r0 ** 2))
    for _ in range(iters):
        r = residual(zero, q_oc, t_oc, odo_q, odo_t)
        J = jac_fn(zero, q_oc, t_oc, odo_q, odo_t)
        H = J.T @ J
        H = H + mu * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-12))
        delta = -jnp.linalg.solve(H + 1e-12 * jnp.eye(ndx), J.T @ r)
        q1, t1, oq, ot = unpack(delta, q_oc, t_oc, odo_q, odo_t)
        new_cost = float(jnp.sum(residual(zero, q1, t1, oq, ot) ** 2))
        if new_cost < cost:
            q_oc, t_oc, odo_q, odo_t, cost = q1, t1, oq, ot, new_cost
            mu = max(mu / 3, 1e-12)
        else:
            mu = min(mu * 10, 1e6)
    rms_after = float(jnp.sqrt(cost / r0.shape[0]))
    return (np.asarray(q_oc), np.asarray(t_oc), np.asarray(odo_q),
            np.asarray(odo_t), rms_before, rms_after)


# ---------------------------------------------------------------------------
# Intrinsic bootstrap from checkerboard views (estimateIntrinsics parity)
# ---------------------------------------------------------------------------


def _bootstrap_pinhole(board_size, object_points, image_points, width,
                       height):
    """Zhang-2000 closed-form focal bootstrap (PinholeCamera.cc:257-336):
    principal point pinned at the image center, per-view board homography,
    two orthogonality constraints per view on the rotation columns, linear
    least squares in (1/fx², 1/fy²)."""
    import cv2

    cx, cy = width / 2.0, height / 2.0
    rows_a, rows_b = [], []
    for obj, img in zip(object_points, image_points):
        M = np.asarray(obj, np.float64)[:, :2]
        H, _ = cv2.findHomography(M.astype(np.float32),
                                  np.asarray(img, np.float32))
        if H is None:
            continue
        H = H.astype(np.float64)
        # Remove the principal point so H's left 3x2 block is K_f·[r1 r2]
        # with K_f = diag(fx, fy, 1).
        H[0] -= H[2] * cx
        H[1] -= H[2] * cy
        h, v = H[:, 0], H[:, 1]
        d1, d2 = (h + v) * 0.5, (h - v) * 0.5
        hn, vn = h / np.linalg.norm(h), v / np.linalg.norm(v)
        d1n, d2n = d1 / np.linalg.norm(d1), d2 / np.linalg.norm(d2)
        # r1 ⟂ r2 and |r1| = |r2| expressed on the normalized columns:
        # sum_j w_j · (col_a)_j (col_b)_j = 0 with w = (1/fx², 1/fy², 1).
        rows_a.append([hn[0] * vn[0], hn[1] * vn[1], hn[2] * vn[2]])
        rows_b.append([d1n[0] * d2n[0], d1n[1] * d2n[1], d1n[2] * d2n[2]])
    A = np.asarray(rows_a + rows_b)
    sol, *_ = np.linalg.lstsq(A[:, :2], -A[:, 2], rcond=None)
    fx = np.sqrt(np.abs(1.0 / sol[0]))
    fy = np.sqrt(np.abs(1.0 / sol[1]))
    return pinhole.make_params(fx, fy, cx, cy, dtype=jnp.float64)


def _board_pnp(params, model_type, obj, img):
    """Extrinsics for one board view: lift pixels through the CANDIDATE
    model to the z=1 plane, then planar PnP with identity K
    (Camera::estimateExtrinsics parity, Camera.cc)."""
    import cv2

    lift = {"KANNALA_BRANDT": equidistant.lift,
            "MEI": mei.lift,
            "PINHOLE": pinhole.lift}[model_type]
    rays = np.asarray(lift(jnp.asarray(params), jnp.asarray(img, np.float64)))
    zs = rays[:, 2:3]
    zs = np.where(np.abs(zs) < 1e-9, 1e-9, zs)
    norm = (rays / zs)[:, :2]
    ok, rvec, tvec = cv2.solvePnP(
        np.ascontiguousarray(np.asarray(obj, np.float64).reshape(-1, 1, 3)),
        np.ascontiguousarray(norm).reshape(-1, 1, 2), np.eye(3), None)
    if not ok:
        return None
    R, _ = cv2.Rodrigues(rvec)
    return R, tvec.reshape(3)


def _reproj_err(params, model_type, object_points, image_points):
    project = _PROJECT[model_type]
    total, count = 0.0, 0
    for obj, img in zip(object_points, image_points):
        ext = _board_pnp(params, model_type, obj, img)
        if ext is None:
            return np.inf
        R, t = ext
        pc = np.asarray(obj, np.float64) @ R.T + t
        uv = np.asarray(project(jnp.asarray(params), jnp.asarray(pc)))
        if not np.all(np.isfinite(uv)):
            return np.inf
        total += float(np.sum((uv - np.asarray(img)) ** 2))
        count += len(obj)
    return np.sqrt(total / max(count, 1))


def _bootstrap_kb(board_size, object_points, image_points, width, height):
    """Hughes-2010 vanishing-point focal bootstrap for the equidistant
    fisheye (EquidistantCamera.cc:234-318): each board row's corners lie on
    a circle in the fisheye image; each pair of row circles intersects in
    the two vanishing points of that direction, and f = |v1 - v2| / π.
    Every candidate f is scored by board reprojection (PnP per view);
    the best one wins."""
    from mobile_slam_tpu.utils import gpl

    u0, v0 = width / 2.0, height / 2.0
    cols, rows = board_size
    cands = []
    for img in image_points:
        img = np.asarray(img, np.float64).reshape(rows, cols, 2)
        fits = [gpl.fit_circle(img[r]) for r in range(rows)]
        for j in range(rows):
            for k in range(j + 1, rows):
                ipts = gpl.intersect_circles(*fits[j], *fits[k])
                if len(ipts) < 2:
                    continue
                f = float(np.linalg.norm(ipts[0] - ipts[1])) / np.pi
                if np.isfinite(f) and f > 0:
                    cands.append(f)
    best_f, best_err = _score_focal_candidates(
        cands, lambda f: equidistant.make_params(f, f, u0, v0,
                                                 dtype=jnp.float64),
        "KANNALA_BRANDT", object_points, image_points)
    if best_f <= 0.0:
        raise ValueError("Kannala-Brandt bootstrap failed with given data")
    return equidistant.make_params(best_f, best_f, u0, v0, dtype=jnp.float64)


def _score_focal_candidates(cands, make, model_type, object_points,
                            image_points, max_eval: int = 12,
                            score_views: int = 4):
    """Dedupe focal candidates to a 1.5%-relative grid, cap the number of
    full reprojection scorings (each costs PnP per view), and score on a
    view subset — the candidate sets the reference sweeps are dominated by
    near-duplicates from neighboring row pairs."""
    if not cands:
        return 0.0, np.inf
    uniq: list[float] = []
    for f in sorted(cands):
        if not uniq or f > uniq[-1] * 1.015:
            uniq.append(f)
    if len(uniq) > max_eval:
        idx = np.linspace(0, len(uniq) - 1, max_eval).astype(int)
        uniq = [uniq[i] for i in idx]
    objs = object_points[:score_views]
    imgs = image_points[:score_views]
    best_f, best_err = 0.0, np.inf
    for f in uniq:
        err = _reproj_err(make(f), model_type, objs, imgs)
        if err < best_err:
            best_err, best_f = err, f
    return best_f, best_err


def _bootstrap_mei(board_size, object_points, image_points, width, height):
    """Mei focal bootstrap at xi=1 (CataCamera.cc:282-370): under the
    unified-sphere model with xi=1, the image of any space line lies on a
    circle satisfying [u, v, 0.5, -0.5(u²+v²)]·C = 0 with
    gamma = sqrt(C3/C4); each non-radial board row contributes a candidate,
    scored by board reprojection."""
    u0, v0 = width / 2.0, height / 2.0
    cols, rows = board_size
    cands = []
    for img in image_points:
        img = np.asarray(img, np.float64).reshape(rows, cols, 2)
        for r in range(rows):
            u = img[r, :, 0] - u0
            v = img[r, :, 1] - v0
            P = np.stack([u, v, np.full_like(u, 0.5),
                          -0.5 * (u * u + v * v)], axis=-1)
            _, _, vt = np.linalg.svd(P)
            C = vt[-1]
            t = C[0] ** 2 + C[1] ** 2 + C[2] * C[3]
            if t < 0.0:
                continue
            d = np.sqrt(1.0 / t)
            nx, ny = C[0] * d, C[1] * d
            if np.hypot(nx, ny) > 0.95:  # radial line: no focal information
                continue
            if C[2] / C[3] <= 0:
                continue
            cands.append(float(np.sqrt(C[2] / C[3])))
    best_g, best_err = _score_focal_candidates(
        cands, lambda g: mei.make_params(g, g, u0, v0, xi=1.0,
                                         dtype=jnp.float64),
        "MEI", object_points, image_points)
    if best_g <= 0.0:
        raise ValueError("Mei bootstrap failed with given data")
    return mei.make_params(best_g, best_g, u0, v0, xi=1.0, dtype=jnp.float64)


def _bootstrap_scaramuzza(board_size, object_points, image_points, width,
                          height):
    """Scaramuzza-thesis closed-form OCAM bootstrap
    (ScaramuzzaCamera.cc:204-557 estimateIntrinsics; "Omnidirectional
    Vision: from Calibration to Robot Motion Estimation", ETH thesis 17635,
    calibrate.m):

    1. per view, the z=0 board plane gives 2N homogeneous equations in the
       scaled partial extrinsics h = (r11, r12, r21, r22, t1, t2) — SVD
       null vector;
    2. the dropped third row (r31, r32) is recovered from orthonormality
       (|r1|=|r2|, r1·r2=0: a quadratic in r32²), sign candidates
       disambiguated by a per-view quadratic-poly least squares — the
       correct H makes the 2N equations consistent (small residual) with
       board depth in front of the camera;
    3. one global least squares over all views solves the forward
       polynomial [a0, 0, a2, a3, a4] jointly with every view's t3.

    Two deviations from the reference: pixels are CENTERED before step 1
    (the thesis model is about the distortion center; the reference feeds
    raw pixels to the same equations, a path its own tests never execute),
    and candidate selection is by equation residual + front-of-camera gate
    instead of assert(single candidate). Returns (flat_params, poses) with
    poses in this repo's z-forward camera frame (the thesis "mirror" frame
    is z-flipped; scaramuzza.py lift negates the poly the same way the
    reference's liftProjective does)."""
    u0, v0 = width / 2.0, height / 2.0
    views = []
    for obj, img in zip(object_points, image_points):
        o = np.asarray(obj, np.float64)
        X, Y = o[:, 0], o[:, 1]
        im = np.asarray(img, np.float64)
        u, v = im[:, 0] - u0, im[:, 1] - v0
        rho = np.hypot(u, v)
        M = np.stack([-v * X, -v * Y, u * X, u * Y, -v, u], axis=-1)
        _, _, vt = np.linalg.svd(M)
        sr11, sr12, sr21, sr22, st1, st2 = vt[-1]
        AA = (sr11 * sr12 + sr21 * sr22) ** 2
        BB = sr11 * sr11 + sr21 * sr21
        CC = sr12 * sr12 + sr22 * sr22
        disc = np.sqrt((CC - BB) ** 2 + 4.0 * AA)
        thirds = []
        for r2 in ((-(CC - BB) + disc) / 2.0, (-(CC - BB) - disc) / 2.0):
            if r2 > 1e-14:
                for s in (1.0, -1.0):
                    sr32 = s * np.sqrt(r2)
                    thirds.append((-(sr11 * sr12 + sr21 * sr22) / sr32, sr32))
            elif abs(r2) <= 1e-14:
                sr31 = np.sqrt(max(CC - BB, 0.0))
                thirds += [(sr31, 0.0), (-sr31, 0.0)]
        best = None
        for sr31, sr32 in thirds:
            lam = 1.0 / np.sqrt(sr11 * sr11 + sr21 * sr21 + sr31 * sr31)
            for sgn in (lam, -lam):
                H = sgn * np.array([[sr11, sr12, st1],
                                    [sr21, sr22, st2],
                                    [sr31, sr32, 0.0]])
                A = H[1, 0] * X + H[1, 1] * Y + H[1, 2]
                C = H[0, 0] * X + H[0, 1] * Y + H[0, 2]
                rz = H[2, 0] * X + H[2, 1] * Y
                Am = np.zeros((2 * len(X), 4))
                Bv = np.empty(2 * len(X))
                for k, pw in enumerate((np.ones_like(rho), rho, rho * rho)):
                    Am[0::2, k] = A * pw
                    Am[1::2, k] = C * pw
                Am[0::2, 3] = -v
                Am[1::2, 3] = -u
                Bv[0::2] = v * rz
                Bv[1::2] = u * rz
                x, *_ = np.linalg.lstsq(Am, Bv, rcond=None)
                resid = float(np.linalg.norm(Am @ x - Bv))
                # Front-of-camera gates in the thesis (z-flipped) frame:
                # f(0) = a0 < 0 and board depth t3 < 0.
                if x[0] < 0.0 and x[3] < 0.0:
                    if best is None or resid < best[0]:
                        best = (resid, H)
        if best is not None:
            views.append((best[1], X, Y, u, v, rho))
    if len(views) < 2:
        raise ValueError("Scaramuzza bootstrap failed with given data")

    # Global solve: [a0, a2, a3, a4] + per-view t3 (a1 = 0, thesis §3).
    nv = len(views)
    blocks, rhs = [], []
    for i, (H, X, Y, u, v, rho) in enumerate(views):
        A = H[1, 0] * X + H[1, 1] * Y + H[1, 2]
        C = H[0, 0] * X + H[0, 1] * Y + H[0, 2]
        rz = H[2, 0] * X + H[2, 1] * Y
        blk = np.zeros((2 * len(X), 4 + nv))
        for k, pw in enumerate((np.ones_like(rho), rho ** 2, rho ** 3,
                                rho ** 4)):
            blk[0::2, k] = A * pw
            blk[1::2, k] = C * pw
        blk[0::2, 4 + i] = -v
        blk[1::2, 4 + i] = -u
        b = np.empty(2 * len(X))
        b[0::2] = v * rz
        b[1::2] = u * rz
        blocks.append(blk)
        rhs.append(b)
    sol, *_ = np.linalg.lstsq(np.concatenate(blocks), np.concatenate(rhs),
                              rcond=None)
    poly = np.array([sol[0], 0.0, sol[1], sol[2], sol[3]])
    t3s = sol[4:]

    # Poses to the repo's z-forward frame: P_repo = diag(1,1,-1) P_thesis.
    poses = []
    for i, (H, *_rest) in enumerate(views):
        R12 = np.stack([H[:, 0], H[:, 1]], axis=1)
        R12[2, :] *= -1.0
        R = np.stack([R12[:, 0], R12[:, 1],
                      np.cross(R12[:, 0], R12[:, 1])], axis=1)
        U, _, Vt = np.linalg.svd(R)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
        poses.append((R, np.array([H[0, 2], H[1, 2], -t3s[i]])))

    inv_poly = scaramuzza.fit_inverse_poly(poly, 0.5 * np.hypot(width, height))
    flat = np.concatenate([inv_poly, [u0, v0, 1.0, 0.0, 0.0]])
    return flat, poses


def _reproj_err_with_poses(params, model_type, objs, uvs, poses):
    """Reprojection RMS with externally supplied board poses (the OCAM
    bootstrap solves its own extrinsics; _board_pnp's lift path needs the
    forward poly, which the flat layout does not carry)."""
    project = _PROJECT[model_type]
    total, count = 0.0, 0
    for (R, t), obj, img in zip(poses, objs, uvs):
        pc = np.asarray(obj, np.float64) @ np.asarray(R).T + t
        uv = np.asarray(project(jnp.asarray(params), jnp.asarray(pc)))
        if not np.all(np.isfinite(uv)):
            return np.inf
        total += float(np.sum((uv - np.asarray(img)) ** 2))
        count += len(obj)
    return np.sqrt(total / max(count, 1))


_BOOTSTRAP = {
    "PINHOLE": _bootstrap_pinhole,
    "KANNALA_BRANDT": _bootstrap_kb,
    "MEI": _bootstrap_mei,
}


def calibrate_from_board(model_type: str, board_size, object_points,
                         image_points, width: int, height: int,
                         refine: bool = True, refine_iters: int = 30):
    """From-scratch intrinsic calibration from checkerboard views — the
    reference's estimateIntrinsics bootstraps (PinholeCamera.cc:257,
    EquidistantCamera.cc:234, CataCamera.cc:282) followed by the autodiff
    GN refinement over all views jointly.

    board_size: (cols, rows) inner-corner grid.
    object_points: list of (cols*rows, 3) board-frame corners (z = 0).
    image_points: list of (cols*rows, 2) detected pixels, row-major.
    Returns (params, rms_px) with params in the model's flat layout.
    """
    mt = model_type.upper()
    if mt == "SCARAMUZZA":
        # OCAM solves its own per-view extrinsics as part of the bootstrap
        # (ScaramuzzaCamera.cc:216-421); _board_pnp's generic lift path
        # cannot serve it because the flat layout carries only inv_poly.
        params, poses = _bootstrap_scaramuzza(
            board_size, object_points, image_points, width, height)
        objs = [np.asarray(o, np.float64) for o in object_points]
        uvs = [np.asarray(i, np.float64) for i in image_points]
        rms = _reproj_err_with_poses(jnp.asarray(params), mt, objs, uvs,
                                     poses)
        if not refine:
            return params, rms
        return _refine_board_joint(mt, params, objs, uvs, poses,
                                   iters=refine_iters)
    if mt not in _BOOTSTRAP:
        raise ValueError(f"no bootstrap for model {mt}")
    params = np.asarray(_BOOTSTRAP[mt](board_size, object_points,
                                       image_points, width, height))
    rms = _reproj_err(jnp.asarray(params), mt, object_points, image_points)
    if not refine:
        return params, rms
    # Joint calibration bundle: intrinsics + per-view board poses refined
    # TOGETHER (the reference hands this stage to Ceres with the factory
    # costs; alternating PnP/intrinsic passes stalls in a focal-distortion
    # local minimum under strong tilt).
    poses0 = []
    objs, uvs = [], []
    for obj, img in zip(object_points, image_points):
        ext = _board_pnp(jnp.asarray(params), mt, obj, img)
        if ext is None:
            continue
        poses0.append(ext)
        objs.append(np.asarray(obj, np.float64))
        uvs.append(np.asarray(img, np.float64))
    params, rms = _refine_board_joint(mt, params, objs, uvs, poses0,
                                      iters=refine_iters)
    return params, rms


def _refine_board_joint(model_type, params0, objs, uvs, poses0,
                        iters: int = 30):
    """Joint GN over [intrinsic vector, per-view (q, t)] — the calibration
    bundle the reference's Ceres problem solves. Rotation updates use
    quaternion box-plus. Returns (params, rms_px)."""
    project = _PROJECT[model_type]
    V = len(objs)
    n_i = int(np.asarray(params0).shape[0])
    params = jnp.asarray(params0, jnp.float64)
    q0 = jnp.asarray(np.stack([_rot_to_quat(R) for R, _ in poses0]),
                     jnp.float64)
    t0 = jnp.asarray(np.stack([t for _, t in poses0]), jnp.float64)
    wp = jnp.asarray(np.stack(objs), jnp.float64)      # (V, N, 3)
    uv = jnp.asarray(np.stack(uvs), jnp.float64)       # (V, N, 2)
    ndx = n_i + 6 * V

    def unpack(dx, params_l, q_l, t_l):
        p1 = params_l + dx[:n_i]
        d = dx[n_i:].reshape(V, 6)
        q1 = rot.quat_boxplus(q_l, d[:, :3])
        t1 = t_l + d[:, 3:]
        return p1, q1, t1

    def residual(dx, params_l, q_l, t_l):
        p1, q1, t1 = unpack(dx, params_l, q_l, t_l)
        Rm = jax.vmap(rot.quat_to_rot)(q1)              # (V, 3, 3)
        pc = jnp.einsum("vij,vnj->vni", Rm, wp) + t1[:, None, :]
        return (project(p1, pc.reshape(-1, 3)) - uv.reshape(-1, 2)).reshape(-1)

    q, t = q0, t0
    zero = jnp.zeros(ndx, jnp.float64)
    jac_fn = jax.jacfwd(residual, argnums=0)
    r = residual(zero, params, q, t)
    cost = float(jnp.sum(r ** 2))
    mu = 1e-4
    for _ in range(iters):
        r = residual(zero, params, q, t)
        J = jac_fn(zero, params, q, t)
        H = J.T @ J
        g = J.T @ r
        Hd = H + mu * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-12))
        try:
            delta = -jnp.linalg.solve(Hd + 1e-12 * jnp.eye(ndx), g)
        except Exception:
            break
        p1, q1, t1 = unpack(delta, params, q, t)
        new_cost = float(jnp.sum(residual(zero, p1, q1, t1) ** 2))
        if np.isfinite(new_cost) and new_cost < cost:
            params, q, t, cost = p1, q1, t1, new_cost
            mu = max(mu / 3, 1e-12)
        else:
            mu = min(mu * 10, 1e6)
    rms = float(np.sqrt(cost / r.shape[0]))
    return np.asarray(params), rms


def _rot_to_quat(R):
    """Rotation matrix -> wxyz quaternion (host-side, numpy)."""
    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diagonal(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    qv = np.zeros(4)
    qv[0] = (R[k, j] - R[j, k]) / s
    qv[1 + i] = 0.25 * s
    qv[1 + j] = (R[j, i] + R[i, j]) / s
    qv[1 + k] = (R[k, i] + R[i, k]) / s
    return qv


def calibrate_from_observations(model_type: str, params0, world_pts, uv_obs,
                                poses, iters: int = 20):
    """Multi-view intrinsic calibration with known camera poses:
    world_pts (V, N, 3), uv_obs (V, N, 2), poses = list of (R_cw, t_cw)."""
    pts_cam = []
    uv = []
    for (R, t), wp, ob in zip(poses, world_pts, uv_obs):
        pts_cam.append(np.asarray(wp) @ np.asarray(R).T + np.asarray(t))
        uv.append(np.asarray(ob))
    return refine_intrinsics(
        model_type, params0, np.concatenate(pts_cam), np.concatenate(uv),
        iters=iters,
    )
