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
