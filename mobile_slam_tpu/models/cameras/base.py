"""Camera factory + uniform interface over the four camera models.

TPU-native replacement for the reference's ``Camera`` virtual interface and
``CameraFactory`` singleton (src/common/camera_models/Camera.cc,
CameraFactory.cc:40-85): instead of virtual dispatch per point, a ``Camera``
bundles a parameter pytree with statically-dispatched vectorized
``lift``/``project`` functions, so a single call handles the full point batch
inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu import config as cfgmod
from mobile_slam_tpu.models.cameras import equidistant, mei, pinhole, scaramuzza


@dataclasses.dataclass(frozen=True)
class Camera:
    """A camera model: parameter pytree + vectorized lift/project.

    ``lift(uv)`` maps pixels (..., 2) to projective rays (..., 3);
    ``lift_normalized(uv)`` rescales rays to z=1 — the coordinate the
    estimator consumes (the reference's 7-vector convention,
    include/common/image_frame.h:14). ``project(pts)`` maps camera-frame 3D
    points (..., 3) to pixels (..., 2).
    """

    model_type: str
    params: Any
    width: int
    height: int
    focal: float
    _lift: Callable = dataclasses.field(repr=False, default=None)
    _project: Callable = dataclasses.field(repr=False, default=None)

    def lift(self, uv: jax.Array) -> jax.Array:
        return self._lift(self.params, uv)

    def lift_normalized(self, uv: jax.Array) -> jax.Array:
        ray = self._lift(self.params, uv)
        z = ray[..., 2:3]
        safe_z = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
        return ray / safe_z

    def project(self, pts: jax.Array) -> jax.Array:
        return self._project(self.params, pts)


def make_camera(cam_cfg: cfgmod.CameraConfig, dtype=jnp.float32) -> Camera:
    """Build a Camera from config (CameraFactory::generateCamera parity)."""
    # Canonicalize so a float64 request without jax_enable_x64 resolves to the
    # float32 it would get anyway, without a per-call UserWarning from asarray.
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    mt = cam_cfg.model_type.upper()
    if mt == cfgmod.MODEL_PINHOLE:
        params = pinhole.make_params(
            cam_cfg.fx, cam_cfg.fy, cam_cfg.cx, cam_cfg.cy, *cam_cfg.dist, dtype=dtype
        )
        lift_fn, proj_fn = pinhole.lift, pinhole.project
    elif mt == cfgmod.MODEL_KANNALA_BRANDT:
        params = equidistant.make_params(
            cam_cfg.fx, cam_cfg.fy, cam_cfg.cx, cam_cfg.cy, *cam_cfg.dist, dtype=dtype
        )
        lift_fn, proj_fn = equidistant.lift, equidistant.project
    elif mt == cfgmod.MODEL_MEI:
        params = mei.make_params(
            cam_cfg.fx, cam_cfg.fy, cam_cfg.cx, cam_cfg.cy, *cam_cfg.dist,
            xi=cam_cfg.xi, dtype=dtype,
        )
        lift_fn, proj_fn = mei.lift, mei.project
    elif mt == cfgmod.MODEL_SCARAMUZZA:
        poly = np.asarray(cam_cfg.ocam_poly, dtype=np.float64)
        inv_poly = np.asarray(cam_cfg.ocam_inv_poly, dtype=np.float64)
        if inv_poly.size == 0 and poly.size > 0:
            max_rho = 0.5 * float(np.hypot(cam_cfg.width, cam_cfg.height))
            inv_poly = scaramuzza.fit_inverse_poly(poly, max_rho)
        params = scaramuzza.make_params(
            poly, inv_poly, cam_cfg.ocam_center, cam_cfg.ocam_affine, dtype=dtype
        )
        lift_fn, proj_fn = scaramuzza.lift, scaramuzza.project
    else:
        raise ValueError(f"unknown camera model type: {cam_cfg.model_type}")

    return Camera(
        model_type=mt,
        params=params,
        width=cam_cfg.width,
        height=cam_cfg.height,
        focal=float(cam_cfg.focal_length),
        _lift=lift_fn,
        _project=proj_fn,
    )
