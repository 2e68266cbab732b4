"""Camera model tests: lift/project roundtrips for all four models and
OpenCV oracles for pinhole (cv2.projectPoints) and Kannala-Brandt
(cv2.fisheye.projectPoints). Mirrors the reference camera models in
src/common/camera_models/."""

import cv2
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import CameraConfig, MODEL_KANNALA_BRANDT, MODEL_MEI, \
    MODEL_PINHOLE, MODEL_SCARAMUZZA
from mobile_slam_tpu.models.cameras import scaramuzza
from mobile_slam_tpu.models.cameras.base import make_camera

# Real TUM-VI room1 cam0 calibration (config/tum_vi_room1.yaml).
TUMVI_KB = CameraConfig(
    model_type=MODEL_KANNALA_BRANDT,
    width=512, height=512,
    focal_length=190.97847715128717,
    fx=190.97847715128717, fy=190.9733070521226,
    cx=254.93170605935475, cy=256.8974428996504,
    dist=(0.0034823894022493434, 0.0007150348452162257,
          -0.0020532361418706202, 0.00020293673591811182),
)

# EuRoC-like pinhole.
EUROC_PINHOLE = CameraConfig(
    model_type=MODEL_PINHOLE,
    width=752, height=480,
    focal_length=461.6,
    fx=461.6, fy=460.3, cx=363.0, cy=248.1,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
)

MEI_CAM = CameraConfig(
    model_type=MODEL_MEI,
    width=752, height=480,
    focal_length=460.0,
    fx=460.0, fy=459.0, cx=376.0, cy=240.0,
    dist=(-0.01, 0.005, 1e-4, -2e-4),
    xi=0.95,
)


def random_pixels(cfg, n=200, margin=40, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(margin, cfg.width - margin, n)
    v = rng.uniform(margin, cfg.height - margin, n)
    return np.stack([u, v], axis=-1)


class TestRoundtrips:
    def _roundtrip(self, cfg, atol):
        cam = make_camera(cfg, dtype=jnp.float64)
        uv = random_pixels(cfg)
        rays = cam.lift(jnp.asarray(uv))
        uv2 = np.asarray(cam.project(rays))
        np.testing.assert_allclose(uv2, uv, atol=atol)

    def test_pinhole(self):
        # Fixed-point inverse distortion converges linearly; edge points with
        # EuRoC-strength k1 land at ~1e-5 px after 20 iterations.
        self._roundtrip(EUROC_PINHOLE, 1e-4)

    def test_kannala_brandt(self):
        self._roundtrip(TUMVI_KB, 1e-6)

    def test_mei(self):
        self._roundtrip(MEI_CAM, 1e-5)

    def test_kb_lift_is_unit_ray(self):
        cam = make_camera(TUMVI_KB, dtype=jnp.float64)
        rays = np.asarray(cam.lift(jnp.asarray(random_pixels(TUMVI_KB))))
        np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-9)


class TestOpenCVOracles:
    def test_pinhole_project_matches_cv2(self):
        cfg = EUROC_PINHOLE
        cam = make_camera(cfg, dtype=jnp.float64)
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(100, 3)) * [0.5, 0.5, 0.0] + [0, 0, 3.0]
        K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]])
        D = np.array(cfg.dist)  # (k1, k2, p1, p2)
        want, _ = cv2.projectPoints(
            pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, D
        )
        got = np.asarray(cam.project(jnp.asarray(pts)))
        np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-6)

    def test_kb_project_matches_cv2_fisheye(self):
        cfg = TUMVI_KB
        cam = make_camera(cfg, dtype=jnp.float64)
        rng = np.random.default_rng(2)
        # Wide-angle points (fisheye covers >90 deg).
        pts = rng.normal(size=(100, 3)) * [1.5, 1.5, 0.0] + [0, 0, 2.0]
        K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]])
        D = np.array(cfg.dist)
        want, _ = cv2.fisheye.projectPoints(
            pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, D
        )
        got = np.asarray(cam.project(jnp.asarray(pts)))
        np.testing.assert_allclose(got, want.reshape(-1, 2), atol=1e-6)

    def test_kb_lift_matches_cv2_undistort(self):
        cfg = TUMVI_KB
        cam = make_camera(cfg, dtype=jnp.float64)
        uv = random_pixels(cfg, seed=3)
        K = np.array([[cfg.fx, 0, cfg.cx], [0, cfg.fy, cfg.cy], [0, 0, 1]])
        D = np.array(cfg.dist)
        want = cv2.fisheye.undistortPoints(
            uv.reshape(-1, 1, 2), K, D
        ).reshape(-1, 2)
        rays = np.asarray(cam.lift_normalized(jnp.asarray(uv)))
        np.testing.assert_allclose(rays[:, :2], want, atol=1e-6)


class TestScaramuzza:
    def test_roundtrip_with_fitted_inverse(self):
        # Equidistant-like forward polynomial: z ≈ -(rho/f - ...) convention:
        # OCAM poly maps rho -> z with z negative looking forward; emulate a
        # ~190px focal fisheye.
        f = 190.0
        poly = np.array([-f, 0.0, 1.0 / (2 * f), 0.0, 1.0 / (8 * f**3)])
        max_rho = 300.0
        inv_poly = scaramuzza.fit_inverse_poly(poly, max_rho)
        cfg = CameraConfig(
            model_type=MODEL_SCARAMUZZA,
            width=512, height=512, focal_length=f,
            ocam_poly=tuple(poly), ocam_inv_poly=tuple(inv_poly),
            ocam_center=(256.0, 256.0), ocam_affine=(1.0, 0.0, 0.0),
        )
        cam = make_camera(cfg, dtype=jnp.float64)
        uv = random_pixels(cfg, margin=80, seed=4)
        rays = cam.lift(jnp.asarray(uv))
        uv2 = np.asarray(cam.project(rays))
        np.testing.assert_allclose(uv2, uv, atol=0.05)  # inverse-poly fit error
