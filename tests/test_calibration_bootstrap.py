"""From-scratch intrinsic bootstrap (calibrate_from_board) round-trips known
intrinsics from synthetic checkerboard views — estimateIntrinsics parity
(PinholeCamera.cc:257, EquidistantCamera.cc:234, CataCamera.cc:282)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mobile_slam_tpu.models.cameras import equidistant, mei, pinhole, scaramuzza
from mobile_slam_tpu.models.cameras.calibration import (
    _scaramuzza_project_flat, calibrate_from_board)

BOARD = (9, 6)          # inner corners (cols, rows)
SQUARE = 0.04           # m


def _board_object_points():
    cols, rows = BOARD
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.stack([xs.ravel() * SQUARE, ys.ravel() * SQUARE,
                     np.zeros(cols * rows)], axis=-1)


def _euler_rot(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _render_views(project_fn, params, width, height, n_views=10, seed=0,
                  depth=0.55, noise_px=0.1, lateral=0.12):
    """Synthetic board views at strong tilts and off-center placements (a
    real calibration sweep fills the FOV — centered low-tilt views leave
    the focal/distortion trade-off unconstrained for Zhang, and fisheye
    line images nearly straight for the Mei bootstrap's curvature gate)."""
    rng = np.random.default_rng(seed)
    obj = _board_object_points()
    center = obj.mean(axis=0)
    objs, imgs = [], []
    tilts = [(-0.6, 0.15), (0.6, -0.15), (0.15, -0.6), (-0.15, 0.6),
             (0.45, 0.45), (-0.45, -0.45), (0.0, 0.0), (0.3, -0.5),
             (-0.5, 0.3), (0.5, 0.5)]
    offs = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
            (1, 1), (-1, -1), (1, -1), (-1, 1), (0, 0)]
    tries = 0
    while len(objs) < n_views and tries < 4 * n_views:
        v = tries
        tries += 1
        rx, ry = tilts[v % len(tilts)]
        ox, oy = offs[v % len(offs)]
        R = _euler_rot(rx + 0.05 * rng.normal(), ry + 0.05 * rng.normal(),
                       rng.uniform(-0.5, 0.5))
        t = np.array([lateral * ox + rng.uniform(-0.02, 0.02),
                      lateral * oy + rng.uniform(-0.02, 0.02),
                      depth * rng.uniform(0.9, 1.25)])
        pc = (obj - center) @ R.T + t
        if (pc[:, 2] < 0.05).any():
            continue
        uv = np.asarray(project_fn(jnp.asarray(params),
                                   jnp.asarray(pc, jnp.float64)))
        uv = uv + rng.normal(size=uv.shape) * noise_px
        inside = ((uv[:, 0] > 2) & (uv[:, 0] < width - 2)
                  & (uv[:, 1] > 2) & (uv[:, 1] < height - 2))
        if not inside.all():
            continue
        objs.append(obj)
        imgs.append(uv)
    assert len(objs) >= 6, "bad synthetic board setup"
    return objs, imgs


class TestPinholeBootstrap:
    def test_round_trip(self):
        true = pinhole.make_params(460.0, 455.0, 376.0, 240.0,
                                   -0.28, 0.07, 2e-4, 1e-5,
                                   dtype=jnp.float64)
        objs, imgs = _render_views(pinhole.project, true, 752, 480)
        params, rms = calibrate_from_board(
            "PINHOLE", BOARD, objs, imgs, 752, 480)
        assert rms < 0.5, f"board reprojection RMS {rms:.3f} px"
        # Focal recovered within a few percent (principal point is pinned
        # at the image center by the bootstrap; GN refinement frees it).
        assert abs(params[0] - 460.0) / 460.0 < 0.05
        assert abs(params[1] - 455.0) / 455.0 < 0.05

    def test_bootstrap_only_gives_sane_focal(self):
        true = pinhole.make_params(460.0, 455.0, 376.0, 240.0,
                                   dtype=jnp.float64)
        objs, imgs = _render_views(pinhole.project, true, 752, 480)
        params, _ = calibrate_from_board(
            "PINHOLE", BOARD, objs, imgs, 752, 480, refine=False)
        assert abs(params[0] - 460.0) / 460.0 < 0.15
        assert abs(params[1] - 455.0) / 455.0 < 0.15


class TestKannalaBrandtBootstrap:
    def test_round_trip(self):
        true = equidistant.make_params(
            190.978, 190.973, 256.0, 256.0,
            0.00348, 0.000715, -0.00205, 0.000203, dtype=jnp.float64)
        objs, imgs = _render_views(equidistant.project, true, 512, 512,
                                   depth=0.45)
        params, rms = calibrate_from_board(
            "KANNALA_BRANDT", BOARD, objs, imgs, 512, 512)
        assert rms < 0.5, f"board reprojection RMS {rms:.3f} px"
        assert abs(params[0] - 190.978) / 190.978 < 0.05
        assert abs(params[1] - 190.973) / 190.973 < 0.05

    def test_vanishing_point_focal_is_sane(self):
        true = equidistant.make_params(190.978, 190.973, 256.0, 256.0,
                                       dtype=jnp.float64)
        objs, imgs = _render_views(equidistant.project, true, 512, 512,
                                   depth=0.45)
        params, _ = calibrate_from_board(
            "KANNALA_BRANDT", BOARD, objs, imgs, 512, 512, refine=False)
        assert abs(params[0] - 190.978) / 190.978 < 0.25


class TestMeiBootstrap:
    def test_round_trip(self):
        true = mei.make_params(380.0, 378.0, 320.0, 240.0, xi=0.95,
                               dtype=jnp.float64)
        objs, imgs = _render_views(mei.project, true, 640, 480, depth=0.5)
        params, rms = calibrate_from_board("MEI", BOARD, objs, imgs,
                                           640, 480)
        assert rms < 1.0, f"board reprojection RMS {rms:.3f} px"
        # Under the unified model, (gamma, xi) trade off; the recovered
        # gamma/(1+xi) pinhole-equivalent focal is the stable quantity.
        f_eq_true = 380.0 / (1.0 + 0.95)
        f_eq = float(params[0]) / (1.0 + float(params[8]))
        assert abs(f_eq - f_eq_true) / f_eq_true < 0.08


class TestScaramuzzaBootstrap:
    """OCAM bootstrap oracle (ScaramuzzaCamera.cc:204-557): ground-truth
    camera built from a forward polynomial + its fitted inverse, synthetic
    board sweep rendered through the flat projection, calibration must
    reproduce the projection behavior."""

    @staticmethod
    def _true_flat():
        poly = np.array([-250.0, 0.0, 1.8e-3, -2.0e-6, 8.0e-9])
        inv_poly = scaramuzza.fit_inverse_poly(poly, 0.5 * np.hypot(752, 480))
        return poly, np.concatenate([inv_poly, [376.0, 240.0, 1.0, 0.0, 0.0]])

    def test_round_trip(self):
        _, flat_true = self._true_flat()
        objs, imgs = _render_views(_scaramuzza_project_flat,
                                   jnp.asarray(flat_true), 752, 480,
                                   depth=0.4, lateral=0.22)
        params, rms = calibrate_from_board(
            "SCARAMUZZA", BOARD, objs, imgs, 752, 480)
        assert rms < 0.5, f"board reprojection RMS {rms:.3f} px"
        # The calibrated inverse poly must reproduce the true projection
        # over the incidence-angle range the board sweep actually covers
        # (beyond it the polynomial extrapolates, as any calibration does).
        thetas = np.linspace(-1.5, -0.85, 25)  # atan2(-pz, norm) range
        pts = np.stack([np.cos(thetas), np.zeros_like(thetas),
                        -np.sin(thetas)], axis=-1)
        uv_true = np.asarray(_scaramuzza_project_flat(
            jnp.asarray(flat_true), jnp.asarray(pts)))
        uv_est = np.asarray(_scaramuzza_project_flat(
            jnp.asarray(params), jnp.asarray(pts)))
        err = np.linalg.norm(uv_true - uv_est, axis=-1)
        assert err.max() < 2.0, f"ray-fan max error {err.max():.2f} px"

    def test_bootstrap_only_recovers_poly(self):
        poly_true, flat_true = self._true_flat()
        objs, imgs = _render_views(_scaramuzza_project_flat,
                                   jnp.asarray(flat_true), 752, 480,
                                   depth=0.4, lateral=0.22)
        params, rms = calibrate_from_board(
            "SCARAMUZZA", BOARD, objs, imgs, 752, 480, refine=False)
        assert rms < 3.0, f"closed-form bootstrap RMS {rms:.3f} px"
