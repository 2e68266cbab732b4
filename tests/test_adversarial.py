"""Adversarial tier tests: independent-oracle parity + nuisance renderer.

The oracle-parity tests are the de-circularization anchor (VERDICT r2):
our Kannala-Brandt and pinhole+radtan implementations are pinned against
OpenCV's independent implementations (cv2.fisheye / cv2.projectPoints), so
camera-model correctness no longer rests on code grading itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mobile_slam_tpu.config import CameraConfig
from mobile_slam_tpu.eval import adversarial as adv
from mobile_slam_tpu.eval.simulation import SimConfig
from mobile_slam_tpu.models.cameras.base import make_camera

pytestmark = pytest.mark.skipif(not adv.HAS_CV2, reason="cv2 unavailable")

R_IC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
T_IC = np.array([0.045, 0.073, -0.044])

TUMVI_KB = CameraConfig(
    model_type="KANNALA_BRANDT", width=512, height=512,
    focal_length=190.97847715128717,
    fx=190.97847715128717, fy=190.9733070521226,
    cx=254.93170605935475, cy=256.8974428996504,
    dist=(0.0034823894022493434, 0.0007150348452162257,
          -0.0020532361418706202, 0.00020293673591811182),
    r_ic=tuple(R_IC.reshape(-1)), t_ic=tuple(T_IC),
)

EUROC_PINHOLE = CameraConfig(
    model_type="PINHOLE", width=752, height=480, focal_length=460.0,
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
    r_ic=tuple(np.eye(3).reshape(-1)), t_ic=(0.0, 0.0, 0.0),
)


def _test_points(rng, n=200, fov_z=0.25):
    """Random camera-frame points across the FOV (z > fov_z keeps KB's θ
    within the fisheye working range and radtan within its valid branch)."""
    pts = rng.uniform(-1.0, 1.0, (n, 3))
    pts[:, 2] = rng.uniform(fov_z, 3.0, n)
    return pts


class TestOracleParity:
    def test_kb_project_matches_cv2_fisheye(self):
        rng = np.random.default_rng(0)
        pts = _test_points(rng)
        cam = make_camera(TUMVI_KB, dtype=jnp.float64)
        ours = np.asarray(cam.project(jnp.asarray(pts)))
        oracle = adv.oracle_project(TUMVI_KB, pts)
        inside = ((oracle[:, 0] > 0) & (oracle[:, 0] < 512)
                  & (oracle[:, 1] > 0) & (oracle[:, 1] < 512))
        assert inside.sum() > 50
        err = np.abs(ours - oracle)[inside].max()
        assert err < 1e-4, f"KB project differs from cv2.fisheye by {err} px"

    def test_kb_lift_matches_cv2_fisheye(self):
        rng = np.random.default_rng(1)
        uv = rng.uniform(40, 470, (200, 2))
        cam = make_camera(TUMVI_KB, dtype=jnp.float64)
        ours = np.asarray(cam.lift(jnp.asarray(uv)))
        ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)
        oracle = adv.oracle_unproject(TUMVI_KB, uv)
        assert np.abs(ours - oracle).max() < 1e-6

    def test_pinhole_project_matches_cv2(self):
        rng = np.random.default_rng(2)
        # radtan polynomial diverges far outside the calibrated FOV; test
        # inside it (EuRoC FOV at 752x480 with f≈458 is |x/z| ≲ 0.85).
        pts = _test_points(rng, fov_z=1.0)
        pts[:, :2] *= 0.7
        cam = make_camera(EUROC_PINHOLE, dtype=jnp.float64)
        ours = np.asarray(cam.project(jnp.asarray(pts)))
        oracle = adv.oracle_project(EUROC_PINHOLE, pts)
        assert np.abs(ours - oracle).max() < 1e-4

    def test_pinhole_lift_matches_cv2(self):
        rng = np.random.default_rng(3)
        uv = rng.uniform((60, 60), (690, 420), (200, 2))
        cam = make_camera(EUROC_PINHOLE, dtype=jnp.float64)
        ours = np.asarray(cam.lift(jnp.asarray(uv)))
        ours = ours / np.linalg.norm(ours, axis=-1, keepdims=True)
        oracle = adv.oracle_unproject(EUROC_PINHOLE, uv)
        assert np.abs(ours - oracle).max() < 1e-5


class TestAdversarialRenderer:
    def _data(self, nuis, duration=1.0):
        scfg = SimConfig(duration=duration, cam_rate=20.0, imu_rate=200.0,
                         num_landmarks=150, seed=5)
        return adv.make_adversarial_data(scfg, TUMVI_KB, R_IC, T_IC, nuis)

    def test_clean_oracle_frame_renders(self):
        data = self._data(adv.NuisanceConfig())
        img = adv.render_frame_adversarial(data, 3, TUMVI_KB, R_IC, T_IC,
                                           adv.NuisanceConfig())
        assert img.shape == (512, 512) and img.dtype == np.uint8
        assert img.std() > 5.0  # textured, not blank

    def test_nuisances_change_pixels_but_keep_structure(self):
        nuis = adv.LEVELS[2]
        data = self._data(nuis)
        clean = adv.render_frame_adversarial(data, 3, TUMVI_KB, R_IC, T_IC,
                                             adv.NuisanceConfig())
        dirty = adv.render_frame_adversarial(data, 3, TUMVI_KB, R_IC, T_IC,
                                             nuis, movers=adv.make_movers(nuis))
        assert np.abs(clean.astype(float) - dirty.astype(float)).mean() > 1.0
        # Same underlying scene: the two frames stay correlated.
        c = np.corrcoef(clean.ravel(), dirty.ravel())[0, 1]
        assert c > 0.5

    def test_rolling_shutter_distorts_under_motion(self):
        """Level-4 rolling shutter: banded row-time rendering must (a) be a
        no-op when the readout is 0, (b) visibly shear the scene under the
        sim's real motion, (c) stay the same underlying scene."""
        import dataclasses
        nuis = adv.NuisanceConfig(rs_readout_s=0.02)
        data = self._data(nuis, duration=4.0)
        fi = 60  # mid-sequence, trajectory in full swing
        rs = adv.render_frame_adversarial(data, fi, TUMVI_KB, R_IC, T_IC,
                                          nuis)
        gs = adv.render_frame_adversarial(
            data, fi, TUMVI_KB, R_IC, T_IC,
            dataclasses.replace(nuis, rs_readout_s=0.0))
        assert rs.shape == gs.shape and rs.dtype == np.uint8
        d = np.abs(rs.astype(float) - gs.astype(float))
        assert d.mean() > 0.05         # sheared, not identical
        c = np.corrcoef(rs.ravel(), gs.ravel())[0, 1]
        assert c > 0.5                 # same scene
        # 20 ms over a 50 ms frame: top and bottom rows expose 20 ms apart,
        # so distortion must grow away from the (time-centered) middle rows.
        mid = d[220:292].mean()
        edges = 0.5 * (d[:72].mean() + d[-72:].mean())
        assert edges > mid

    def test_level4_preset_has_rolling_shutter(self):
        assert adv.LEVELS[4].rs_readout_s > 0.0

    def test_vignette_darkens_corners_only(self):
        v = adv._vignette_map(512, 512, 0.4)
        assert v[256, 256] > 0.99
        assert v[0, 0] < 0.75

    def test_colored_imu_noise_is_correlated(self):
        nuis = adv.NuisanceConfig(imu_ar1_rho=0.98, imu_ar1_acc=0.05)
        scfg = SimConfig(duration=4.0, num_landmarks=50, seed=5)
        clean = adv.make_adversarial_data(scfg, TUMVI_KB, R_IC, T_IC,
                                          adv.NuisanceConfig())
        dirty = adv.make_adversarial_data(scfg, TUMVI_KB, R_IC, T_IC, nuis)
        resid = dirty.imu_acc - clean.imu_acc
        # AR(1) with rho=0.98: lag-1 autocorrelation ≈ rho, iid would be ~0.
        r = np.corrcoef(resid[:-1, 0], resid[1:, 0])[0, 1]
        assert r > 0.8

    def test_timestamp_offset_shifts_reported_times(self):
        nuis = adv.NuisanceConfig(cam_time_offset_s=0.004)
        data = self._data(nuis)
        true_ts = data.true_cam_ts
        assert np.allclose(data.cam_ts - true_ts, 0.004, atol=1e-9)
        assert np.all(np.diff(data.cam_ts) > 0)

    def test_movers_move(self):
        nuis = adv.NuisanceConfig(n_moving_objects=2)
        movers = adv.make_movers(nuis)
        assert len(movers) == 2
        d = np.linalg.norm(movers[0].positions(0.0)
                           - movers[0].positions(1.0), axis=-1)
        assert np.all(d > 0.01)
