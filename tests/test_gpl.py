"""gpl calibration-geometry utilities (reference gpl.cc behaviors)."""

import math

import numpy as np
import pytest

from mobile_slam_tpu.utils import gpl


def test_angle_helpers():
    # The wrap boundary maps to +/-pi (equivalent angles).
    assert abs(gpl.normalize_theta(3 * math.pi)) == pytest.approx(math.pi)
    assert abs(gpl.normalize_theta(-3 * math.pi)) == pytest.approx(math.pi)
    assert gpl.normalize_theta(2 * math.pi + 0.5) == pytest.approx(0.5)
    assert gpl.normalize_theta(0.3) == pytest.approx(0.3)
    assert gpl.d2r(180.0) == pytest.approx(math.pi)
    assert gpl.r2d(math.pi / 2) == pytest.approx(90.0)
    assert gpl.sinc(0.0) == 1.0
    assert gpl.sinc(1e-3) == pytest.approx(math.sin(1e-3) / 1e-3)
    assert gpl.hypot3(1, 2, 2) == pytest.approx(3.0)
    assert gpl.clamp(5, 0, 3) == 3


def test_bres_line_endpoints_and_connectivity():
    pts = gpl.bres_line(0, 0, 7, 3)
    assert tuple(pts[0]) == (0, 0) and tuple(pts[-1]) == (7, 3)
    # 8-connected: consecutive points differ by at most 1 in each axis.
    d = np.abs(np.diff(pts, axis=0))
    assert d.max() == 1
    # Steep + reversed directions work too.
    pts2 = gpl.bres_line(5, 9, 2, -4)
    assert tuple(pts2[0]) == (5, 9) and tuple(pts2[-1]) == (2, -4)


def test_bres_circle_radius():
    r = 11
    pts = gpl.bres_circle(3, -2, r)
    rad = np.hypot(pts[:, 0] - 3, pts[:, 1] + 2)
    assert np.all(np.abs(rad - r) < 0.8)
    # All octant extremes present.
    assert (3 + r, -2) in map(tuple, pts)
    assert (3, -2 + r) in map(tuple, pts)


def test_fit_circle_recovers_ground_truth():
    rng = np.random.default_rng(0)
    th = rng.uniform(0, 2 * math.pi, 60)
    cx, cy, r = -3.2, 1.7, 4.5
    pts = np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=-1)
    pts += rng.normal(0, 0.01, pts.shape)
    fx, fy, fr = gpl.fit_circle(pts)
    assert fx == pytest.approx(cx, abs=0.02)
    assert fy == pytest.approx(cy, abs=0.02)
    assert fr == pytest.approx(r, abs=0.02)


def test_intersect_circles_cases():
    # Two intersections, symmetric about the center line.
    pts = gpl.intersect_circles(0, 0, 2, 2, 0, 2)
    assert pts.shape == (2, 2)
    for p in pts:
        assert math.hypot(*p) == pytest.approx(2.0, abs=1e-9)
        assert math.hypot(p[0] - 2, p[1]) == pytest.approx(2.0, abs=1e-9)
    # Disjoint.
    assert gpl.intersect_circles(0, 0, 1, 5, 0, 1).shape == (0, 2)
    # Contained.
    assert gpl.intersect_circles(0, 0, 5, 1, 0, 1).shape == (0, 2)


def test_utm_central_meridian_exact():
    # On a zone's central meridian the easting is 500000 by construction,
    # and at the equator the northing is 0.
    n, e, zone = gpl.ll_to_utm(0.0, 3.0)
    assert zone == "31N"
    assert e == pytest.approx(500000.0, abs=1e-6)
    assert n == pytest.approx(0.0, abs=1e-6)
    # At 45N on the central meridian: northing = k0 * meridian arc length
    # (WGS84 M(45 deg) = 4984944.38 m).
    n45, e45, _ = gpl.ll_to_utm(45.0, 3.0)
    assert e45 == pytest.approx(500000.0, abs=1e-6)
    assert n45 == pytest.approx(0.9996 * 4984944.38, abs=5.0)


def test_utm_roundtrip_known_point():
    # Munich (the reference's TUM-VI home turf), zone 32U.
    lat, lon = 48.1351, 11.5820
    northing, easting, zone = gpl.ll_to_utm(lat, lon)
    assert zone == "32U"
    lat2, lon2 = gpl.utm_to_ll(northing, easting, zone)
    assert lat2 == pytest.approx(lat, abs=1e-6)
    assert lon2 == pytest.approx(lon, abs=1e-6)


def test_utm_roundtrip_southern_hemisphere():
    lat, lon = -33.8688, 151.2093  # Sydney
    n, e, zone = gpl.ll_to_utm(lat, lon)
    lat2, lon2 = gpl.utm_to_ll(n, e, zone)
    assert lat2 == pytest.approx(lat, abs=1e-6)
    assert lon2 == pytest.approx(lon, abs=1e-6)


class TestEigenUtilsAnalogs:
    """EigenUtils.h analogs vs scipy/cv2 oracles."""

    def test_skew_and_rodrigues_match_cv2(self):
        import cv2
        rng = np.random.default_rng(0)
        for _ in range(5):
            rvec = rng.normal(size=3)
            R, _ = cv2.Rodrigues(rvec)
            np.testing.assert_allclose(gpl.angle_axis_to_rotation(rvec), R,
                                       atol=1e-12)
            back = gpl.rotation_to_angle_axis(R)
            np.testing.assert_allclose(back, rvec, atol=1e-9)
            v = rng.normal(size=3)
            np.testing.assert_allclose(gpl.skew(rvec) @ v,
                                       np.cross(rvec, v), atol=1e-12)

    def test_angle_axis_quat_round_trip(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.default_rng(1)
        for _ in range(5):
            rvec = rng.normal(size=3)
            q = gpl.angle_axis_to_quat(rvec)           # wxyz
            q_s = Rotation.from_rotvec(rvec).as_quat()  # xyzw
            ref = np.concatenate([[q_s[3]], q_s[:3]])
            if ref[0] < 0:
                ref = -ref
            np.testing.assert_allclose(q, ref, atol=1e-12)
            np.testing.assert_allclose(gpl.quat_to_angle_axis(q), rvec,
                                       atol=1e-12)

    def test_sqrtm_psd(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(6, 6))
        A = A @ A.T + 1e-3 * np.eye(6)
        S = gpl.sqrtm_psd(A)
        np.testing.assert_allclose(S @ S, A, atol=1e-10)
        np.testing.assert_allclose(S, S.T, atol=1e-12)

    def test_rpy_round_trip(self):
        rng = np.random.default_rng(3)
        for _ in range(5):
            rpy = rng.uniform(-1.2, 1.2, 3)
            R = gpl.rpy_to_mat(*rpy)
            np.testing.assert_allclose(gpl.mat_to_rpy(R), rpy, atol=1e-12)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_sampson_error_zero_on_exact_correspondence(self):
        rng = np.random.default_rng(4)
        R = gpl.angle_axis_to_rotation(rng.normal(size=3) * 0.3)
        t = rng.normal(size=3)
        P = rng.normal(size=3) + np.array([0.0, 0.0, 5.0])
        p1 = P / P[2]
        P2 = R @ P + t
        p2 = P2 / P2[2]
        assert gpl.sampson_error_rt(R, t, p1, p2) < 1e-20
        # Perturbed correspondence has positive error.
        p2n = p2 + np.array([1e-3, -2e-3, 0.0])
        assert gpl.sampson_error_rt(R, t, p1, p2n) > 1e-10
        H = gpl.homogeneous_transform(R, t)
        assert gpl.sampson_error_h(H, p1, p2) < 1e-20

    def test_rigid_and_similarity_transform_recovery(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(30, 3))
        R = gpl.rpy_to_mat(0.2, -0.4, 1.1)
        t = np.array([0.5, -1.0, 2.0])
        H = gpl.estimate_3d_rigid_transform(pts, pts @ R.T + t)
        np.testing.assert_allclose(H, gpl.homogeneous_transform(R, t),
                                   atol=1e-10)
        s = 2.7
        Hs = gpl.estimate_3d_similarity_transform(pts, s * pts @ R.T + t)
        np.testing.assert_allclose(Hs[:3, :3], s * R, atol=1e-9)
        np.testing.assert_allclose(Hs[:3, 3], t, atol=1e-9)
        p = gpl.transform_point(H, pts[0])
        np.testing.assert_allclose(p, R @ pts[0] + t, atol=1e-12)

    def test_screw_decomposition_reconstructs_motion(self):
        rng = np.random.default_rng(6)
        rvec = rng.normal(size=3)
        tvec = rng.normal(size=3)
        theta, d, axis, m = gpl.angle_axis_translation_to_screw(rvec, tvec)
        assert abs(theta - np.linalg.norm(rvec)) < 1e-12
        np.testing.assert_allclose(axis, rvec / np.linalg.norm(rvec),
                                   atol=1e-12)
        assert abs(d - tvec @ axis) < 1e-12
        # Axis moment is perpendicular to the axis.
        assert abs(m @ axis) < 1e-9

    def test_pose_with_spherical_translation(self):
        q = gpl.angle_axis_to_quat(np.array([0.1, 0.2, -0.3]))
        H = gpl.pose_with_spherical_translation(q, [0.7, 1.1], scale=2.0)
        assert abs(np.linalg.norm(H[:3, 3]) - 2.0) < 1e-12
        np.testing.assert_allclose(H[:3, :3] @ H[:3, :3].T, np.eye(3),
                                   atol=1e-12)
