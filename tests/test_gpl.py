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
