"""End-to-end engine test: cold start -> host initialization -> tracking on
the synthetic TUM-VI-like fisheye world, through the public VIOEngine push
API (the reference's tests/test_vio_engine_parity.cpp workload, with exact
ground truth instead of a second pipeline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.eval.evaluator import compute_ate
from mobile_slam_tpu.models.cameras.base import make_camera

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])


def tumvi_cfg():
    cam = CameraConfig(
        model_type="KANNALA_BRANDT", width=512, height=512,
        focal_length=190.97847715128717,
        fx=190.97847715128717, fy=190.9733070521226,
        cx=254.93170605935475, cy=256.8974428996504,
        dist=(0.0034823894022493434, 0.0007150348452162257,
              -0.0020532361418706202, 0.00020293673591811182),
        r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.045, 0.073, -0.044),
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=120, max_points=144, fisheye=True),
        estimator=EstimatorConfig(
            max_features=256, max_imu_per_interval=16, num_iterations=8,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
        ),
    )


def run_engine(duration, noise=True):
    cfg = tumvi_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    if noise:
        scfg = sim.SimConfig(
            duration=duration, num_landmarks=700, max_features=120,
            acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
            acc_bias=(0.01, -0.005, 0.015),
            gyr_bias=(0.001, -0.0005, 0.0008), seed=7,
        )
    else:
        scfg = sim.SimConfig(duration=duration, num_landmarks=700,
                             max_features=120, seed=7)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    engine = VIOEngine(cfg, jnp.float32)

    est_ts, est_p = [], []
    statuses = []
    imu_i = 0
    for fi, ts in enumerate(data.cam_ts):
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        statuses.append(res.status)
        if res.ok:
            p, q, v = engine.get_body_state()
            est_ts.append(ts)
            est_p.append(p)
            # Pose output is a valid SE(3) camera matrix.
            R = res.pose[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    return engine, data, np.asarray(est_ts), np.asarray(est_p), statuses


class TestEngineEndToEnd:
    def test_noiseless_cold_start_accuracy(self):
        engine, data, est_ts, est_p, statuses = run_engine(5.0, noise=False)
        assert Status.TRACKING in statuses
        assert len(est_p) > 60
        ate = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                          with_scale=False)
        assert ate.rmse < 0.05, f"noiseless ATE {ate.rmse:.3f} m"
        # Map points exist and are finite.
        mp = engine.get_map_points()
        assert len(mp) > 20
        assert np.all(np.isfinite(mp))

    def test_noisy_tracks_and_stays_sane(self):
        engine, data, est_ts, est_p, statuses = run_engine(6.0, noise=True)
        assert Status.TRACKING in statuses
        assert len(est_p) > 50
        ate = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                          with_scale=True)
        assert np.isfinite(ate.rmse)
        assert ate.rmse < 1.0, f"noisy Sim3 ATE {ate.rmse:.3f} m"


class TestScaleRunawayGate:
    """The monocular scale-runaway gate (VIOEngine._check_scale_runaway):
    JOINT depth + velocity inflation beyond FACTOR x slow EMA baselines is
    a failure. Observed failure mode: median solved depth 2.8 -> 252 m
    over 8 s with |v| 6x ground truth and every reference divergence gate
    silent. Depth-only inflation (a genuine viewpoint change, e.g. near
    wall -> across the room) must NOT trip — scale runaway multiplies
    depth and velocity together."""

    def _gate(self):
        eng = object.__new__(VIOEngine)  # logic-only; no jit machinery
        eng._depth_ema = None
        eng._vel_ema = 0.05
        return eng

    def test_trips_on_compounding_inflation(self):
        eng = self._gate()
        md, tripped = 2.8, False
        for _ in range(200):  # 10 s at 20 fps of 1.3x/s runaway
            vel = 0.5 * (md / 2.8)  # velocity scales with the runaway
            if eng._check_scale_runaway(md, vel):
                tripped = True
                break
            md *= 1.3 ** (1 / 20.0)
        assert tripped and md < 30.0, f"gate late or silent (md={md:.1f})"

    def test_tolerates_noise_and_slow_change(self):
        eng = self._gate()
        rs = np.random.RandomState(0)
        for i in range(1200):  # 60 s: noise + gradual 2x scene change
            md = 2.8 * (1 + i / 1200.0) * (1 + 0.15 * rs.randn())
            vel = 0.5 * (1 + 0.2 * rs.randn())
            assert not eng._check_scale_runaway(max(md, 0.5), abs(vel))

    def test_viewpoint_depth_jump_does_not_trip(self):
        """Turning from a 2 m wall to face across a 10 m room quadruples
        the median depth within a couple of seconds while velocity stays
        ordinary — this used to false-trip the depth-only gate (~1 reset
        per 1000 frames on 140 s runs, each costing ~1 m ATE)."""
        eng = self._gate()
        for i in range(100):  # settle baseline at 2 m
            assert not eng._check_scale_runaway(2.0, 0.5)
        for i in range(60):   # 3 s pan: depth 2 -> 10 m
            md = 2.0 + 8.0 * min(i / 40.0, 1.0)
            assert not eng._check_scale_runaway(md, 0.5)

    def test_ignores_empty_scene(self):
        eng = self._gate()
        assert not eng._check_scale_runaway(0.0)
        assert eng._depth_ema is None

    def test_device_gate_matches_host_gate(self):
        """chunked.scale_gate (the in-scan device-side mirror) must agree
        with the host gate step-for-step: same trip frame, same EMA."""
        from mobile_slam_tpu.engine import chunked

        eng = self._gate()
        ema = jnp.asarray(0.0, jnp.float32)
        vema = jnp.asarray(0.0, jnp.float32)
        rs = np.random.RandomState(1)
        meds = [0.0, 0.0]                                   # pre-init frames
        meds += [2.8 * (1 + 0.1 * rs.randn()) for _ in range(100)]  # quiet
        meds += [meds[-1] * 1.3 ** (k / 20.0) for k in range(1, 220)]  # runaway
        base = meds[2]
        host_trip = dev_trip = None
        for i, md in enumerate(meds):
            md = max(float(md), 0.0)
            vel = 0.5 * (md / base) if md > 0 else 0.0  # runaway couples |v|
            host = eng._check_scale_runaway(md, vel)
            ema, vema, dev = chunked.scale_gate(
                ema, vema, jnp.asarray(md, jnp.float32),
                jnp.asarray(vel, jnp.float32))
            if host and host_trip is None:
                host_trip = i
            if bool(dev) and dev_trip is None:
                dev_trip = i
        assert host_trip is not None
        assert dev_trip == host_trip
        assert abs(float(ema) - eng._depth_ema) < 1e-3 * eng._depth_ema
