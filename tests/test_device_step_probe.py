"""VIOEngine.measure_device_step: the device-bound streaming probe.

Bench reports this as stream_device_ms so streaming perf is reproducible
(wall-clock fps through a network tunnel swings ~2x with RTT on identical
code; the probe dispatches back-to-back with no host reads)."""

import numpy as np

import jax.numpy as jnp

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera

R_IC = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])


def _cfg():
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
        tracker=TrackerConfig(max_cnt=100, max_points=128, fisheye=True),
        estimator=EstimatorConfig(max_features=192, max_imu_per_interval=16,
                                  num_iterations=2),
    )


class TestMeasureDeviceStep:
    def test_none_before_tracking_then_positive(self):
        cfg = _cfg()
        cam = make_camera(cfg.camera, dtype=jnp.float64)
        scfg = sim.SimConfig(duration=2.5, num_landmarks=500,
                             max_features=100, seed=7)
        data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat,
                            cfg.camera.t_ic_vec)
        engine = VIOEngine(cfg, jnp.float32)
        assert engine.measure_device_step(2) is None  # not TRACKING yet

        imu_i = 0
        for fi, ts in enumerate(data.cam_ts):
            while (imu_i < len(data.imu_ts)
                   and data.imu_ts[imu_i] <= ts + 1e-9):
                engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                                data.imu_gyr[imu_i])
                imu_i += 1
            f = data.frames[fi]
            res = engine.process_features(ts, f["ids"], f["rays"],
                                          uv=f["uv"], vel=f["vel"])
            if res.status == Status.TRACKING and fi > 30:
                break
        assert engine.status == Status.TRACKING

        state_ref = engine.state
        ms = engine.measure_device_step(3)
        assert ms is not None and ms > 0.0
        # The probe must not mutate the engine (throwaway state chain).
        assert engine.state is state_ref
        assert engine.status == Status.TRACKING
