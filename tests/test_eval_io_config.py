"""Tier 2-4 tests (SURVEY §4): trajectory evaluator metric correctness with
synthetic trajectories written to tmp files (mirrors
tests/test_trajectory_evaluator.cpp), config validation positivity checks
(tests/test_config_validation.cpp), and measurement-ingestion robustness
(malformed CSV lines, path traversal — tests/test_measurement_robustness.cpp).
"""

import os

import numpy as np
import pytest

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig, load_config,
                                    validate_config)
from mobile_slam_tpu.engine import checkpoint, estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.eval.evaluator import compute_ate, compute_rpe, \
    umeyama_alignment
from mobile_slam_tpu.io import dataset as ds
from mobile_slam_tpu.io.trajectory import ResultLogger, read_tum, write_tum


def synth_traj(n=200, dt=0.05):
    ts = np.arange(n) * dt
    p = np.stack([np.sin(0.5 * ts), 0.7 * np.cos(0.3 * ts), 0.1 * ts], -1)
    yaw = 0.2 * ts
    R = np.stack([
        np.stack([np.cos(yaw), -np.sin(yaw), 0 * yaw], -1),
        np.stack([np.sin(yaw), np.cos(yaw), 0 * yaw], -1),
        np.stack([0 * yaw, 0 * yaw, 1 + 0 * yaw], -1),
    ], axis=-2)
    return ts, p, R


class TestEvaluator:
    def test_identical_trajectories_zero_ate(self):
        """test_trajectory_evaluator.cpp:46-69 parity."""
        ts, p, _ = synth_traj()
        ate = compute_ate(ts, p, ts, p)
        assert ate.rmse < 1e-12
        assert ate.num_pairs == len(ts)

    def test_rigid_offset_removed_by_alignment(self):
        ts, p, _ = synth_traj()
        shifted = p + [1.5, -2.0, 0.7]
        ate = compute_ate(ts, shifted, ts, p, with_scale=False)
        assert ate.rmse < 1e-9

    def test_scale_removed_only_with_sim3(self):
        ts, p, _ = synth_traj()
        scaled = 1.7 * p
        ate_sim3 = compute_ate(ts, scaled, ts, p, with_scale=True)
        ate_se3 = compute_ate(ts, scaled, ts, p, with_scale=False)
        assert ate_sim3.rmse < 1e-9
        assert ate_se3.rmse > 0.05

    def test_umeyama_recovers_transform(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(50, 3))
        ang = 0.7
        R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                           [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        dst = 2.0 * src @ R_true.T + [1, 2, 3]
        s, R, t = umeyama_alignment(src, dst)
        np.testing.assert_allclose(s, 2.0, atol=1e-9)
        np.testing.assert_allclose(R, R_true, atol=1e-9)
        np.testing.assert_allclose(t, [1, 2, 3], atol=1e-9)

    def test_rpe_known_error(self):
        ts, p, R = synth_traj()
        drifted = p.copy()
        drifted[:, 0] += 0.01 * np.arange(len(ts))  # 0.2 m/s drift in x
        rpe = compute_rpe(ts, drifted, R, ts, p, R, delta=1.0)
        assert rpe.num_pairs > 100
        assert 0.15 < rpe.trans_rmse < 0.25  # 0.2 m per 1 s delta
        assert rpe.rot_rmse_deg < 1e-6

    def test_association_window(self):
        # Half-a-frame shift (0.025s) exceeds the 10ms window -> no matches.
        ts, p, _ = synth_traj()
        ate = compute_ate(ts + 0.025, p, ts, p, max_diff=0.01)
        assert ate.num_pairs == 0 or not np.isfinite(ate.rmse)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        ts, p, _ = synth_traj(20)
        q = np.tile([0.9, 0.1, -0.2, np.sqrt(1 - 0.9**2 - 0.05)], (20, 1))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        path = str(tmp_path / "traj.txt")
        write_tum(path, ts, p, q)
        ts2, p2, q2 = read_tum(path)
        np.testing.assert_allclose(ts2, ts, atol=1e-9)
        np.testing.assert_allclose(p2, p, atol=1e-6)
        np.testing.assert_allclose(q2, q, atol=1e-6)

    def test_result_logger(self, tmp_path):
        lg = ResultLogger(str(tmp_path / "logs"), config_blob="test: 1\n")
        for i in range(60):
            lg.add_pose(i * 0.05, [i * 0.1, 0, 0], [1, 0, 0, 0])
        lg.save_evaluation({"ate_rmse_m": 0.5})
        assert os.path.exists(lg.trajectory_path)
        assert os.path.exists(os.path.join(lg.dir, "config.yaml"))
        assert os.path.exists(os.path.join(lg.dir, "evaluation.txt"))
        ts, p, _ = read_tum(lg.trajectory_path)
        assert len(ts) == 60


class TestConfigValidation:
    def test_defaults_valid(self):
        assert validate_config(VIOConfig()) == []

    def test_positivity_checks(self):
        """test_config_validation.cpp parity: each bad field is caught."""
        bad = [
            VIOConfig(camera=CameraConfig(width=0)),
            VIOConfig(camera=CameraConfig(fx=-1)),
            VIOConfig(estimator=EstimatorConfig(num_iterations=0)),
            VIOConfig(estimator=EstimatorConfig(acc_n=0.0)),
            VIOConfig(estimator=EstimatorConfig(g_norm=-9.8)),
            VIOConfig(tracker=TrackerConfig(max_cnt=0)),
            VIOConfig(tracker=TrackerConfig(min_dist=0)),
            VIOConfig(tracker=TrackerConfig(max_points=10, max_cnt=50)),
        ]
        for cfg in bad:
            assert validate_config(cfg), f"expected problems for {cfg}"

    def test_yaml_loading_tum_vi(self):
        cfg = load_config("configs/tum_vi_room1.yaml")
        assert cfg.camera.model_type == "KANNALA_BRANDT"
        assert cfg.camera.width == 512
        np.testing.assert_allclose(cfg.camera.fx, 190.9784771512872)
        # Extrinsic rotation must be a valid rotation matrix.
        r = cfg.camera.r_ic_mat
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert cfg.estimator.acc_n == 0.04
        assert cfg.tracker.fisheye

    def test_yaml_loading_euroc_pinhole(self):
        cfg = load_config("configs/euroc.yaml")
        assert cfg.camera.model_type == "PINHOLE"
        assert cfg.camera.dist[0] == pytest.approx(-0.28340811)
        assert cfg.frame_skip == 2


class TestMeasurementRobustness:
    """test_measurement_robustness.cpp parity."""

    def test_malformed_imu_lines_skipped(self, tmp_path):
        path = str(tmp_path / "imu.csv")
        with open(path, "w") as f:
            f.write("#timestamp,w,w,w,a,a,a\n")
            f.write("1000000000,0.1,0.2,0.3,9.8,0.1,0.2\n")
            f.write("garbage line\n")
            f.write("2000000000,0.1,0.2\n")          # too few fields
            f.write("3000000000,a,b,c,d,e,f\n")      # non-numeric
            f.write("4000000000,0.1,0.2,0.3,nan,0.1,0.2\n")  # non-finite
            f.write("5000000000,0.0,0.0,0.0,0.0,0.0,9.8\n")
        imu = ds.load_imu_csv(path)
        assert len(imu.ts) == 2
        np.testing.assert_allclose(imu.ts, [1.0, 5.0])

    def test_filename_sanitization(self):
        assert ds.clean_filename("1403636579763555584.png") is not None
        assert ds.clean_filename("../../etc/passwd") is None
        assert ds.clean_filename("/etc/passwd") is None
        assert ds.clean_filename("a/../../b.png") is None
        assert ds.clean_filename("") is None
        assert ds.clean_filename("sub/dir.png") == "sub/dir.png"

    def test_image_csv_rejects_traversal(self, tmp_path):
        path = str(tmp_path / "data.csv")
        with open(path, "w") as f:
            f.write("#ts,filename\n")
            f.write("1000000000,good.png\n")
            f.write("2000000000,../../evil.png\n")
            f.write("3000000000,/abs/evil.png\n")
        idx = ds.load_image_csv(path)
        assert idx.filenames == ["good.png"]

    def test_imu_between_half_open(self, tmp_path):
        path = str(tmp_path / "imu.csv")
        with open(path, "w") as f:
            for i in range(10):
                f.write(f"{int((1+0.1*i)*1e9)},0,0,0,0,0,9.8\n")
        imu = ds.load_imu_csv(path)

        class FakeDs:
            pass

        d = FakeDs()
        d.imu = imu
        ts, acc, gyr = ds.EurocDataset.imu_between(d, 1.0, 1.35)
        # (1.0, 1.35]: samples at 1.1, 1.2, 1.3 (1.0 excluded).
        np.testing.assert_allclose(ts, [1.1, 1.2, 1.3])


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        cfg = tiny_config()
        params = est.make_params(cfg, jnp.float32)
        state, _ = make_example_state(cfg, params, jnp.float32)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_state(path, state)
        template = est.init_state(cfg, params, jnp.float32)
        restored = checkpoint.load_state(path, template)
        np.testing.assert_allclose(np.asarray(restored.window.p),
                                   np.asarray(state.window.p))
        np.testing.assert_allclose(np.asarray(restored.table.depth),
                                   np.asarray(state.table.depth))
        assert int(restored.frame_count) == int(state.frame_count)
