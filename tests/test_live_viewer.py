"""Live viewer loop verification (VERDICT round-1 item 8): web/server.py
must serve a growing /trajectory.json while a run directory is being
written — the reference's Pangolin live view (src/utility/visualizer.cpp)
replaced by run-dir polling — including the IMU time-series payload
(IMUGraphVisualizer analog) written by VIOSystem._write_live."""

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "web"))

import server as viewer_server  # noqa: E402  (web/server.py)


def _get(port, path, timeout=5.0):
    deadline = time.time() + timeout
    last = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=2) as r:
                return r.status, r.read()
        except Exception as e:  # server still starting
            last = e
            time.sleep(0.2)
    raise AssertionError(f"server never answered {path}: {last}")


@pytest.fixture
def server(tmp_path):
    # In-process server thread: the sandboxed test runner forbids
    # cross-process socket connects; the HTTP behavior under test is
    # identical (same Handler/payload code as `python web/server.py`).
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    srv = viewer_server.make_server(str(run_dir), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield run_dir, port
    srv.shutdown()
    t.join(timeout=10)


def _write_tum(path, n):
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(n):
            f.write(f"{i*0.05:.6f} {0.1*i:.4f} {0.05*i:.4f} 0.0 "
                    f"0 0 0 1\n")


class TestLiveFollow:
    def test_trajectory_grows_between_polls(self, server):
        run_dir, port = server
        _write_tum(run_dir / "trajectory_pose.txt", 10)
        _, body = _get(port, "/trajectory.json")
        d1 = json.loads(body)
        assert len(d1["trajectory"]) == 10

        # Simulate the running VIOSystem appending + reflushing.
        _write_tum(run_dir / "trajectory_pose.txt", 25)
        _, body = _get(port, "/trajectory.json")
        d2 = json.loads(body)
        assert len(d2["trajectory"]) == 25, "server did not re-read the run dir"

    def test_live_json_payload(self, server):
        run_dir, port = server
        _write_tum(run_dir / "trajectory_pose.txt", 5)
        live = {
            "status": "TRACKING", "frames": 100, "poses": 88,
            "map_points": [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
            "imu": {"ts": [0.0, 0.01], "acc": [[0, 0, 9.8], [0, 0, 9.8]],
                    "gyr": [[0, 0, 0], [0.1, 0, 0]]},
        }
        with open(run_dir / "live.json", "w") as f:
            json.dump(live, f)
        _, body = _get(port, "/trajectory.json")
        d = json.loads(body)
        assert d["status"] == "TRACKING"
        assert d["map_points"] == live["map_points"]
        assert d["imu"]["acc"][0][2] == 9.8
        assert d["poses"] == 88

    def test_viewer_page_served(self, server):
        _, port = server
        status, body = _get(port, "/")
        assert status == 200
        assert b"imu" in body  # IMU panel present
        assert b"trk" in body  # track-overlay panel present

    def test_track_overlay_payload_and_frame(self, server):
        """The per-frame track-overlay debug view (the reference's
        cv::imshow overlay, measurement_processor.cpp:233-246): tracks
        pass through trajectory.json and the latest frame.png is served
        from the run dir."""
        run_dir, port = server
        live = {"status": "TRACKING",
                "tracks": {"uv": [[10.5, 20.0], [100.0, 200.0]],
                           "cnt": [1, 25]}}
        with open(run_dir / "live.json", "w") as f:
            json.dump(live, f)
        _, body = _get(port, "/trajectory.json")
        d = json.loads(body)
        assert d["tracks"]["uv"] == [[10.5, 20.0], [100.0, 200.0]]
        assert d["tracks"]["cnt"] == [1, 25]

        import numpy as np
        import cv2
        cv2.imwrite(str(run_dir / "frame.png"),
                    np.full((32, 32), 128, np.uint8))
        status, png = _get(port, "/frame.png")
        assert status == 200 and png[:4] == b"\x89PNG"


class TestVIOSystemLiveArtifacts:
    def test_write_live_creates_json(self, tmp_path, monkeypatch):
        """VIOSystem._write_live produces a parseable live.json without a
        dataset run (engine state machinery exercised separately)."""
        from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                            TrackerConfig, VIOConfig)
        from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
        from mobile_slam_tpu.engine.vio_system import VIOSystem
        from mobile_slam_tpu.io.trajectory import ResultLogger

        cfg = VIOConfig(
            camera=CameraConfig(model_type="PINHOLE", width=64, height=64,
                                focal_length=50.0, fx=50.0, fy=50.0,
                                cx=32.0, cy=32.0),
            tracker=TrackerConfig(max_cnt=20, max_points=32),
            estimator=EstimatorConfig(max_features=64,
                                      max_imu_per_interval=8,
                                      num_iterations=2),
        )
        sys_obj = VIOSystem.__new__(VIOSystem)
        sys_obj.cfg = cfg
        sys_obj.engine = VIOEngine(cfg)
        sys_obj.logger = ResultLogger(str(tmp_path))
        sys_obj._imu_window = [(0.0, [0.0, 0.0, 9.8], [0.0, 0.0, 0.0])]
        sys_obj._write_live(Status.INITIALIZING, 3, 0)
        with open(os.path.join(sys_obj.logger.dir, "live.json")) as f:
            d = json.load(f)
        assert d["status"] == "INITIALIZING"
        assert d["imu"]["acc"][0][2] == 9.8


class TestTLS:
    """HTTPS parity with the reference dev server (web/server.js:17-60):
    mobile getUserMedia / Generic Sensor require a secure context, so the
    viewer must be servable over TLS with a generated self-signed cert."""

    def test_https_round_trip(self, tmp_path):
        import ssl

        run_dir = tmp_path / "run"
        run_dir.mkdir()
        _write_tum(run_dir / "trajectory_pose.txt", 5)
        cert, key = viewer_server.ensure_self_signed(str(tmp_path / "certs"))
        srv = viewer_server.make_server(str(run_dir), port=0, tls=True,
                                        certfile=cert, keyfile=key)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            deadline = time.time() + 5.0
            body = None
            while time.time() < deadline:
                try:
                    with urllib.request.urlopen(
                            f"https://127.0.0.1:{port}/trajectory.json",
                            timeout=2, context=ctx) as r:
                        assert r.status == 200
                        body = r.read()
                        break
                except Exception:
                    time.sleep(0.2)
            assert body is not None, "TLS server never answered"
            assert len(json.loads(body)["trajectory"]) == 5
        finally:
            srv.shutdown()
            t.join(timeout=10)
