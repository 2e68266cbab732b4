"""End-to-end test of the browser gateway path: WebSocket framing (web/ws.py)
+ binary protocol + engine hosting (web/vio_gateway.py) — the analog of the
reference's WASM worker smoke tests (wasm/test_wasm_integration.mjs:20-127:
module load, configure, multi-frame processFrame on synthetic images,
getMapPoints, reset/re-configure)."""

import json
import os
import socket
import struct
import sys
import threading

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "web"))

import vio_gateway  # noqa: E402
import ws  # noqa: E402

from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.config import CameraConfig


def _make_gateway():
    sock = socket.socket()
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    ready = threading.Event()
    t = threading.Thread(target=vio_gateway.serve,
                         args=(port, ready, sock), daemon=True)
    t.start()
    assert ready.wait(5)
    return port


@pytest.fixture(scope="module")
def gateway():
    return _make_gateway()


def _imu_msg(samples):
    """samples: (N, 7) float64 [ts, acc, gyr]."""
    arr = np.ascontiguousarray(samples, "<f8")
    return (struct.pack("<BBH", vio_gateway.MSG_IMU, 0, len(arr))
            + arr.tobytes())


def _frame_msg(img, ts):
    h, w = img.shape
    return (struct.pack("<BBHHHd", vio_gateway.MSG_FRAME, 0, w, h, 0, ts)
            + np.ascontiguousarray(img, np.uint8).tobytes())


def _recv_json(conn, want_type=None, timeout_msgs=50):
    for _ in range(timeout_msgs):
        is_text, payload = conn.recv()
        if payload is None:
            raise AssertionError("gateway closed connection")
        assert is_text
        msg = json.loads(payload)
        if msg.get("type") == "error":
            raise AssertionError(f"gateway error: {msg['message']}")
        if want_type is None or msg.get("type") == want_type:
            return msg
    raise AssertionError(f"no {want_type} message")


def _make_world():
    r_ic = np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    cam_cfg = CameraConfig(model_type="PINHOLE", width=192, height=192,
                           focal_length=150.0, fx=150.0, fy=150.0,
                           cx=96.0, cy=96.0,
                           r_ic=tuple(r_ic.reshape(-1)), t_ic=(0, 0, 0))
    cam = make_camera(cam_cfg, dtype=jnp.float64)
    scfg = sim.SimConfig(duration=9.0, cam_rate=10.0, imu_rate=100.0,
                         num_landmarks=500, max_features=60, seed=3)
    data = sim.simulate(scfg, cam, r_ic, np.zeros(3))
    frames = [sim.render_frame(data, fi, cam, r_ic, np.zeros(3))
              for fi in range(len(data.frames))]
    return data, frames


# Small world shared across tests (module scope keeps compile cost single).
@pytest.fixture(scope="module")
def world():
    return _make_world()


CONFIG_MSG = {
    "type": "configure", "profile": "mobile_default",
    "config": {
        "camera": {"model_type": "PINHOLE", "width": 192, "height": 192,
                   "focal_length": 150.0, "fx": 150.0, "fy": 150.0,
                   "cx": 96.0, "cy": 96.0,
                   "r_ic": [0.0, 0, 1, -1, 0, 0, 0, -1, 0],
                   "t_ic": [0.0, 0, 0]},
        "tracker": {"max_cnt": 60, "min_dist": 14, "max_points": 96,
                    "lk_window_size": 15, "lk_pyramid_levels": 2},
        "estimator": {"max_features": 128, "max_imu_per_interval": 16,
                      "num_iterations": 4},
    },
}


def _full_session_check(gateway, world):
    """The full engine-hosting session. Executed in a SUBPROCESS by the
    pytest wrapper below: this is the suite's biggest single XLA:CPU
    compile, and after a full suite's worth of in-process compilations the
    CPU compiler segfaults on it (same failure mode isolated in
    tests/test_sqrt_marginalization.py; see that file's note)."""
    data, frames = world
    conn = ws.connect("127.0.0.1", gateway)
    try:
        conn.send(json.dumps(CONFIG_MSG))
        msg = _recv_json(conn, "configured")
        assert msg["ok"] and msg["width"] == 192

        imu = np.column_stack([data.imu_ts, data.imu_acc, data.imu_gyr])
        imu_i = 0
        statuses, poses, got_map = [], [], False
        for fi, ts in enumerate(data.cam_ts):
            j = np.searchsorted(data.imu_ts, ts + 1e-9)
            if j > imu_i:
                conn.send(_imu_msg(imu[imu_i:j]))
                imu_i = j
            conn.send(_frame_msg(frames[fi], ts))
            res = _recv_json(conn, "result")
            statuses.append(res["status"])
            if res["ok"]:
                assert res["pose"] is not None and len(res["pose"]) == 16
                poses.append(res["pose"])
                assert res["proc_ms"] > 0
            # Map points ride alongside every MAP_POINTS_EVERY-th frame
            # (gateway counts frames, ok or not) when tracking.
            if res["ok"] and (fi + 1) % vio_gateway.MAP_POINTS_EVERY == 0:
                m = _recv_json(conn, "map_points")
                got_map = got_map or len(m["points"]) > 0

        assert "TRACKING" in statuses, f"never tracked: {set(statuses)}"
        assert len(poses) > 20
        assert got_map, "no map points streamed"
        # Poses are sane SE(3).
        P = np.asarray(poses[-1]).reshape(4, 4)
        np.testing.assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3),
                                   atol=1e-4)

        # Reset -> engine reinitializes.
        conn.send(json.dumps({"type": "reset"}))
        _recv_json(conn, "reset_done")
        conn.send(json.dumps({"type": "get_map_points"}))
        m = _recv_json(conn, "map_points")
        assert m["points"] == []

        conn.send(json.dumps({"type": "dispose"}))
        _recv_json(conn, "disposed")
    finally:
        conn.close()
    print("SESSION_OK", flush=True)


class TestGateway:
    def test_full_session_subprocess(self):
        import subprocess
        env = dict(os.environ, PYTHONPATH=REPO)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=1800,
        )
        assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
        assert "SESSION_OK" in out.stdout

    def test_error_before_configure(self, gateway):
        conn = ws.connect("127.0.0.1", gateway)
        try:
            conn.send(_frame_msg(np.zeros((8, 8), np.uint8), 0.0))
            is_text, payload = conn.recv()
            msg = json.loads(payload)
            assert msg["type"] == "error"
        finally:
            conn.close()

    def test_unknown_profile_reports_error(self, gateway):
        conn = ws.connect("127.0.0.1", gateway)
        try:
            conn.send(json.dumps({"type": "configure", "profile": "nope"}))
            is_text, payload = conn.recv()
            msg = json.loads(payload)
            assert msg["type"] == "error"
        finally:
            conn.close()


class TestWSFraming:
    """Direct checks of the RFC 6455 layer (mask round-trip, large frames,
    fragmentation, ping)."""

    @pytest.fixture()
    def pair(self):
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        out = {}

        def accept():
            c, _ = srv.accept()
            out["server"] = ws.accept_handshake(c)

        t = threading.Thread(target=accept, daemon=True)
        t.start()
        client = ws.connect("127.0.0.1", port)
        t.join(5)
        yield client, out["server"]
        client.sock.close()
        out["server"].sock.close()
        srv.close()

    def test_roundtrip_text_and_binary(self, pair):
        client, server = pair
        client.send("hello")
        is_text, payload = server.recv()
        assert is_text and payload == b"hello"
        server.send(b"\x00\x01\x02")
        is_text, payload = client.recv()
        assert not is_text and payload == b"\x00\x01\x02"

    def test_large_binary_frame(self, pair):
        client, server = pair
        blob = os.urandom(300_000)  # forces the 64-bit length path
        client.send(blob)
        _, payload = server.recv()
        assert payload == blob

    def test_ping_is_answered_transparently(self, pair):
        client, server = pair
        server._send_frame(ws.OP_PING, b"x")
        client.send("after-ping")          # client answers pong on recv path
        is_text, payload = server.recv()
        assert payload == b"after-ping"

    def test_fragmented_message(self, pair):
        client, server = pair
        # Hand-build a 2-fragment text message from the client side.
        client._send_frame_orig = client._send_frame
        import struct as st
        mask = b"\x01\x02\x03\x04"

        def frag(fin, opcode, data):
            b0 = (0x80 if fin else 0) | opcode
            hdr = bytes([b0, 0x80 | len(data)]) + mask
            body = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
            client.sock.sendall(hdr + body)

        frag(False, ws.OP_TEXT, b"frag")
        frag(True, ws.OP_CONT, b"mented")
        is_text, payload = server.recv()
        assert is_text and payload == b"fragmented"


if __name__ == "__main__":
    # Subprocess entry (see _full_session_check): conftest.py does not
    # apply here, so force the CPU backend and f64 before any computation.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    _full_session_check(_make_gateway(), _make_world())
