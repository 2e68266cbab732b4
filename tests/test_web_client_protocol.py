"""Consistency checks between the browser client JS and the Python gateway.

No JS engine ships on this machine (the reference ran its WASM smoke tests
under node, wasm/test_wasm_module.mjs), so the executable coverage of the
client JS is the browser itself (two-terminal recipe in README "Live 3D
view"). What CAN regress silently is the wire contract:
these tests parse the JS sources and pin their binary-layout offsets and
worker-policy constants to the gateway's, so either side drifting breaks
the suite instead of the app.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "web"))

import vio_gateway  # noqa: E402


def _read(name):
    with open(os.path.join(REPO, "web", "js", name)) as f:
        return f.read()


class TestBinaryProtocolLayout:
    """vio-client.js must serialize exactly what vio_gateway.py parses."""

    def test_imu_message_layout(self):
        js = _read("vio-client.js")
        # Type byte 0x02 at offset 0 (gateway: payload[0] == MSG_IMU).
        assert re.search(r"setUint8\(0,\s*0x02\)", js)
        assert vio_gateway.MSG_IMU == 0x02
        # Count u16 LE at offset 2 (gateway: unpack_from("<H", payload, 2)).
        assert re.search(r"setUint16\(2,\s*samples\.length,\s*true\)", js)
        # Payload f64 from byte 4 (gateway: frombuffer(..., offset=4)).
        assert re.search(r"new Float64Array\(buf,\s*4\)", js)
        # Header size 4 + 7 doubles per sample.
        assert re.search(r"4 \+ samples\.length \* 7 \* 8", js)

    def test_frame_message_layout(self):
        js = _read("vio-client.js")
        assert re.search(r"setUint8\(0,\s*0x03\)", js)
        assert vio_gateway.MSG_FRAME == 0x03
        # w@2, h@4 u16 LE; ts f64@8; pixels from 16 — matches gateway's
        # unpack_from("<HH", payload, 2) / ("<d", payload, 8) / offset=16.
        assert re.search(r"setUint16\(2,\s*w,\s*true\)", js)
        assert re.search(r"setUint16\(4,\s*h,\s*true\)", js)
        assert re.search(r"setFloat64\(8,\s*ts,\s*true\)", js)
        assert re.search(r"new Uint8Array\(buf,\s*16\)", js)
        assert re.search(r"16 \+ gray\.length", js)


class TestWorkerPolicyConstants:
    """The worker applies the same stale/gap policy as the gateway (both
    sides enforce it; values must agree or behavior becomes path-dependent).
    Reference values: vio-worker.js:108-121 (0.5 s), :245-251 (1.5 s)."""

    def test_stale_and_gap_thresholds_match_gateway(self):
        js = _read("vio-worker.js")
        m = re.search(r"STALE_IMU_S\s*=\s*([\d.]+)", js)
        assert m and float(m.group(1)) == vio_gateway.STALE_IMU_S
        m = re.search(r"FRAME_GAP_S\s*=\s*([\d.]+)", js)
        assert m and float(m.group(1)) == vio_gateway.FRAME_GAP_S

    def test_ring_capacity_matches_reference(self):
        js = _read("vio-worker.js")
        m = re.search(r"RING_CAP\s*=\s*(\d+)", js)
        assert m and int(m.group(1)) == 1024  # vio-worker.js:72

    def test_worker_messages_are_handled(self):
        """Every message type the wrapper posts has a worker case."""
        wrapper = _read("vio-wrapper.js")
        worker = _read("vio-worker.js")
        posted = set(re.findall(
            r"postMessage\(\s*\{\s*type:\s*'(\w+)'", wrapper))
        handled = set(re.findall(r"case '(\w+)':", worker))
        assert posted <= handled, posted - handled

    def test_wrapper_handles_worker_replies(self):
        wrapper = _read("vio-wrapper.js")
        worker = _read("vio-worker.js")
        replies = set(re.findall(r"post\(\s*\{\s*type:\s*'(\w+)'", worker))
        # waitFor-style replies are resolved via _waiters by type; the
        # switch handles the streaming ones. Union of both mechanisms:
        cases = set(re.findall(r"case '(\w+)':", wrapper))
        waited = set(re.findall(r"_waitFor\('(\w+)'", wrapper))
        unhandled = replies - cases - waited - {"disposed"}
        assert not unhandled, unhandled

    def test_app_loads_wrapper(self):
        app = _read("app.js")
        assert "VIOWrapper" in app
        with open(os.path.join(REPO, "web", "index.html")) as f:
            html = f.read()
        assert "js/vio-wrapper.js" in html


class TestCameraCapturePaths:
    """camera.js parity surfaces (reference web/js/camera.js:54-55,210-256,
    345-529). No JS engine ships here (see module docstring) — these are
    source-contract checks: the WebGL grayscale path, its CPU fallback, and
    the portrait pixel-rotation mode must exist and stay wired the way the
    reference's are.
    """

    def test_webgl_path_is_query_gated(self):
        js = _read("camera.js")
        # Opt-in exactly like the reference: ?grayscale=webgl.
        assert re.search(r"get\('grayscale'\)\s*===\s*'webgl'", js)

    def test_webgl_luma_shader_matches_cpu_weights(self):
        js = _read("camera.js")
        # Shader weights are the CPU integer weights (77,150,29)/256 so the
        # two paths agree to rounding.
        assert "0.30078125" in js and "0.5859375" in js and "0.11328125" in js
        assert 77 / 256 == 0.30078125
        assert 150 / 256 == 0.5859375
        assert 29 / 256 == 0.11328125
        # CPU path still present as the fallback.
        assert re.search(r"77 \* rgba\[j\]", js)

    def test_webgl_falls_back_on_context_loss(self):
        js = _read("camera.js")
        assert "webglcontextlost" in js
        assert "_glContextLost" in js
        # captureGray must consult the loss flag before using GL.
        assert re.search(r"_useWebGL && this\._gl && !this\._glContextLost",
                         js)

    def test_portrait_rotation_is_pixel_level(self):
        js = _read("camera.js")
        # Portrait mode rotates the PIXELS (canvas transform), not CSS —
        # reference rotate cw mode (camera.js:210-256).
        assert re.search(r"rotate\(Math\.PI / 2\)", js)
        assert "rotateMode" in js
        # Output dims swap when rotated.
        assert re.search(r"rotated:\s*this\.rotateMode !== 'none'", js)

    def test_replay_manifest_uses_real_tumvi_profile(self):
        """The in-browser replay harness configures the gateway with the
        real TUM-VI calibration profile (reference test-tumvi-app.js:16-55
        replays real calibration constants)."""
        import importlib
        spec = importlib.util.spec_from_file_location(
            "export_replay_dataset",
            os.path.join(REPO, "scripts", "export_replay_dataset.py"))
        src = open(spec.origin).read()
        assert '"profile": "tum_vi"' in src
        prof = vio_gateway._profiles()["tum_vi"]
        assert prof["camera"]["fx"] == 190.97847715128717
        assert prof["camera"]["model_type"] == "KANNALA_BRANDT"
