"""Viewer server — the analog of the reference's web/server.js.

Serves the self-contained viewer (web/viewer.html) plus a trajectory.json
built from a logs/<ts>/ run directory (re-read on every request, so a
running VIOSystem can be followed live), and accepts POST /log for remote
debug logging like the reference's mobile log sink (web/server.js:75).

    python web/server.py --run logs/<ts> [--port 8080] [--map points.npy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RUN_DIR = None
MAP_FILE = None


def build_payload():
    from mobile_slam_tpu.io.trajectory import read_tum

    traj = []
    map_pts = []
    path = os.path.join(RUN_DIR, "trajectory_pose.txt")
    if os.path.exists(path):
        _, p, _ = read_tum(path)
        traj = p.tolist()
    if MAP_FILE and os.path.exists(MAP_FILE):
        import numpy as np

        map_pts = np.load(MAP_FILE).tolist()
    return {"trajectory": traj, "map_points": map_pts}


class Handler(BaseHTTPRequestHandler):
    def _send(self, code, body, ctype="text/html"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/", "/index.html", "/viewer.html"):
            with open(os.path.join(os.path.dirname(__file__),
                                   "viewer.html"), "rb") as f:
                self._send(200, f.read())
        elif self.path.startswith("/trajectory.json"):
            body = json.dumps(build_payload()).encode()
            self._send(200, body, "application/json")
        else:
            self._send(404, b"not found")

    def do_POST(self):
        if self.path == "/log":
            n = int(self.headers.get("Content-Length", 0))
            msg = self.rfile.read(n).decode(errors="replace")
            print(f"[remote-log] {msg}", file=sys.stderr)
            self._send(200, b"ok", "text/plain")
        else:
            self._send(404, b"not found")

    def log_message(self, *a):
        pass


def main():
    global RUN_DIR, MAP_FILE
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="logs/<ts> directory")
    ap.add_argument("--map", default=None, help="optional .npy map points")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    RUN_DIR = args.run
    MAP_FILE = args.map
    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"viewer at http://localhost:{args.port}/  (run dir: {RUN_DIR})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
