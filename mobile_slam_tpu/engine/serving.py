"""Chunked image serving with rebuild-and-continue recovery.

The reference engine reacts to estimator failure by rebuilding the
estimator and re-initializing while the tracker keeps running
(src/vio_engine.cpp:248-279 failure path, estimator rebuild at
vio_engine.cpp:188-207). The TPU-native serving mode runs whole chunks of
frames inside one ``lax.scan`` device program (engine/chunked.py) where no
host gate can intervene — so without an orchestrator, one mid-chunk
divergence silently poisons every later frame (observed: nuisance level 1
lost 190/241 frames to a single scale runaway at frame ~48,
artifacts/bench_adversarial_r3.json).

``ChunkedImageServer`` closes that gap the TPU-idiomatic way: the device
program stays a pure fixed-shape scan, and the host inspects each chunk's
per-frame ``ok`` flags when the chunk lands. A failed TAIL (the last
``recover_tail``+ frames all gated) means the carried state is bad *right
now*: the server rebuilds the estimator, replays subsequent frames through
the streaming engine until visual-inertial initialization succeeds again
(the feature tracker state survives, exactly like the reference), then
resumes chunked serving. Mid-chunk glitches that self-recover (the gate is
per-frame, not latched) cost only their own frames and trigger nothing.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine import chunked
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine


class ServeResult(NamedTuple):
    """Per-frame serving output (body frame, for evaluation/logging)."""

    ts: float
    ok: bool
    p: np.ndarray        # (3,) body position (world)
    q: np.ndarray        # (4,) body quaternion wxyz
    is_keyframe: bool
    chunked: bool        # True if produced by the scan path


class ChunkedImageServer:
    """High-throughput image-path serving with failure recovery.

    Modes:
      * STREAM  — per-frame ``VIOEngine.process_frame`` (initialization and
                  re-initialization; the engine's own failure machinery —
                  LOST / COOLDOWN / rebuild — runs here).
      * CHUNKED — ``chunk_size``-frame ``lax.scan`` programs with zero host
                  round trips inside a chunk; entered after ``stable_frames``
                  consecutive TRACKING results.

    Recovery contract: when the trailing ``recover_tail`` frames of a chunk
    are all gated not-ok, the estimator is rebuilt (tracker state carried
    over) and the server drops back to STREAM until re-initialized.
    """

    def __init__(self, cfg, dtype=jnp.float32, chunk_size: int = 50,
                 recover_tail: int = 6, stable_frames: int = 3):
        self.cfg = cfg
        self.dtype = dtype
        self.chunk_size = int(chunk_size)
        self.recover_tail = int(recover_tail)
        self.stable_frames = int(stable_frames)
        self.engine = VIOEngine(cfg, dtype)
        self._step = chunked.make_chunked_image_step(
            self.engine.params, cfg.estimator.num_iterations, cfg.tracker,
            self.engine.camera, cfg.camera.focal_length,
        )
        self._mode = "stream"
        self._carry = None
        self._buf: list[chunked.ImageFrameInput] = []
        self._buf_ts: list[float] = []
        self._stable = 0
        self._replaying = False
        # counters for observability / tests
        self.n_chunks = 0
        self.n_recoveries = 0
        self.chunk_wall_s = 0.0   # cumulative wall time inside chunked calls
        self.frames_chunked = 0

    # -- IMU ------------------------------------------------------------

    def push_imu(self, ts: float, acc, gyr) -> None:
        self.engine.push_imu(ts, acc, gyr)

    # -- frames ----------------------------------------------------------

    def process_frame(self, image: np.ndarray, ts: float,
                      ) -> list[ServeResult]:
        """Feed one grayscale frame; returns 0..chunk_size results (chunked
        results arrive in bursts when a chunk completes)."""
        if self._mode == "stream":
            return self._process_stream(image, ts)
        return self._process_chunked(image, ts)

    def _process_stream(self, image, ts,
                        imu_override=None) -> list[ServeResult]:
        res = self.engine.process_frame(np.asarray(image), ts,
                                        imu_override=imu_override)
        out = []
        if res.ok:
            p, q, _ = self.engine.get_body_state()
            out.append(ServeResult(ts, True, p, q, bool(res.is_keyframe),
                                   chunked=False))
        if res.status == Status.TRACKING:
            self._stable += 1
            # While replaying a failed chunk tail the engine must keep
            # streaming (the replay loop feeds it host-retained frames);
            # the mode switch happens once, after the replay drains.
            if self._stable >= self.stable_frames and not self._replaying:
                self._enter_chunked()
        else:
            self._stable = 0
        return out

    def _enter_chunked(self) -> None:
        eng = self.engine
        d0 = float(eng._depth_ema or 0.0)
        self._carry = chunked.ImageChunkCarry(
            est_state=eng.state, tracker_state=eng.tracker_state,
            banned_ids=eng._banned_ids, key=eng._key,
            depth_ema=jnp.asarray(d0, jnp.float32),
            vel_ema=jnp.asarray(eng._vel_ema, jnp.float32),
            # Seed the growth-detector rings with the streaming-phase
            # baselines so a compounding runaway right after (re)init is
            # caught within GROWTH_WINDOW frames of chunk entry — that is
            # exactly where a bad visual-inertial init lives.
            lag_depth=jnp.full((chunked.GROWTH_WINDOW,), d0, jnp.float32),
            lag_vel=jnp.full((chunked.GROWTH_WINDOW,),
                             float(eng._vel_ema), jnp.float32),
            lag_i=jnp.asarray(0, jnp.int32),
        )
        self._buf, self._buf_ts = [], []
        self._mode = "chunked"

    def _frame_input(self, image, ts) -> chunked.ImageFrameInput:
        eng = self.engine
        dts, accs, gyrs = eng._drain_imu(ts)
        eng._last_frame_ts = ts
        m_pad = self.cfg.estimator.max_imu_per_interval
        m = min(len(dts), m_pad)
        dt_p = np.zeros(m_pad)
        acc_p = np.zeros((m_pad, 3))
        gyr_p = np.zeros((m_pad, 3))
        dt_p[:m] = dts[:m]
        acc_p[:m] = accs[:m]
        gyr_p[:m] = gyrs[:m]
        return chunked.ImageFrameInput(
            img=jnp.asarray(image, self.dtype),
            ts=jnp.asarray(ts - eng._t0, self.dtype),
            imu_dt=jnp.asarray(dt_p, self.dtype),
            imu_acc=jnp.asarray(acc_p, self.dtype),
            imu_gyr=jnp.asarray(gyr_p, self.dtype),
            imu_cnt=jnp.asarray(m, jnp.int32),
        )

    def _process_chunked(self, image, ts) -> list[ServeResult]:
        self._buf.append(self._frame_input(image, ts))
        self._buf_ts.append(ts)
        if len(self._buf) < self.chunk_size:
            return []
        return self._run_chunk()

    def _run_chunk(self, n_real: Optional[int] = None) -> list[ServeResult]:
        n_real = n_real if n_real is not None else len(self._buf)
        batch = jax.device_put(chunked.stack_image_inputs(self._buf))
        t0 = time.perf_counter()
        self._carry, (p, q, ok, kf) = self._step(self._carry, batch)
        p_np = np.asarray(p, np.float64)
        q_np = np.asarray(q, np.float64)
        ok_np = np.asarray(ok)
        kf_np = np.asarray(kf)
        self.chunk_wall_s += time.perf_counter() - t0
        self.n_chunks += 1
        self.frames_chunked += n_real
        results = [
            ServeResult(self._buf_ts[k], bool(ok_np[k]), p_np[k], q_np[k],
                        bool(kf_np[k]), chunked=True)
            for k in range(n_real)
        ]
        inputs, in_ts = self._buf, self._buf_ts
        self._buf, self._buf_ts = [], []

        # Failed tail => the carried state is bad NOW: rebuild + re-init,
        # then REPLAY the failed frames through the streaming engine (their
        # images and drained IMU slices are still on the host) so the
        # re-initialization consumes the tail instead of discarding it —
        # without this, up to chunk_size frames die between the in-scan
        # gate tripping and the host seeing the chunk.
        tail = 0
        for k in range(n_real - 1, -1, -1):
            if ok_np[k]:
                break
            tail += 1
        if tail >= self.recover_tail:
            self._recover()
            k0 = n_real - tail
            self._replaying = True
            # The replay re-feeds the failed tail through the POST-chunk
            # tracker state, which already saw those frames: the first
            # replayed frame arrives with a backwards timestamp jump, so
            # its LK tracks run from the newest pyramid onto an older
            # image (velocities are zeroed by the tracker's dt guard). The
            # first replayed frame effectively re-seeds the tracks — an
            # accepted degradation, since a pre-tail tracker snapshot is
            # not recoverable from a single lax.scan output.
            try:
                for k in range(k0, n_real):
                    inp = inputs[k]
                    cnt = int(inp.imu_cnt)
                    override = (np.asarray(inp.imu_dt[:cnt]),
                                np.asarray(inp.imu_acc[:cnt]),
                                np.asarray(inp.imu_gyr[:cnt]))
                    replay = self._process_stream(
                        np.asarray(inp.img), in_ts[k], imu_override=override)
                    results[k] = (replay[0] if replay else
                                  results[k]._replace(ok=False,
                                                      chunked=False))
            finally:
                self._replaying = False
            if self._stable >= self.stable_frames:
                self._enter_chunked()
        return results

    def _recover(self) -> None:
        """Rebuild-and-continue (vio_engine.cpp:248-279): the feature
        tracker survives in the chunk carry; the estimator restarts."""
        eng = self.engine
        eng.tracker_state = self._carry.tracker_state
        eng._banned_ids = self._carry.banned_ids
        eng._key = self._carry.key
        # eng.state still points at the PRE-chunk state whose buffers were
        # donated to the first chunk step — refresh it from the live carry
        # (the last step's output, valid until donated again) so the
        # rebuild can read the learned td off a real buffer.
        eng.state = self._carry.est_state
        eng._rebuild_estimator()
        eng._consecutive_failures = 0
        eng._cooldown_remaining = 0
        self._carry = None
        self._stable = 0
        self._mode = "stream"
        self.n_recoveries += 1

    def flush(self) -> list[ServeResult]:
        """Process any partially-buffered chunk (end of sequence). The scan
        shape is compiled for chunk_size, so the partial chunk is padded by
        repeating its last frame; padded outputs are dropped."""
        if self._mode != "chunked" or not self._buf:
            return []
        n_real = len(self._buf)
        while len(self._buf) < self.chunk_size:
            self._buf.append(self._buf[-1])
            self._buf_ts.append(self._buf_ts[-1])
        return self._run_chunk(n_real=n_real)

    @property
    def mode(self) -> str:
        return self._mode

    def chunked_fps(self) -> float:
        """Throughput of the chunked segments alone (device-bound rate)."""
        if self.chunk_wall_s <= 0:
            return 0.0
        return self.frames_chunked / self.chunk_wall_s
