"""VIOEngine — headless push-style VIO API (TPU-native).

Equivalent of the reference ``VIOEngine`` (src/vio_engine.cpp,
include/vio_engine.h): push (grayscale frame + IMU batch + timestamp), get a
4x4 camera pose plus status/map-point introspection. The engine composes the
jitted device steps (frontend tracker + estimator) with the host-side state
machine:

* status codes NOT_CONFIGURED / INITIALIZING / TRACKING / LOST / COOLDOWN
  (include/vio_engine.h:16-22);
* IMU dt gating (1e-4..0.5s) and interpolation at the image timestamp
  (vio_engine.cpp:111-163);
* init timeout 15s -> estimator rebuild (vio_engine.cpp:188-207);
* divergence guards (|P|>1e6 / NaN -> rebuild, 5 consecutive failures ->
  30-frame cooldown, vio_engine.cpp:248-279) layered on the estimator-level
  resets (post-opt NaN, |V|>10, |P|>100; estimator.cpp:218-251);
* runtime tuning without recompiles (StaticParams are device arrays,
  replacing setMobileParams/setFThreshold/setTrackingParams,
  vio_engine.cpp:354-389).

Initialization runs on host (mobile_slam_tpu/init/) and is injected back
with one jitted call, after which every frame is a fixed-shape device
program.
"""

from __future__ import annotations

import enum
import functools
import math
import queue
import threading
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import NUM_SLOTS, VIOConfig, validate_config
from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.frontend import tracker as trk
from mobile_slam_tpu.init.alignment import HostFrame, NpPreintegration
from mobile_slam_tpu.init.initializer import try_initialize
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.models.state import eligible_mask
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS


class Status(enum.IntEnum):
    """include/vio_engine.h:16-22."""

    NOT_CONFIGURED = 0
    INITIALIZING = 1
    TRACKING = 2
    LOST = 3
    COOLDOWN = 4


class FrameResult(NamedTuple):
    ok: bool
    pose: Optional[np.ndarray]     # 4x4 world-from-camera, row-major
    status: Status
    num_features: int
    is_keyframe: bool
    # Timestamp the pose belongs to (set in pipelined streaming mode, where
    # a call returns the PREVIOUS frame's pose; None = current frame).
    ts: Optional[float] = None


INIT_TIMEOUT_S = 15.0          # vio_engine.h:111-117
MAX_CONSECUTIVE_FAILURES = 5
COOLDOWN_FRAMES = 30
MAX_IMU_DT = 0.5
MIN_IMU_DT = 1e-4


class _PendingFrame:
    """An in-flight pipelined frame: the packed device result plus a host
    copy the reader thread fills in off the caller's critical path."""

    __slots__ = ("packed", "ts", "host", "done", "queued")

    def __init__(self, packed, ts):
        self.packed = packed
        self.ts = ts
        self.host = None
        self.done = threading.Event()
        self.queued = False

    def resolve(self) -> np.ndarray:
        """Host copy of the packed result (prefers the reader thread's
        prefetch; falls back to a direct blocking fetch)."""
        if (self.queued and self.done.wait(timeout=30.0)
                and isinstance(self.host, np.ndarray)):
            return self.host
        return np.asarray(self.packed, np.float64)


def _reader_loop(q: "queue.Queue") -> None:
    """Engine reader thread: eagerly pulls packed per-frame results to host
    so _finalize_tracking never pays the device->host round trip on the
    caller thread (the transfer releases the GIL while it rides the link)."""
    while True:
        entry = q.get()
        if entry is None:
            return
        try:
            entry.host = np.asarray(entry.packed, np.float64)
        except Exception as e:  # donated/invalid buffer: finalize re-fetches
            entry.host = e
        entry.done.set()


def _np_quat_to_rot(q: np.ndarray) -> np.ndarray:
    """Host-side (w,x,y,z) unit quaternion -> 3x3 rotation (numpy mirror of
    utils.rotations.quat_to_rot for the per-frame output path)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _map_points_device(table, window, ex_t, ex_q, init_depth):
    """World landmark positions (getSlidingWindowMapPoints,
    src/backend/estimator.cpp:357-390)."""
    elig = eligible_mask(table)
    good = (
        elig & (table.solve_flag == 1) & (table.depth > 0)
        & (jnp.abs(table.depth - init_depth) >= 0.01)
    )
    start = jnp.clip(table.start, 0, W - 1)
    ray = jnp.take_along_axis(table.obs, start[:, None, None], axis=1)[:, 0]
    pts_cam = ray * table.depth[:, None]
    r_wb = rot.quat_to_rot(window.q)[start]
    p_wb = window.p[start]
    r_wc = r_wb @ rot.quat_to_rot(ex_q)
    t_wc = p_wb + jnp.einsum("fij,j->fi", r_wb, ex_t)
    pts_w = jnp.einsum("fij,fj->fi", r_wc, pts_cam) + t_wc
    good = good & jnp.all(jnp.isfinite(pts_w), axis=-1)
    return pts_w, good


class VIOEngine:
    """Push-mode VIO engine. One instance per camera stream."""

    # Scale-runaway gate (see _finalize_tracking): failure when the median
    # solved depth exceeds FACTOR x a slow EMA baseline. EMA_RATE 0.005 at
    # 20 fps is a ~10 s timescale: genuine scene-scale changes slower than
    # that track the baseline; runaway (observed ~1.3x/s compounding)
    # outruns it within a few seconds.
    DEPTH_RUNAWAY_FACTOR = 3.0
    VEL_RUNAWAY_FACTOR = 2.0
    DEPTH_EMA_RATE = 0.005

    def __init__(self, cfg: VIOConfig, dtype=jnp.float32):
        # TPU f32 matmuls default to bfloat16 passes; the estimator's
        # whitened systems span ~1e15 dynamic range and the image kernels
        # feed sub-pixel math, so full f32 MXU precision is required for
        # correctness (not just accuracy polish).
        jax.config.update("jax_default_matmul_precision", "highest")
        problems = validate_config(cfg)
        if problems:
            raise ValueError(f"invalid config: {problems}")
        self.cfg = cfg
        self.dtype = dtype
        self.camera = make_camera(cfg.camera, dtype=dtype)
        self.params = est.make_params(cfg, dtype)
        self._gravity_np = np.asarray(cfg.estimator.gravity, np.float64)

        tcfg = cfg.tracker
        self._tracker_step = jax.jit(functools.partial(
            trk.detect_and_track, camera=self.camera, cfg=tcfg,
            focal=cfg.camera.focal_length,
        ))
        self._book = jax.jit(est.bookkeeping_step)

        # Packed-input fast path for the TRACKING hot loop: the per-frame
        # input arrives as ONE flat f32 vector (host->device transfers cost
        # a round trip each on a remote link; the unpacked FrameInput is ~10
        # small transfers per frame). Layout: [ts, imu_cnt, imu_dt(M),
        # imu_acc(3M), imu_gyr(3M)] (+ [ids(K), obs(3K), uv(2K), vel(2K),
        # valid(K)] in the feature-level variant). Unpacking is free inside
        # the jitted program. Feature ids ride f32 (exact below 2^24).
        m_pad = cfg.estimator.max_imu_per_interval
        k_pad = cfg.tracker.max_points

        def _unflatten_imu(flat):
            ts = flat[0]
            cnt = flat[1].astype(jnp.int32)
            dt = flat[2:2 + m_pad]
            acc = flat[2 + m_pad:2 + 4 * m_pad].reshape(m_pad, 3)
            gyr = flat[2 + 4 * m_pad:2 + 7 * m_pad].reshape(m_pad, 3)
            return ts, cnt, dt, acc, gyr

        def _book_flat(state, flat, params):
            ts, cnt, dt, acc, gyr = _unflatten_imu(flat)
            i = 2 + 7 * m_pad
            ids = jnp.round(flat[i:i + k_pad]).astype(jnp.int32)
            i += k_pad
            obs = flat[i:i + 3 * k_pad].reshape(k_pad, 3)
            i += 3 * k_pad
            uv = flat[i:i + 2 * k_pad].reshape(k_pad, 2)
            i += 2 * k_pad
            vel = flat[i:i + 2 * k_pad].reshape(k_pad, 2)
            i += 2 * k_pad
            valid = flat[i:i + k_pad] > 0.5
            inp = est.FrameInput(ts=ts, ids=ids, obs=obs, uv=uv, vel=vel,
                                 valid=valid, imu_dt=dt, imu_acc=acc,
                                 imu_gyr=gyr, imu_cnt=cnt)
            return est.bookkeeping_step(state, inp, params)

        def _book_dev_feat(state, flat, ids, obs, uv, vel, valid, params):
            ts, cnt, dt, acc, gyr = _unflatten_imu(flat)
            inp = est.FrameInput(ts=ts, ids=ids, obs=obs, uv=uv, vel=vel,
                                 valid=valid, imu_dt=dt, imu_acc=acc,
                                 imu_gyr=gyr, imu_cnt=cnt)
            return est.bookkeeping_step(state, inp, params)

        self._book_flat = jax.jit(_book_flat)
        self._book_dev_feat = jax.jit(_book_dev_feat)

        # The solve returns its pose + every host-gate scalar packed into ONE
        # (13,) f32 vector so the host fetches the whole per-frame result in a
        # single device->host transfer. Reading pose/diag field-by-field costs
        # one round trip per field — ~9 RTTs/frame, which dominates per-call
        # latency on any remote-device link (and is pure overhead even on
        # PCIe). Layout: [p(3), q(4), vel, pos, med_depth, finite, kf, n_trk].
        def _solve_packed(state, is_kf, params,
                          _n=cfg.estimator.num_iterations):
            state, p_out, q_out, diag = est.solve_and_slide(
                state, is_kf, params, num_iterations=_n)
            f32 = jnp.float32
            packed = jnp.concatenate([
                p_out.astype(f32), q_out.astype(f32),
                jnp.stack([
                    diag.vel_norm.astype(f32), diag.pos_norm.astype(f32),
                    diag.med_depth.astype(f32),
                    diag.state_finite.astype(f32),
                    diag.is_keyframe.astype(f32),
                    diag.last_track_num.astype(f32),
                ]),
            ])
            return state, packed, diag

        self._solve = jax.jit(_solve_packed)
        self._init_slide = jax.jit(est.initial_advance_or_slide)
        self._apply_init = jax.jit(est.apply_initialization)
        self._map_points = jax.jit(functools.partial(
            _map_points_device,
            ex_t=self.params.ex_t, ex_q=self.params.ex_q,
            init_depth=self.params.init_depth,
        ))
        self._key = jax.random.PRNGKey(0)
        # N-frame-lag streaming (enable_pipelined_streaming): survives
        # reset() so a re-initialized engine keeps its streaming contract.
        self._pipelined = False
        self._pipeline_depth = 1
        self._pending: list = []
        self._read_q: Optional[queue.Queue] = None
        self._reader: Optional[threading.Thread] = None
        # Per-stage wall-time EMAs (ms), keyed by stage name — the engine's
        # own tracing hooks (the reference's profiling timers around
        # detectAndTrack / processImage, vio_engine.cpp:209-243). Dispatch
        # times on the async paths measure host-side cost; *_wait measures
        # the blocking readback.
        self.stage_ms: dict = {}

        self.reset()

    def _stage_time(self, name: str, t0: float) -> None:
        dt_ms = (time.perf_counter() - t0) * 1e3
        prev = self.stage_ms.get(name)
        self.stage_ms[name] = dt_ms if prev is None else (
            prev + 0.05 * (dt_ms - prev))

    def get_timing(self) -> dict:
        """Smoothed per-stage host wall times in ms (tracing hook)."""
        return {k: round(v, 3) for k, v in self.stage_ms.items()}

    # ------------------------------------------------------------------
    # Lifecycle (configure/reset, vio_engine.cpp:25-109, 391-407)
    # ------------------------------------------------------------------

    def reset(self) -> None:
        # Fresh PRNG stream: deterministic replay after reset, and the old
        # key may have been donated away (chunked.make_chunked_image_step
        # donates its carry, which holds this key).
        self._key = jax.random.PRNGKey(0)
        self.state = est.init_state(self.cfg, self.params, self.dtype)
        self.tracker_state = trk.init_tracker_state(
            self.cfg.tracker, self.cfg.camera.height, self.cfg.camera.width,
            self.dtype,
        )
        self._pending = []  # drop any in-flight pipelined frames
        self._depth_ema: Optional[float] = None  # scale-runaway baseline
        self._vel_ema: float = 0.05
        self._last_flat = None  # last staged hot-path input (device array)
        self.status = Status.INITIALIZING
        self.frame_index = 0
        self.host_frames: list[HostFrame] = []
        self.window_ts = np.zeros(W)
        self._t0: Optional[float] = None
        self._first_frame_time: Optional[float] = None
        self._last_frame_ts: Optional[float] = None
        self._last_imu: Optional[np.ndarray] = None  # (7,) ts+acc+gyr
        self._pending_imu: list[np.ndarray] = []
        self._consecutive_failures = 0
        self._cooldown_remaining = 0
        self._last_pose: Optional[np.ndarray] = None
        self._last_imu_tail = np.zeros(6)
        self._banned_ids = jnp.full(
            (self.cfg.estimator.max_features,), -1, jnp.int32
        )
        self.params = self.params._replace(
            gravity=jnp.asarray(self._gravity_np, self.dtype)
        )

    def _rebuild_estimator(self) -> None:
        """Estimator rebuild on failure (vio_engine.cpp:188-207): tracker
        state survives, estimator restarts initialization. The learned
        camera-IMU time offset td survives the rebuild too — it is a
        calibration constant, not trajectory state."""
        # Host-fetch td BEFORE discarding the state: if the state arrays
        # were donated away (the chunked serving path donates its carry,
        # engine/chunked.py donate_argnums=(0,)), the read raises on TPU
        # (donation is a no-op on CPU, so only the chip sees this) and the
        # learned offset is simply lost for this rebuild — never poison the
        # fresh state with a dead buffer.
        try:
            old_td = float(self.state.td)
        except Exception:
            old_td = float(self.cfg.estimator.td_init)
        # A NaN-diverged tail carries td=NaN; float(NaN) succeeds, and a
        # NaN-seeded td flows straight into the observation residuals of
        # every frame after re-init (jnp.clip passes NaN through), making
        # the failure permanent. Rebuilds exist to shed diverged state —
        # never let td smuggle it back in.
        if not math.isfinite(old_td):
            old_td = float(self.cfg.estimator.td_init)
        self.state = est.init_state(self.cfg, self.params, self.dtype)
        self.state = self.state._replace(
            td=jnp.asarray(old_td, self.dtype))
        self._pending = []  # in-flight pipelined frames used the old state
        self._depth_ema = None
        self._vel_ema = 0.05
        self.host_frames = []
        self.window_ts = np.zeros(W)
        self._first_frame_time = None
        self.status = Status.INITIALIZING
        self.params = self.params._replace(
            gravity=jnp.asarray(self._gravity_np, self.dtype)
        )

    # ------------------------------------------------------------------
    # IMU handling (vio_engine.cpp:111-163)
    # ------------------------------------------------------------------

    def push_imu(self, ts: float, acc, gyr) -> None:
        """Buffer one IMU reading (timestamps in seconds, any epoch)."""
        self._pending_imu.append(
            np.concatenate([[ts], np.asarray(acc, float),
                            np.asarray(gyr, float)])
        )

    def _drain_imu(self, frame_ts: float):
        """Samples in (last_frame_ts, frame_ts], dt-gated, with linear
        interpolation at the frame timestamp."""
        take, keep = [], []
        for s in self._pending_imu:
            (take if s[0] <= frame_ts else keep).append(s)
        nxt = keep[0] if keep else None
        self._pending_imu = keep

        dts, accs, gyrs = [], [], []
        prev_ts = self._last_frame_ts
        for s in take:
            if self._last_imu is not None and prev_ts is not None:
                dt = s[0] - prev_ts
            elif prev_ts is not None:
                dt = s[0] - prev_ts
            else:
                dt = 0.005
            if dt < MIN_IMU_DT or dt > MAX_IMU_DT:
                prev_ts = s[0]
                self._last_imu = s
                continue
            dts.append(dt)
            accs.append(s[1:4])
            gyrs.append(s[4:7])
            prev_ts = s[0]
            self._last_imu = s

        # Interpolate a reading at exactly frame_ts (vio_engine.cpp:143-160).
        if (self._last_imu is not None and nxt is not None
                and prev_ts is not None and prev_ts < frame_ts):
            t0, t1 = self._last_imu[0], nxt[0]
            if t1 > t0:
                a = (frame_ts - t0) / (t1 - t0)
                interp = (1 - a) * self._last_imu[1:] + a * nxt[1:]
                dt = frame_ts - prev_ts
                if MIN_IMU_DT <= dt <= MAX_IMU_DT:
                    dts.append(dt)
                    accs.append(interp[0:3])
                    gyrs.append(interp[3:6])
                    self._last_imu = np.concatenate([[frame_ts], interp])
        return (np.asarray(dts), np.asarray(accs).reshape(-1, 3),
                np.asarray(gyrs).reshape(-1, 3))

    # ------------------------------------------------------------------
    # Frame processing (vio_engine.cpp:165-307)
    # ------------------------------------------------------------------

    def process_frame(self, image: np.ndarray, frame_ts: float,
                      imu_override=None) -> FrameResult:
        """Full image path: track features on device, then run the filter.

        imu_override: optional (dts, accs, gyrs) host arrays to use instead
        of draining the engine's own IMU buffer — the serving layer's
        replay-on-recovery path re-feeds frames whose IMU slice was already
        drained into a chunk program's inputs (engine/serving.py)."""
        t0 = time.perf_counter()
        img = jnp.asarray(image, self.dtype)
        self._key, sub = jax.random.split(self._key)
        if self._t0 is None:
            self._t0 = frame_ts
        self.tracker_state, tout = self._tracker_step(
            self.tracker_state, img,
            jnp.asarray(frame_ts - self._t0, self.dtype), key=sub,
            banned_ids=self._banned_ids,
        )
        self._stage_time("tracker_dispatch", t0)
        return self._process_tracked(
            frame_ts,
            ids=tout.ids, obs=tout.obs, uv=tout.uv, vel=tout.vel,
            valid=tout.valid, imu_override=imu_override,
        )

    def process_features(self, frame_ts: float, ids, rays, uv=None, vel=None,
                         valid=None) -> FrameResult:
        """Feature-level entry point (the contract the estimator consumes;
        lets dataset harnesses and the parity tests bypass the image
        pipeline, like the reference's MeasurementProcessor path)."""
        k_pad = self.cfg.tracker.max_points
        n = len(ids)
        if n > k_pad:
            raise ValueError(f"too many features: {n} > {k_pad}")

        def pad(a, shape):
            out = np.zeros((k_pad,) + shape)
            if n:
                out[:n] = a
            return out

        ids_p = np.full(k_pad, -1, np.int32)
        ids_p[:n] = np.asarray(ids, np.int32)
        valid_np = np.zeros(k_pad, bool)
        valid_np[:n] = True if valid is None else np.asarray(valid, bool)
        return self._process_tracked(
            frame_ts,
            host_feat=(
                ids_p,
                pad(np.asarray(rays), (3,)),
                pad(uv if uv is not None else np.zeros((n, 2)), (2,)),
                pad(vel if vel is not None else np.zeros((n, 2)), (2,)),
                valid_np,
            ),
        )

    def _process_tracked(self, frame_ts, ids=None, obs=None, uv=None,
                         vel=None, valid=None, host_feat=None,
                         imu_override=None) -> FrameResult:
        """Shared frame pipeline. Features arrive either as device arrays
        (image path: ids/obs/uv/vel/valid are tracker outputs already on
        device) or as padded host arrays (feature path: host_feat tuple,
        packed into the single-transfer fast path while TRACKING)."""
        if self._t0 is None:
            self._t0 = frame_ts
        if self._first_frame_time is None:
            self._first_frame_time = frame_ts

        # Cooldown (vio_engine.cpp:266-279).
        if self._cooldown_remaining > 0:
            self._cooldown_remaining -= 1
            self._last_frame_ts = frame_ts
            if self._cooldown_remaining == 0:
                self._rebuild_estimator()
                self._first_frame_time = frame_ts
            return FrameResult(False, None, Status.COOLDOWN, 0, False)

        if imu_override is not None:
            dts, accs, gyrs = imu_override
            dts = np.asarray(dts, float)
            accs = np.asarray(accs, float).reshape(-1, 3)
            gyrs = np.asarray(gyrs, float).reshape(-1, 3)
        else:
            dts, accs, gyrs = self._drain_imu(frame_ts)
        m_pad = self.cfg.estimator.max_imu_per_interval
        m = min(len(dts), m_pad)
        imu_flat = np.zeros(2 + 7 * m_pad, np.float32)
        imu_flat[0] = frame_ts - self._t0
        imu_flat[1] = m
        imu_flat[2:2 + m] = dts[:m]
        imu_flat[2 + m_pad:2 + m_pad + 3 * m] = np.ravel(accs[:m])
        imu_flat[2 + 4 * m_pad:2 + 4 * m_pad + 3 * m] = np.ravel(gyrs[:m])

        if self.status == Status.TRACKING:
            # Hot loop: one host->device transfer, no host reads of device
            # values (window full; frame_count pinned at W-1).
            if host_feat is not None:
                ids_p, obs_p, uv_p, vel_p, valid_p = host_feat
                flat = np.concatenate([
                    imu_flat, ids_p.astype(np.float32),
                    np.ravel(obs_p).astype(np.float32),
                    np.ravel(uv_p).astype(np.float32),
                    np.ravel(vel_p).astype(np.float32),
                    valid_p.astype(np.float32),
                ])
                flat_dev = jnp.asarray(flat, self.dtype)
                self._last_flat = flat_dev
                self.state, is_kf = self._book_flat(
                    self.state, flat_dev, self.params)
                n_track = int(valid_p.sum())
            else:
                self.state, is_kf = self._book_dev_feat(
                    self.state, jnp.asarray(imu_flat, self.dtype),
                    ids, obs, uv, vel, valid, self.params)
                n_track = None  # image path: diag.last_track_num covers it
            self._cur_frame_ts = frame_ts  # tags the pipelined pending entry
            self.window_ts[W - 1] = frame_ts
            result = self._process_tracking(is_kf)
            if (result.status == Status.TRACKING and not self._pipelined
                    and n_track is not None):
                result = result._replace(num_features=n_track)
            self._last_frame_ts = frame_ts
            self.frame_index += 1
            return result

        # ---- INITIALIZING path (per-frame host work is expected here) ----
        if host_feat is not None:
            ids_p, obs_p, uv_p, vel_p, valid_p = host_feat
            ids = jnp.asarray(ids_p)
            obs = jnp.asarray(obs_p, self.dtype)
            uv = jnp.asarray(uv_p, self.dtype)
            vel = jnp.asarray(vel_p, self.dtype)
            valid = jnp.asarray(valid_p)

        def pad(a, shape):
            out = np.zeros((m_pad,) + shape)
            out[:m] = a[:m]
            return out

        inp = est.FrameInput(
            ts=jnp.asarray(frame_ts - self._t0, self.dtype),
            ids=ids, obs=obs, uv=uv, vel=vel, valid=valid,
            imu_dt=jnp.asarray(pad(dts, ()), self.dtype),
            imu_acc=jnp.asarray(pad(accs, (3,)), self.dtype),
            imu_gyr=jnp.asarray(pad(gyrs, (3,)), self.dtype),
            imu_cnt=jnp.asarray(m, jnp.int32),
        )

        self.state, is_kf = self._book(self.state, inp, self.params)
        self._cur_frame_ts = frame_ts
        fc = int(self.state.frame_count)
        self.window_ts[min(fc, W - 1)] = frame_ts
        result = self._process_initializing(inp, is_kf, frame_ts,
                                            ids, obs, dts, accs, gyrs)

        self._last_frame_ts = frame_ts
        self.frame_index += 1
        return result

    # ------------------------------------------------------------------

    def _record_host_frame(self, frame_ts, ids, obs, dts, accs, gyrs):
        ids_np = np.asarray(ids)
        obs_np = np.asarray(obs, np.float64)
        valid = ids_np >= 0
        points = {int(i): obs_np[k] for k, i in enumerate(ids_np) if valid[k]}
        if self.host_frames:
            last = self._last_imu_tail
            pre = NpPreintegration(last[0:3], last[3:6], dts, accs, gyrs)
        else:
            pre = None
        if len(accs):
            self._last_imu_tail = np.concatenate([accs[-1], gyrs[-1]])
        self.host_frames.append(HostFrame(frame_ts, points, pre))

    def _process_initializing(self, inp, is_kf, frame_ts, ids, obs,
                              dts, accs, gyrs) -> FrameResult:
        self._record_host_frame(frame_ts, ids, obs, dts, accs, gyrs)

        # Init timeout -> rebuild (vio_engine.cpp:188-207).
        if (self._first_frame_time is not None
                and frame_ts - self._first_frame_time > INIT_TIMEOUT_S):
            self._rebuild_estimator()
            self._first_frame_time = frame_ts
            return FrameResult(False, None, Status.INITIALIZING, 0, False)

        fc = int(self.state.frame_count)
        if fc == W - 1:
            # Attempt initialization (rate limiting is handled by the frame
            # cadence; the reference limits to >=0.1s between attempts).
            table_np = {
                "fid": np.asarray(self.state.table.fid),
                "start": np.asarray(self.state.table.start),
                "obs": np.asarray(self.state.table.obs, np.float64),
                "mask": np.asarray(self.state.table.mask),
            }
            res = try_initialize(
                self.host_frames, self.window_ts, table_np,
                self.cfg.camera.focal_length,
                self.cfg.camera.r_ic_mat, self.cfg.camera.t_ic_vec,
                self.cfg.estimator.g_norm,
            )
            if res.ok:
                self.state, g_world = self._apply_init(
                    self.state,
                    jnp.asarray(res.p_cam, self.dtype),
                    jnp.asarray(res.q_body, self.dtype),
                    jnp.asarray(res.v_world, self.dtype),
                    jnp.asarray(res.bg, self.dtype),
                    jnp.asarray(res.gravity, self.dtype),
                    jnp.asarray(res.scale, self.dtype),
                    self.params,
                )
                self.params = self.params._replace(gravity=g_world)
                self.status = Status.TRACKING
                self.host_frames = []
                return self._process_tracking(is_kf)

        # Failed / not ready: advance or slide (estimator.cpp:205-214).
        old_ts0 = self.window_ts[0]
        self.state = self._init_slide(self.state, is_kf, self.params)
        if fc == W - 1:
            if bool(is_kf):
                self.window_ts[:-1] = self.window_ts[1:]
                # cleanupOldImageFrames (estimator.cpp:265-282).
                self.host_frames = [
                    f for f in self.host_frames if f.ts > old_ts0
                ]
            else:
                self.window_ts[W - 2] = self.window_ts[W - 1]
                # The merged general frame's host record is dropped too, but
                # the reference keeps it in all_image_frame; we keep it.
        n_feat = int(np.sum(np.asarray(inp.valid)))
        return FrameResult(False, None, Status.INITIALIZING, n_feat, bool(is_kf))

    def _process_tracking(self, is_kf) -> FrameResult:
        t0 = time.perf_counter()
        self.state, packed, diag = self._solve(
            self.state, is_kf, self.params
        )
        self._stage_time("solve_dispatch", t0)
        # Outlier-ban feedback to the tracker rides device-to-device; no
        # host sync required.
        self._banned_ids = diag.culled_ids

        if not self._pipelined:
            return self._finalize_tracking(packed)

        # Pipelined (one-frame-lag) streaming: the reference's real-time
        # contract is a per-frame push API (include/vio_engine.h:57-60); on
        # a chip behind a network tunnel, blocking on THIS frame's readback
        # makes every call RTT-bound. Instead: dispatch this frame's
        # program, hand the packed result to the reader thread (which eats
        # the device->host round trip off the caller's critical path), and
        # return the pose from `depth` frames ago — already fetched by the
        # time we need it. Per-call cost becomes device-time-bound.
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        entry = _PendingFrame(packed, self._cur_frame_ts)
        if self._read_q is not None:
            entry.queued = True
            self._read_q.put(entry)
        self._pending.append(entry)
        if len(self._pending) <= self._pipeline_depth:
            return FrameResult(False, self._last_pose, Status.TRACKING,
                               0, False)
        return self._finalize_tracking(self._pending.pop(0))

    def _check_scale_runaway(self, med_depth: float,
                             vel: float = 0.0) -> bool:
        """Update the median-depth (and |v|) EMA baselines; True when BOTH
        outrun them (see class constants). Monocular scale runaway inflates
        depth and velocity JOINTLY (they share the scale factor; observed
        depth 90x with |v| 6x GT) — depth alone also rises when the
        viewpoint legitimately shifts from a near wall to across the room,
        which on a 140 s sequence outruns the slow EMA and used to
        false-trip the gate (~1 reset/1000 frames, each costing ~1 m ATE
        through the re-init frame break). Requiring the velocity signature
        keeps the true-runaway detection and drops the viewpoint false
        positives."""
        if med_depth <= 0:
            return False
        if self._depth_ema is None:
            self._depth_ema = med_depth
            self._vel_ema = max(vel, 0.05)
            return False
        depth_runaway = med_depth > self.DEPTH_RUNAWAY_FACTOR * self._depth_ema
        vel_runaway = vel > self.VEL_RUNAWAY_FACTOR * max(self._vel_ema, 0.05)
        self._depth_ema += self.DEPTH_EMA_RATE * (med_depth - self._depth_ema)
        self._vel_ema += self.DEPTH_EMA_RATE * (vel - self._vel_ema)
        return depth_runaway and vel_runaway

    def enable_pipelined_streaming(self, on: bool = True,
                                   depth: int = 1) -> None:
        """Toggle N-frame-lag streaming (see _process_tracking). Results
        carry .ts identifying which frame the pose belongs to; call
        flush_all() at end of stream to drain in-flight frames.

        `depth` is the number of frames kept in flight: each push returns
        the pose from `depth` frames ago, whose async device->host copy has
        had `depth` call intervals to ride the (possibly high-latency)
        host<->device link. depth=1 is the reference-like one-frame lag;
        larger depths trade pose latency for RTT-immunity — failure gates
        (divergence/scale resets) also observe state `depth` frames late.
        """
        if not on:
            self.flush_all()
        if on and self._read_q is None:
            self._read_q = queue.Queue()
            self._reader = threading.Thread(
                target=_reader_loop, args=(self._read_q,), daemon=True,
                name="vio-readback")
            self._reader.start()
        self._pipelined = on
        self._pipeline_depth = max(1, int(depth))

    def measure_device_step(self, n: int = 50) -> Optional[float]:
        """Device-bound per-frame step time in milliseconds.

        Re-dispatches the TRACKING-mode step (bookkeeping + solve) on the
        last staged hot-path input n times back-to-back with NO host reads —
        consecutive programs pipeline on-chip via JAX async dispatch — then
        blocks once. This splits honest device throughput from host<->device
        link weather: the wall-clock streaming fps over a network tunnel
        swings ~2x with RTT on identical code, this number does not. The
        engine's own state is untouched (the throwaway state chain is
        discarded). Returns None unless a flat-packed frame has been
        processed (i.e. the engine has reached TRACKING on the feature path).
        """
        if self._last_flat is None or self.status != Status.TRACKING:
            return None
        st, kf = self._book_flat(self.state, self._last_flat, self.params)
        st, packed, _ = self._solve(st, kf, self.params)
        jax.block_until_ready(packed)  # warmup: drain queue, prime caches
        st = self.state
        t0 = time.perf_counter()
        for _ in range(n):
            st, kf = self._book_flat(st, self._last_flat, self.params)
            st, packed, _ = self._solve(st, kf, self.params)
        jax.block_until_ready(packed)
        return 1e3 * (time.perf_counter() - t0) / n

    def flush(self) -> Optional[FrameResult]:
        """Drain all in-flight pipelined frames; returns the final frame's
        result (use flush_all for every drained result)."""
        results = self.flush_all()
        return results[-1] if results else None

    def flush_all(self) -> list:
        """Finalize every in-flight pipelined frame, in dispatch order."""
        pending, self._pending = self._pending, []
        out = []
        for prev in pending:
            out.append(self._finalize_tracking(prev))
            # A gate trip rebuilt the estimator; later pending frames were
            # dispatched against the discarded state lineage — drop them.
            if self.status != Status.TRACKING:
                break
        return out

    def _finalize_tracking(self, packed,
                           ts: Optional[float] = None) -> FrameResult:
        # ONE device->host transfer for the whole per-frame result (see
        # _solve_packed): pose + every gate scalar arrive together — and in
        # pipelined mode the reader thread has usually already landed it.
        t0 = time.perf_counter()
        if isinstance(packed, _PendingFrame):
            ts = packed.ts
            v = packed.resolve()
        else:
            v = np.asarray(packed, np.float64)
        self._stage_time("result_wait", t0)
        p_np, q_np = v[:3], v[3:7]
        vel, pos, med_depth = float(v[7]), float(v[8]), float(v[9])
        finite = bool(v[10] > 0.5)
        is_kf = bool(v[11] > 0.5)
        n_feat = int(v[12])

        if is_kf:
            self.window_ts[:-1] = self.window_ts[1:]
        else:
            self.window_ts[W - 2] = self.window_ts[W - 1]

        # Estimator-level divergence resets (estimator.cpp:218-251), plus a
        # monocular scale-runaway gate beyond the reference: depth inflation
        # (median solved depth vs a slow baseline EMA) is the signature of
        # scale divergence — deeper scene -> larger apparent motion -> new
        # landmarks seeded deeper — which drifts tens of meters while every
        # reference gate stays silent (observed: median depth 2.8 -> 252 m
        # over 8 s with |v| 6x ground truth and TRACKING status throughout).
        scale_runaway = self._check_scale_runaway(med_depth, vel)
        if not finite or vel > 10.0 or pos > 100.0 or scale_runaway:
            self._consecutive_failures += 1
            if self._consecutive_failures >= MAX_CONSECUTIVE_FAILURES:
                self._cooldown_remaining = COOLDOWN_FRAMES
                self.status = Status.COOLDOWN
            else:
                self._rebuild_estimator()
                self.status = Status.LOST
            return FrameResult(False, None, self.status, 0, False)
        # Engine-level catastrophic divergence (vio_engine.cpp:248-264).
        if pos > 1e6:
            self._rebuild_estimator()
            return FrameResult(False, None, Status.LOST, 0, False)

        self._consecutive_failures = 0
        self.status = Status.TRACKING
        # (outlier-ban feedback was already applied at dispatch time in
        # _process_tracking — re-applying here would regress it by one
        # frame in pipelined mode)

        # Camera pose output (vio_engine.cpp:293-305). Pure host math — a
        # device-dispatched quat_to_rot on 4 floats would cost a round trip.
        r_wb = _np_quat_to_rot(q_np)
        r_ic = self.cfg.camera.r_ic_mat
        t_ic = self.cfg.camera.t_ic_vec
        pose = np.eye(4)
        pose[:3, :3] = r_wb @ r_ic
        pose[:3, 3] = p_np + r_wb @ t_ic
        self._last_pose = pose
        return FrameResult(True, pose, Status.TRACKING, n_feat,
                           is_kf, ts=ts)

    # ------------------------------------------------------------------
    # Introspection (vio_engine.cpp:313-352)
    # ------------------------------------------------------------------

    def is_initialized(self) -> bool:
        return self.status == Status.TRACKING

    def get_status(self) -> Status:
        return self.status

    def get_map_points(self) -> np.ndarray:
        """(N, 3) world landmarks (getMapPoints, vio_engine.cpp:330-340)."""
        if self.status != Status.TRACKING:
            return np.zeros((0, 3))
        pts, good = self._map_points(self.state.table, self.state.window)
        return np.asarray(pts)[np.asarray(good)]

    def get_tracked_points(self):
        """Current tracked feature positions for the per-frame overlay
        debug view (the reference's cv::imshow feature overlay,
        measurement_processor.cpp:233-246): (pts (N, 2) pixel coords,
        track_cnt (N,)) for the active tracker slots."""
        ts = self.tracker_state
        act = np.asarray(ts.active)
        return np.asarray(ts.pts)[act], np.asarray(ts.track_cnt)[act]

    def get_body_state(self):
        """Latest window-tip body state (for evaluation/logging)."""
        w = self.state.window
        return (np.asarray(w.p[W - 1]), np.asarray(w.q[W - 1]),
                np.asarray(w.v[W - 1]))
