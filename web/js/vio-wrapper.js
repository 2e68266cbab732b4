/**
 * VIOWrapper — promise-based main-thread facade over the VIO Web Worker.
 *
 * Mirrors the reference's web/js/vio-wrapper.js (:40-178): load/configure/
 * reset round-trips, fire-and-forget IMU sends, frame sends with busy-drop,
 * and latest-result polling — but the engine boundary is a Worker that owns
 * a WebSocket to the TPU gateway instead of a Worker that owns a WASM heap.
 *
 * Zero-copy transfers both ways: frame and IMU payloads move to the worker
 * as transferable ArrayBuffers and come back for reuse through BufferPool
 * (the analog of the reference's shared-memory.js WASM-heap views,
 * web/js/shared-memory.js:5-84 — there is no linear heap here, so the
 * "shared memory" is a recycled transferable pool, which is the idiomatic
 * zero-copy mechanism between browser threads).
 *
 * Exposes the same surface as VIOClient so App can use either directly.
 */
'use strict';

/** Recycled transferable ArrayBuffers (shared-memory.js analog). */
class BufferPool {
  constructor() { this.free = []; }
  /** Get a buffer of at least `size` bytes (exact-size allocation). */
  acquire(size) {
    for (let i = 0; i < this.free.length; i++) {
      if (this.free[i].byteLength === size) return this.free.splice(i, 1)[0];
    }
    return new ArrayBuffer(size);
  }
  release(buf) {
    if (buf && buf.byteLength) {        // detached buffers have length 0
      this.free.push(buf);
      if (this.free.length > 8) this.free.shift();
    }
  }
}

class VIOWrapper {
  constructor(url, workerPath) {
    this.url = url;
    this.workerPath = workerPath || 'js/vio-worker.js';
    this.worker = null;
    this.latestResult = null;
    this.latestMapPoints = [];
    this.stats = { sent: 0, dropped: 0, results: 0, procMs: 0 };
    this.onResult = null;
    this.onLog = null;
    this._pool = new BufferPool();
    this._inFlight = 0;                 // frames posted, buffer not yet back
    this._waiters = {};
  }

  /** Spawn the worker and connect it to the gateway. */
  connect() {
    this.worker = new Worker(this.workerPath);
    this.worker.onmessage = (ev) => this._onMessage(ev.data);
    this.worker.postMessage({ type: 'init', url: this.url });
    return this._waitFor('ready').then((m) => {
      if (m.error) throw new Error(m.error);
    });
  }

  _onMessage(msg) {
    switch (msg.type) {
      case 'result': {
        const r = msg.result;
        this.latestResult = r;
        this.stats.results++;
        this.stats.procMs = r.proc_ms;
        if (this.onResult) this.onResult(r);
        break;
      }
      case 'map_points':
        this.latestMapPoints = msg.points;
        break;
      case 'frame_buf':
        this._inFlight = Math.max(0, this._inFlight - 1);
        if (msg.stats) {
          this.stats.sent = msg.stats.sent;
          this.stats.dropped = msg.stats.dropped + (msg.stats.busy || 0);
        }
        this._pool.release(msg.buf);
        break;
      case 'imu_buf':
        this._pool.release(msg.buf);
        break;
      case 'log':
        if (this.onLog) this.onLog(msg.message);
        break;
    }
    const w = this._waiters[msg.type];
    if (w && w.length) w.shift()(msg);
  }

  _waitFor(type, timeoutMs = 30000) {
    return new Promise((resolve, reject) => {
      (this._waiters[type] = this._waiters[type] || []).push(resolve);
      setTimeout(() => reject(new Error('timeout waiting for ' + type)),
                 timeoutMs);
    });
  }

  async configure(profile, overrides) {
    this.worker.postMessage(
        { type: 'configure', profile: profile, config: overrides || {} });
    return this._waitFor('configured').then((m) => m.result);
  }

  async reset() {
    this.worker.postMessage({ type: 'reset' });
    return this._waitFor('reset_done');
  }

  dispose() {
    if (this.worker) {
      this.worker.postMessage({ type: 'dispose' });
      this.worker = null;
    }
  }

  /** samples: array of [ts, ax, ay, az, gx, gy, gz]. Fire-and-forget. */
  sendIMU(samples) {
    if (!this.worker || !samples.length) return;
    const buf = this._pool.acquire(samples.length * 7 * 8);
    const f64 = new Float64Array(buf, 0, samples.length * 7);
    for (let i = 0; i < samples.length; i++)
      for (let k = 0; k < 7; k++) f64[i * 7 + k] = samples[i][k];
    this.worker.postMessage(
        { type: 'imu', buf: buf, count: samples.length }, [buf]);
  }

  /**
   * gray: Uint8Array. Busy-drop: at most 2 frames in transit to the worker
   * (the worker itself busy-drops on the socket; this bound only prevents
   * unbounded copies if the worker stalls). Returns true if posted.
   */
  sendFrame(gray, w, h, ts) {
    if (!this.worker) return false;
    if (this._inFlight >= 2) { this.stats.dropped++; return false; }
    const buf = this._pool.acquire(gray.length);
    new Uint8Array(buf).set(gray);
    this._inFlight++;
    this.worker.postMessage(
        { type: 'frame', buf: buf, width: w, height: h, ts: ts }, [buf]);
    return true;
  }

  getLatestResult() { return this.latestResult; }
  getMapPoints() {
    // Map points arrive pushed from the gateway via the worker.
    return this.latestMapPoints;
  }
}

if (typeof module !== 'undefined') module.exports = { VIOWrapper, BufferPool };
