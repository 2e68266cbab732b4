/**
 * VIOClient — promise-based facade over the WebSocket to the TPU VIO
 * gateway (web/vio_gateway.py).
 *
 * Plays the role of the reference's vio-wrapper.js (main-thread facade over
 * the WASM worker, web/js/vio-wrapper.js:40-178): configure/reset/dispose
 * round-trips, fire-and-forget binary IMU batches, frame sends with
 * busy-drop (never queue camera frames behind a slow engine), and
 * latest-result polling for the render loop.
 *
 * Binary wire format must match vio_gateway.py:
 *   IMU  : u8 0x02, u8 0, u16 count, count*7 float64 LE
 *   frame: u8 0x03, u8 0, u16 w, u16 h, u16 0, float64 ts, w*h u8 gray
 */
'use strict';

class VIOClient {
  constructor(url) {
    this.url = url;
    this.ws = null;
    this.busy = false;          // frame in flight (busy-drop gate)
    this.latestResult = null;
    this.latestMapPoints = [];
    this.stats = { sent: 0, dropped: 0, results: 0, procMs: 0 };
    this._waiters = {};         // type -> [resolve]
    this.onResult = null;       // optional callback(result)
    this.onMapPoints = null;    // optional callback(points)
    this.onLog = null;
  }

  connect() {
    return new Promise((resolve, reject) => {
      const ws = new WebSocket(this.url);
      ws.binaryType = 'arraybuffer';
      ws.onopen = () => { this.ws = ws; resolve(); };
      ws.onerror = (e) => reject(new Error('gateway connect failed'));
      ws.onclose = () => { this.ws = null; };
      ws.onmessage = (ev) => this._onMessage(ev);
    });
  }

  _onMessage(ev) {
    let msg;
    try { msg = JSON.parse(ev.data); } catch (e) { return; }
    if (msg.type === 'result') {
      this.busy = false;
      this.latestResult = msg;
      this.stats.results++;
      this.stats.procMs = msg.proc_ms;
      if (this.onResult) this.onResult(msg);
    } else if (msg.type === 'map_points') {
      this.latestMapPoints = msg.points;
      if (this.onMapPoints) this.onMapPoints(msg.points);
    } else if (msg.type === 'error') {
      this.busy = false;
      if (this.onLog) this.onLog('gateway error: ' + msg.message);
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
    this.ws.send(JSON.stringify(
        { type: 'configure', profile: profile, config: overrides || {} }));
    return this._waitFor('configured');
  }

  async reset() {
    this.busy = false;
    this.ws.send(JSON.stringify({ type: 'reset' }));
    return this._waitFor('reset_done');
  }

  dispose() {
    if (this.ws) {
      this.ws.send(JSON.stringify({ type: 'dispose' }));
      this.ws.close();
    }
  }

  /** samples: array of [ts, ax, ay, az, gx, gy, gz]. Fire-and-forget. */
  sendIMU(samples) {
    if (!this.ws || !samples.length) return;
    const buf = new ArrayBuffer(4 + samples.length * 7 * 8);
    const dv = new DataView(buf);
    dv.setUint8(0, 0x02);
    dv.setUint16(2, samples.length, true);
    const f64 = new Float64Array(buf, 4);
    for (let i = 0; i < samples.length; i++)
      for (let k = 0; k < 7; k++) f64[i * 7 + k] = samples[i][k];
    this.ws.send(buf);
  }

  /**
   * gray: Uint8Array (w*h). Returns true if sent, false if dropped because
   * the previous frame is still in flight (vio-wrapper.js:154-178 busy-drop:
   * a real-time tracker must skip frames, never queue them).
   */
  sendFrame(gray, w, h, ts) {
    if (!this.ws) return false;
    if (this.busy) { this.stats.dropped++; return false; }
    this.busy = true;
    const buf = new ArrayBuffer(16 + gray.length);
    const dv = new DataView(buf);
    dv.setUint8(0, 0x03);
    dv.setUint16(2, w, true);
    dv.setUint16(4, h, true);
    dv.setFloat64(8, ts, true);
    new Uint8Array(buf, 16).set(gray);
    this.ws.send(buf);
    this.stats.sent++;
    return true;
  }

  getLatestResult() { return this.latestResult; }
  getMapPoints() { return this.latestMapPoints; }
}

if (typeof module !== 'undefined') module.exports = { VIOClient };
