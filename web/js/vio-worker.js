/**
 * VIO Web Worker — owns the gateway WebSocket off the main thread.
 *
 * Mirrors the role of the reference's web/js/vio-worker.js (which owns the
 * WASM engine instance): the main thread posts IMU batches and camera
 * frames as transferable ArrayBuffers; this worker buffers IMU in a ring
 * (vio-worker.js:72-97), drains it to the engine at frame time with
 * stale-sample discard and one-reading lookahead for interpolation
 * (drainIMUToWasm, vio-worker.js:105-165), detects frame gaps
 * (vio-worker.js:245-251), and forwards results back. The engine here is
 * remote (TPU host behind web/vio_gateway.py), so "call into WASM" becomes
 * "send on the WebSocket" — everything else is the same architecture:
 * capture and rendering never block on engine I/O.
 *
 * Message protocol (main -> worker):
 *   {type:'init', url}                          connect to the gateway
 *   {type:'configure', profile, config}
 *   {type:'imu', buf, count}                    buf: count*7 float64
 *   {type:'frame', buf, width, height, ts}      buf: width*height uint8
 *   {type:'reset'} {type:'dispose'}
 * Worker -> main:
 *   {type:'ready'|'configured'|'reset_done'|'result'|'map_points'|'log', …}
 *   {type:'imu_buf', buf} / {type:'frame_buf', buf}   returned for reuse
 */
'use strict';

importScripts('vio-client.js');

const RING_CAP = 1024;            // vio-worker.js:72 (1024 x 7 float64)
const STALE_IMU_S = 0.5;          // vio-worker.js:108-121
const FRAME_GAP_S = 1.5;          // vio-worker.js:245-251

const state = {
  client: null,
  ring: new Float64Array(RING_CAP * 7),
  ringHead: 0,                    // index of oldest sample
  ringCount: 0,
  lastFrameTs: null,
  dropped: { stale: 0, overflow: 0, busy: 0 },
};

function ringPush(samples, count) {
  for (let i = 0; i < count; i++) {
    if (state.ringCount === RING_CAP) {      // overwrite oldest
      state.ringHead = (state.ringHead + 1) % RING_CAP;
      state.ringCount--;
      state.dropped.overflow++;
    }
    const slot = (state.ringHead + state.ringCount) % RING_CAP;
    for (let k = 0; k < 7; k++)
      state.ring[slot * 7 + k] = samples[i * 7 + k];
    state.ringCount++;
  }
}

/**
 * Drain ring samples up to frameTs plus ONE reading past it (the engine
 * interpolates at the image timestamp, vio-worker.js:138-150), discarding
 * samples staler than frameTs - 0.5 s. Returns array of 7-vectors.
 */
function ringDrain(frameTs) {
  const out = [];
  let tookPast = false;
  while (state.ringCount > 0 && !tookPast) {
    const slot = state.ringHead;
    const ts = state.ring[slot * 7];
    if (ts > frameTs) tookPast = true;       // include one reading past
    state.ringHead = (state.ringHead + 1) % RING_CAP;
    state.ringCount--;
    if (ts < frameTs - STALE_IMU_S) { state.dropped.stale++; continue; }
    const s = new Array(7);
    for (let k = 0; k < 7; k++) s[k] = state.ring[slot * 7 + k];
    out.push(s);
  }
  return out;
}

function post(obj, transfer) { self.postMessage(obj, transfer || []); }

async function handleInit(msg) {
  state.client = new VIOClient(msg.url);
  state.client.onResult = (r) => post({ type: 'result', result: r });
  state.client.onMapPoints = (p) => post({ type: 'map_points', points: p });
  state.client.onLog = (m) => post({ type: 'log', message: m });
  try {
    await state.client.connect();
    post({ type: 'ready' });
  } catch (e) {
    post({ type: 'log', message: 'gateway connect failed: ' + e.message });
    post({ type: 'ready', error: String(e.message || e) });
  }
}

self.onmessage = async (ev) => {
  const msg = ev.data;
  const c = state.client;
  switch (msg.type) {
    case 'init':
      await handleInit(msg);
      break;
    case 'configure': {
      const r = await c.configure(msg.profile, msg.config);
      post({ type: 'configured', result: r });
      break;
    }
    case 'imu': {
      const f64 = new Float64Array(msg.buf);
      ringPush(f64, msg.count);
      post({ type: 'imu_buf', buf: msg.buf }, [msg.buf]);  // return for reuse
      break;
    }
    case 'frame': {
      const ts = msg.ts;
      // Frame-gap reset: a backgrounded tab resumes with a stale engine
      // state — reset and purge buffered IMU (vio-worker.js:245-251).
      if (state.lastFrameTs !== null && ts - state.lastFrameTs > FRAME_GAP_S) {
        post({ type: 'log', message: 'frame gap > 1.5s — resetting' });
        state.ringHead = 0; state.ringCount = 0;
        await c.reset();
      }
      state.lastFrameTs = ts;
      const imu = ringDrain(ts);
      if (imu.length) c.sendIMU(imu);
      const gray = new Uint8Array(msg.buf, 0, msg.width * msg.height);
      if (!c.sendFrame(gray, msg.width, msg.height, ts))
        state.dropped.busy++;
      post({ type: 'frame_buf', buf: msg.buf,
             stats: { ...c.stats, ...state.dropped } },
           [msg.buf]);
      break;
    }
    case 'get_map_points':
      post({ type: 'map_points', points: c ? c.getMapPoints() : [] });
      break;
    case 'reset': {
      state.ringHead = 0; state.ringCount = 0;
      state.lastFrameTs = null;
      await c.reset();
      post({ type: 'reset_done' });
      break;
    }
    case 'dispose':
      if (c) c.dispose();
      post({ type: 'disposed' });
      self.close();
      break;
    default:
      post({ type: 'log', message: 'worker: unknown message ' + msg.type });
  }
};
