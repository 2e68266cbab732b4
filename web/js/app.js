/**
 * Mobile VIO web app — main-thread orchestration.
 *
 * Role of the reference's web/js/app.js: config profiles + focal-from-FOV
 * estimation (:218-335), adaptive frame pacing (50 ms during init, 33 ms
 * while tracking, :151-196), the rAF process loop with frame dedup and
 * camera warmup skip (:1041-1226), IMU flush cadence (:905-978), lifecycle
 * (visibility/blur) handling, and status UI. The engine itself runs on the
 * TPU host behind web/vio_gateway.py; profiles are resolved gateway-side.
 */
'use strict';

const App = {
  vio: null, camera: null, imu: null, renderer: null,
  running: false,
  initPacingMs: 50,        // 20 fps while initializing (app.js:151-196)
  trackPacingMs: 33,       // 30 fps while tracking
  lastSentMs: 0,
  warmupFrames: 10,        // skip auto-exposure settling (app.js:1070)
  framesSeen: 0,
  imuFlushTimer: null,
  statusEl: null, fpsEl: null,
  _fpsWindow: [],

  async start() {
    this.statusEl = document.getElementById('status');
    this.fpsEl = document.getElementById('fps');
    this._status('connecting to gateway…');

    const url = new URLSearchParams(location.search);
    const gateway = url.get('gateway') ||
        `ws://${location.hostname}:8765/`;
    const profile = url.get('profile') || 'mobile_default';

    // Default: Worker-owned socket + client-side IMU ring buffer
    // (vio-wrapper.js / vio-worker.js, mirroring the reference's worker
    // architecture) so capture and rendering never block on engine I/O.
    // ?worker=0 falls back to the direct main-thread client.
    const useWorker = url.get('worker') !== '0' &&
        typeof Worker !== 'undefined';
    this.vio = useWorker ? new VIOWrapper(gateway) : new VIOClient(gateway);
    await this.vio.connect();
    this.vio.onLog = (m) => this._status(m);

    this._status('requesting sensors…');
    await IMUCapture.requestPermission();
    this.imu = new IMUCapture();
    await this.imu.start();
    this.imu.calibrate(1.5);   // hold still: stationary gyro-bias estimate

    this.camera = new CameraCapture({ width: 320, height: 240 });
    const dims = await this.camera.start();

    // Focal length from an assumed ~60 deg horizontal FOV unless the
    // profile carries calibration (reference estimates from FOV with
    // validation, app.js:218-335).
    const fovDeg = parseFloat(url.get('fov') || '60');
    const fx = dims.width / (2 * Math.tan(fovDeg * Math.PI / 360));
    await Orientation.lockPortrait();   // reference orientation.js behavior
    this._profile = profile;
    this._camOverrides = () => ({
      camera: { width: dims.width, height: dims.height,
                fx: fx, fy: fx, focal_length: fx,
                cx: dims.width / 2, cy: dims.height / 2,
                r_ic: Orientation.r_ic() },
    });
    await this.vio.configure(profile, this._camOverrides());
    // Orientation flip changes the camera-from-body rotation -> the engine
    // must reconfigure + reinitialize (orientation.js:24-228 equivalent).
    Orientation.onChange(async () => {
      this._status('orientation changed — reconfiguring');
      await this.vio.configure(this._profile, this._camOverrides());
      this.renderer.clear();
    });

    this.renderer = new Renderer3D(document.getElementById('view3d'));
    this.vio.onResult = (r) => this._onResult(r);

    // IMU flush loop at 10 ms (app.js:905).
    this.imuFlushTimer = setInterval(() => {
      const batch = this.imu.flush();
      if (batch.length) this.vio.sendIMU(batch);
    }, 10);

    document.addEventListener('visibilitychange', () => {
      if (document.hidden) this.pause(); else this.resume();
    });

    this.running = true;
    this._status('initializing — move the phone in a figure-8');
    requestAnimationFrame((t) => this._loop(t));
    this._renderLoop();
  },

  _loop(nowMs) {
    if (!this.running) return;
    const tracking = this.vio.latestResult &&
        this.vio.latestResult.status === 'TRACKING';
    const pacing = tracking ? this.trackPacingMs : this.initPacingMs;
    if (nowMs - this.lastSentMs >= pacing && this.camera.hasNewFrame()) {
      const f = this.camera.captureGray();
      this.framesSeen++;
      if (f && this.framesSeen > this.warmupFrames) {
        if (this.vio.sendFrame(f.gray, f.width, f.height, f.ts))
          this.lastSentMs = nowMs;
      }
    }
    requestAnimationFrame((t) => this._loop(t));
  },

  _onResult(r) {
    if (r.ok && r.pose) {
      this.renderer.updatePose(r.pose);
      this.renderer.updateMapPoints(this.vio.getMapPoints());
      this._fpsWindow.push(performance.now());
      while (this._fpsWindow.length &&
             this._fpsWindow[0] < performance.now() - 2000)
        this._fpsWindow.shift();
    }
    const fps = (this._fpsWindow.length / 2).toFixed(1);
    this._status(`${r.status}  features:${r.num_features}  ` +
                 `engine:${r.proc_ms}ms`);
    if (this.fpsEl)
      this.fpsEl.textContent =
          `${fps} fps  imu:${this.imu.rateEstimate.toFixed(0)}Hz  ` +
          `drop:${this.vio.stats.dropped}`;
  },

  _renderLoop() {
    if (this.renderer) this.renderer.render();
    requestAnimationFrame(() => this._renderLoop());
  },

  async reset() {
    if (this.vio) { await this.vio.reset(); this.renderer.clear(); }
    this._status('reset — reinitializing');
  },

  pause() { this.running = false; },
  resume() {
    if (!this.running && this.vio) {
      this.running = true;
      requestAnimationFrame((t) => this._loop(t));
    }
  },

  _status(msg) { if (this.statusEl) this.statusEl.textContent = msg; },
};

window.App = App;
