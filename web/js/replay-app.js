/**
 * Dataset replay through the FULL client path — the reference's in-browser
 * TUM-VI harness (web/js/test-tumvi-app.js:16-55 + web/test-tumvi.html):
 * fetches a dataset over HTTP and drives it through the same VIOClient /
 * gateway pipeline the live app uses, isolating engine issues from
 * camera/IMU capture issues. Dataset layout: manifest.json + frames/ +
 * imu.csv produced by scripts/export_replay_dataset.py and served with
 * `python web/server.py --run logs/x --data <dir>`.
 */
'use strict';

const ReplayApp = {
  vio: null, renderer: null, manifest: null,
  imu: [], running: false,
  stats: { poses: 0, frames: 0, drift: 0 },

  async start() {
    const el = (id) => document.getElementById(id);
    this._status = (m) => { el('status').textContent = m; };
    const url = new URLSearchParams(location.search);
    const gateway = url.get('gateway') || `ws://${location.hostname}:8765/`;

    this._status('fetching manifest…');
    this.manifest = await (await fetch('manifest.json')).json();
    const imuText = await (await fetch(this.manifest.imu_csv)).text();
    this.imu = imuText.split('\n')
        .filter(l => l && !l.startsWith('#'))
        .map(l => l.split(',').map(Number));

    this._status('connecting to gateway…');
    this.vio = new VIOClient(gateway);
    await this.vio.connect();
    await this.vio.configure(this.manifest.profile, this.manifest.config);

    this.renderer = new Renderer3D(el('view3d'));
    this.running = true;
    this._renderLoop();
    await this._replay();
  },

  async _replay() {
    const frames = this.manifest.frames;
    const gt = {};
    for (const g of this.manifest.ground_truth || [])
      gt[g.ts.toFixed(4)] = g.p;
    const cv = document.createElement('canvas');
    const ctx = cv.getContext('2d', { willReadFrequently: true });
    let imuIdx = 0, origin = null, gtOrigin = null;

    for (let fi = 0; fi < frames.length && this.running; fi++) {
      const fr = frames[fi];
      // IMU slice up to the frame time (measurement_processor.cpp:272-286).
      const batch = [];
      while (imuIdx < this.imu.length &&
             this.imu[imuIdx][0] <= fr.ts + 1e-9)
        batch.push(this.imu[imuIdx++]);
      if (batch.length) this.vio.sendIMU(batch);

      const gray = await this._loadGray(fr.file, cv, ctx);
      const resultP = new Promise(res => { this.vio.onResult = res; });
      this.vio.sendFrame(gray.data, gray.w, gray.h, fr.ts);
      const r = await resultP;

      this.stats.frames++;
      if (r.ok && r.pose) {
        this.stats.poses++;
        this.renderer.updatePose(r.pose);
        this.renderer.updateMapPoints(this.vio.getMapPoints());
        // Start-aligned drift vs ground truth (coarse sanity — the real
        // ATE runs host-side; this flags gross engine/transport bugs).
        const g = gt[fr.ts.toFixed(4)];
        if (g) {
          const p = [r.pose[3], r.pose[7], r.pose[11]];
          if (!origin) { origin = p; gtOrigin = g; }
          this.stats.drift = Math.hypot(
              (p[0] - origin[0]) - (g[0] - gtOrigin[0]),
              (p[1] - origin[1]) - (g[1] - gtOrigin[1]),
              (p[2] - origin[2]) - (g[2] - gtOrigin[2]));
        }
      }
      this._status(
          `${fi + 1}/${frames.length}  ${r.status}  ` +
          `poses:${this.stats.poses}  engine:${r.proc_ms}ms  ` +
          `drift:${this.stats.drift.toFixed(2)}m`);
    }
    this._status(`done — ${this.stats.poses}/${this.stats.frames} poses, ` +
                 `final drift ${this.stats.drift.toFixed(2)}m`);
  },

  _loadGray(file, cv, ctx) {
    return new Promise((resolve, reject) => {
      const img = new Image();
      img.onload = () => {
        cv.width = img.width; cv.height = img.height;
        ctx.drawImage(img, 0, 0);
        const rgba = ctx.getImageData(0, 0, img.width, img.height).data;
        const gray = new Uint8Array(img.width * img.height);
        for (let i = 0, j = 0; i < gray.length; i++, j += 4)
          gray[i] = rgba[j];  // exporter writes grayscale PNGs
        resolve({ data: gray, w: img.width, h: img.height });
      };
      img.onerror = () => reject(new Error('frame load failed: ' + file));
      img.src = file;
    });
  },

  stop() { this.running = false; },
  _renderLoop() {
    if (this.renderer) this.renderer.render();
    if (this.running) requestAnimationFrame(() => this._renderLoop());
  },
};

window.ReplayApp = ReplayApp;
