/**
 * Live 3D renderer: trajectory polyline, map-point cloud, camera frustum,
 * ground grid, orbit/zoom controls — the role of the reference's Three.js
 * renderer (web/js/renderer.js:17-95), as a dependency-free
 * software-projected 2D-canvas module (shared approach with viewer.html).
 */
'use strict';

class Renderer3D {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext('2d');
    this.traj = [];
    this.mapPts = [];
    this.pose = null;         // 4x4 row-major camera pose (world-from-cam)
    this.yaw = -0.8; this.pitch = 0.5; this.dist = 6;
    this.center = [0, 0, 0];
    this.follow = true;
    this._bindControls();
  }

  _bindControls() {
    let drag = null;
    const c = this.canvas;
    c.addEventListener('pointerdown', e => drag = [e.clientX, e.clientY]);
    window.addEventListener('pointerup', () => drag = null);
    window.addEventListener('pointermove', e => {
      if (!drag) return;
      this.yaw += (e.clientX - drag[0]) * 0.01;
      this.pitch = Math.max(-1.5, Math.min(1.5,
          this.pitch + (e.clientY - drag[1]) * 0.01));
      drag = [e.clientX, e.clientY];
    });
    c.addEventListener('wheel', e => {
      this.dist *= Math.exp(e.deltaY * 0.001);
      e.preventDefault();
    }, { passive: false });
  }

  updatePose(pose16) {
    this.pose = pose16;
    const p = [pose16[3], pose16[7], pose16[11]];
    this.traj.push(p);
    if (this.traj.length > 20000) this.traj.shift();
    if (this.follow)
      for (let k = 0; k < 3; k++)
        this.center[k] = 0.92 * this.center[k] + 0.08 * p[k];
  }

  updateMapPoints(pts) { this.mapPts = pts || []; }
  clear() { this.traj = []; this.mapPts = []; this.pose = null; }

  _project(p) {
    const x = p[0] - this.center[0], y = p[1] - this.center[1],
          z = p[2] - this.center[2];
    const cy = Math.cos(this.yaw), sy = Math.sin(this.yaw);
    const cp = Math.cos(this.pitch), sp = Math.sin(this.pitch);
    const u = cy * x + sy * y;
    const v = -sy * x + cy * y, w = z;
    const v2 = cp * v + sp * w, w2 = -sp * v + cp * w;
    const depth = u + this.dist;
    if (depth < 0.1) return null;
    const f = Math.min(this.canvas.width, this.canvas.height) / depth;
    return [this.canvas.width / 2 + v2 * f,
            this.canvas.height / 2 - w2 * f];
  }

  _line(a, b, color, width) {
    const pa = this._project(a), pb = this._project(b);
    if (!pa || !pb) return;
    const ctx = this.ctx;
    ctx.strokeStyle = color; ctx.lineWidth = width || 1;
    ctx.beginPath(); ctx.moveTo(pa[0], pa[1]);
    ctx.lineTo(pb[0], pb[1]); ctx.stroke();
  }

  render() {
    const ctx = this.ctx, W = this.canvas.width, H = this.canvas.height;
    ctx.fillStyle = '#101014';
    ctx.fillRect(0, 0, W, H);
    for (let i = -5; i <= 5; i++) {
      this._line([i, -5, 0], [i, 5, 0], '#26262c');
      this._line([-5, i, 0], [5, i, 0], '#26262c');
    }
    ctx.fillStyle = '#7fd4ff';
    for (const p of this.mapPts) {
      const s = this._project(p);
      if (s) ctx.fillRect(s[0], s[1], 2, 2);
    }
    for (let i = 1; i < this.traj.length; i++)
      this._line(this.traj[i - 1], this.traj[i], '#ffd060', 1.6);
    if (this.pose) this._drawFrustum();
  }

  /** Camera frustum from the 4x4 pose (renderer.js draws the same). */
  _drawFrustum() {
    const m = this.pose, s = 0.25;
    const o = [m[3], m[7], m[11]];
    const ax = (c) => [m[0] * c[0] + m[1] * c[1] + m[2] * c[2] + m[3],
                       m[4] * c[0] + m[5] * c[1] + m[6] * c[2] + m[7],
                       m[8] * c[0] + m[9] * c[1] + m[10] * c[2] + m[11]];
    const corners = [[-s, -s, 2 * s], [s, -s, 2 * s],
                     [s, s, 2 * s], [-s, s, 2 * s]].map(ax);
    for (const c of corners) this._line(o, c, '#ff5050', 1.5);
    for (let i = 0; i < 4; i++)
      this._line(corners[i], corners[(i + 1) % 4], '#ff5050', 1.5);
  }
}

if (typeof module !== 'undefined') module.exports = { Renderer3D };
