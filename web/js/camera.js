/**
 * Live camera capture -> grayscale frames for the VIO client.
 *
 * Role of the reference's web/js/camera.js (getUserMedia environment
 * camera, portrait normalization, CPU canvas grayscale, rVFC timestamps,
 * camera.js:25-529), restructured for the gateway architecture: the frame
 * is downsampled and converted to Y on the client so only w*h bytes cross
 * the network per frame.
 */
'use strict';

class CameraCapture {
  constructor(opts) {
    opts = opts || {};
    this.targetWidth = opts.width || 320;
    this.targetHeight = opts.height || 240;
    this.video = null;
    this.canvas = document.createElement('canvas');
    this.ctx = this.canvas.getContext('2d', { willReadFrequently: true });
    this.lastVideoTime = -1;
    this.frameCount = 0;
    this.usingRVFC = false;
    this._rvfcTs = null;
  }

  async start() {
    const stream = await navigator.mediaDevices.getUserMedia({
      video: {
        facingMode: 'environment',
        width: { ideal: 640 }, height: { ideal: 480 },
        frameRate: { ideal: 30 },
      },
      audio: false,
    });
    const video = document.createElement('video');
    video.setAttribute('playsinline', '');  // iOS: no fullscreen takeover
    video.muted = true;
    video.srcObject = stream;
    await video.play();
    this.video = video;
    this.canvas.width = this.targetWidth;
    this.canvas.height = this.targetHeight;

    // Hardware frame timestamps when available (app.js uses
    // requestVideoFrameCallback for exact capture times).
    if ('requestVideoFrameCallback' in video) {
      this.usingRVFC = true;
      const tick = (now, meta) => {
        this._rvfcTs = (meta.mediaTime !== undefined)
            ? meta.mediaTime : now / 1000;
        video.requestVideoFrameCallback(tick);
      };
      video.requestVideoFrameCallback(tick);
    }
    return { width: this.targetWidth, height: this.targetHeight };
  }

  /** True when the video has advanced to a new frame (dedup by
   * currentTime, app.js processLoop's frame dedup). */
  hasNewFrame() {
    return this.video && this.video.currentTime !== this.lastVideoTime;
  }

  /**
   * Capture the current video frame as grayscale.
   * Returns {gray: Uint8Array, width, height, ts} or null.
   */
  captureGray() {
    if (!this.video) return null;
    const v = this.video;
    this.lastVideoTime = v.currentTime;
    const ts = this._rvfcTs !== null ? this._rvfcTs : v.currentTime;
    const w = this.canvas.width, h = this.canvas.height;
    // Landscape center-crop to the target aspect, like the reference's
    // 4:3 crop; drawImage performs the box downsample.
    const srcAR = v.videoWidth / v.videoHeight, dstAR = w / h;
    let sx = 0, sy = 0, sw = v.videoWidth, sh = v.videoHeight;
    if (srcAR > dstAR) { sw = sh * dstAR; sx = (v.videoWidth - sw) / 2; }
    else { sh = sw / dstAR; sy = (v.videoHeight - sh) / 2; }
    this.ctx.drawImage(v, sx, sy, sw, sh, 0, 0, w, h);
    const rgba = this.ctx.getImageData(0, 0, w, h).data;
    const gray = new Uint8Array(w * h);
    // ITU-R BT.601 luma, integer arithmetic.
    for (let i = 0, j = 0; i < gray.length; i++, j += 4)
      gray[i] = (77 * rgba[j] + 150 * rgba[j + 1] + 29 * rgba[j + 2]) >> 8;
    this.frameCount++;
    return { gray, width: w, height: h, ts };
  }

  stop() {
    if (this.video && this.video.srcObject)
      this.video.srcObject.getTracks().forEach(t => t.stop());
    this.video = null;
  }
}

if (typeof module !== 'undefined') module.exports = { CameraCapture };
