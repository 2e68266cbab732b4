/**
 * Live camera capture -> grayscale frames for the VIO client.
 *
 * Role of the reference's web/js/camera.js (getUserMedia environment
 * camera, portrait pixel normalization, CPU canvas / WebGL grayscale,
 * rVFC timestamps, camera.js:25-529), restructured for the gateway
 * architecture: the frame is downsampled and converted to Y on the client
 * so only w*h bytes cross the network per frame.
 *
 * Grayscale paths:
 *   CPU (default)        — canvas drawImage + getImageData + BT.601 luma.
 *   WebGL (?grayscale=webgl) — luma fragment shader on a hidden WebGL1
 *     canvas + readPixels; on a phone the CPU RGBA->Y loop is the
 *     documented 30 fps bottleneck the reference added this path for.
 *     Falls back to CPU on init failure or context loss.
 *
 * Portrait normalization: the camera sensor is naturally landscape; when
 * the page is portrait the pixels are rotated 90° on the capture canvas
 * (not just CSS) so the VIO camera convention matches the screen — the
 * reference's rotate cw/ccw pixel modes (camera.js:210-256).
 */
'use strict';

const LUMA_VS = [
  'attribute vec2 a_pos;',
  'attribute vec2 a_uv;',
  'varying vec2 v_uv;',
  'void main() {',
  '  v_uv = a_uv;',
  '  gl_Position = vec4(a_pos, 0.0, 1.0);',
  '}',
].join('\n');

// BT.601 luma, matching the CPU path's integer weights (77,150,29)/256.
const LUMA_FS = [
  'precision mediump float;',
  'uniform sampler2D u_tex;',
  'varying vec2 v_uv;',
  'void main() {',
  '  vec3 rgb = texture2D(u_tex, v_uv).rgb;',
  '  float y = dot(rgb, vec3(0.30078125, 0.5859375, 0.11328125));',
  '  gl_FragColor = vec4(y, y, y, 1.0);',
  '}',
].join('\n');

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
    // Portrait pixel rotation ('none' | 'cw'): set at start() from the
    // viewport orientation vs the sensor's landscape native frame.
    this.rotateMode = 'none';
    // WebGL grayscale path, opt-in via ?grayscale=webgl (reference parity).
    this._useWebGL = typeof window !== 'undefined' &&
        new URLSearchParams(window.location.search).get('grayscale') === 'webgl';
    this._gl = null;
    this._glCanvas = null;
    this._glProgram = null;
    this._glTexture = null;
    this._glReadBuffer = null;
    this._glContextLost = false;
    this._grayBuffer = null;
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

    // Portrait detection: sensor frames are landscape; if the page is
    // portrait, rotate the PIXELS 90° cw on the capture canvas so the VIO
    // x-axis convention follows the screen (reference rotate modes).
    const portraitPage = typeof window !== 'undefined' &&
        window.innerHeight > window.innerWidth;
    const landscapeSensor = video.videoWidth >= video.videoHeight;
    this.rotateMode = (portraitPage && landscapeSensor) ? 'cw' : 'none';
    if (this.rotateMode === 'cw') {
      // Swap output dims: portrait target from a landscape sensor.
      const t = this.targetWidth;
      this.targetWidth = Math.min(this.targetWidth, this.targetHeight);
      this.targetHeight = Math.max(t, this.targetHeight);
    }
    this.canvas.width = this.targetWidth;
    this.canvas.height = this.targetHeight;

    if (this._useWebGL) this._initWebGL();

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
    return {
      width: this.targetWidth, height: this.targetHeight,
      rotated: this.rotateMode !== 'none',
      webgl: this._useWebGL,
    };
  }

  _initWebGL() {
    try {
      this._glCanvas = document.createElement('canvas');
      this._glCanvas.width = this.targetWidth;
      this._glCanvas.height = this.targetHeight;
      const gl = this._glCanvas.getContext('webgl', {
        antialias: false, depth: false, stencil: false, alpha: false,
        preserveDrawingBuffer: true,
      });
      if (!gl) throw new Error('no webgl context');
      this._gl = gl;
      this._glCanvas.addEventListener('webglcontextlost', (e) => {
        e.preventDefault();
        this._glContextLost = true;   // captureGray falls back to CPU
      });
      this._glCanvas.addEventListener('webglcontextrestored', () => {
        this._glContextLost = false;
        this._setupGLResources(gl);
      });
      this._setupGLResources(gl);
    } catch (e) {
      this._useWebGL = false;       // CPU fallback
      this._gl = null;
    }
  }

  _setupGLResources(gl) {
    const compile = (type, src) => {
      const s = gl.createShader(type);
      gl.shaderSource(s, src);
      gl.compileShader(s);
      if (!gl.getShaderParameter(s, gl.COMPILE_STATUS))
        throw new Error(gl.getShaderInfoLog(s));
      return s;
    };
    const prog = gl.createProgram();
    gl.attachShader(prog, compile(gl.VERTEX_SHADER, LUMA_VS));
    gl.attachShader(prog, compile(gl.FRAGMENT_SHADER, LUMA_FS));
    gl.linkProgram(prog);
    if (!gl.getProgramParameter(prog, gl.LINK_STATUS))
      throw new Error(gl.getProgramInfoLog(prog));
    this._glProgram = prog;
    gl.useProgram(prog);

    // Fullscreen quad; v flipped so readPixels' bottom-up rows come out
    // top-down without a CPU row flip.
    const verts = new Float32Array([
      -1, -1, 0, 1,   1, -1, 1, 1,   -1, 1, 0, 0,   1, 1, 1, 0,
    ]);
    const buf = gl.createBuffer();
    gl.bindBuffer(gl.ARRAY_BUFFER, buf);
    gl.bufferData(gl.ARRAY_BUFFER, verts, gl.STATIC_DRAW);
    const aPos = gl.getAttribLocation(prog, 'a_pos');
    const aUV = gl.getAttribLocation(prog, 'a_uv');
    gl.enableVertexAttribArray(aPos);
    gl.vertexAttribPointer(aPos, 2, gl.FLOAT, false, 16, 0);
    gl.enableVertexAttribArray(aUV);
    gl.vertexAttribPointer(aUV, 2, gl.FLOAT, false, 16, 8);

    this._glTexture = gl.createTexture();
    gl.bindTexture(gl.TEXTURE_2D, this._glTexture);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.LINEAR);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MAG_FILTER, gl.LINEAR);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
    gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
    gl.viewport(0, 0, this.targetWidth, this.targetHeight);
    this._glReadBuffer =
        new Uint8Array(this.targetWidth * this.targetHeight * 4);
  }

  /** True when the video has advanced to a new frame (dedup by
   * currentTime, app.js processLoop's frame dedup). */
  hasNewFrame() {
    return this.video && this.video.currentTime !== this.lastVideoTime;
  }

  /** Draw the current video frame onto the capture canvas with the
   * landscape center-crop and (in portrait) the 90° cw pixel rotation. */
  _drawToCanvas() {
    const v = this.video;
    const w = this.canvas.width, h = this.canvas.height;
    if (this.rotateMode === 'cw') {
      // Rotate pixels 90° cw: landscape (vw x vh) -> portrait (h x w
      // pre-rotation). Crop the landscape source to the rotated aspect.
      const dstAR = h / w;                  // source-space aspect
      let sx = 0, sy = 0, sw = v.videoWidth, sh = v.videoHeight;
      const srcAR = sw / sh;
      if (srcAR > dstAR) { sw = sh * dstAR; sx = (v.videoWidth - sw) / 2; }
      else { sh = sw / dstAR; sy = (v.videoHeight - sh) / 2; }
      this.ctx.save();
      this.ctx.translate(w, 0);
      this.ctx.rotate(Math.PI / 2);
      // After rotation the draw target is (h x w).
      this.ctx.drawImage(v, sx, sy, sw, sh, 0, 0, h, w);
      this.ctx.restore();
      return;
    }
    // Landscape center-crop to the target aspect, like the reference's
    // 4:3 crop; drawImage performs the box downsample.
    const srcAR = v.videoWidth / v.videoHeight, dstAR = w / h;
    let sx = 0, sy = 0, sw = v.videoWidth, sh = v.videoHeight;
    if (srcAR > dstAR) { sw = sh * dstAR; sx = (v.videoWidth - sw) / 2; }
    else { sh = sw / dstAR; sy = (v.videoHeight - sh) / 2; }
    this.ctx.drawImage(v, sx, sy, sw, sh, 0, 0, w, h);
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
    this._drawToCanvas();

    if (this._useWebGL && this._gl && !this._glContextLost) {
      const gray = this._captureGrayWebGL(w, h);
      if (gray) {
        this.frameCount++;
        return { gray, width: w, height: h, ts };
      }
      // fall through to CPU on any WebGL hiccup
    }

    const rgba = this.ctx.getImageData(0, 0, w, h).data;
    if (!this._grayBuffer || this._grayBuffer.length !== w * h)
      this._grayBuffer = new Uint8Array(w * h);
    const gray = this._grayBuffer;
    // ITU-R BT.601 luma, integer arithmetic.
    for (let i = 0, j = 0; i < gray.length; i++, j += 4)
      gray[i] = (77 * rgba[j] + 150 * rgba[j + 1] + 29 * rgba[j + 2]) >> 8;
    this.frameCount++;
    return { gray, width: w, height: h, ts };
  }

  /** GPU luma: texture from the (already rotated/cropped) capture canvas,
   * shader converts to Y, readPixels, R channel out. */
  _captureGrayWebGL(w, h) {
    const gl = this._gl;
    try {
      gl.bindTexture(gl.TEXTURE_2D, this._glTexture);
      gl.texImage2D(gl.TEXTURE_2D, 0, gl.RGBA, gl.RGBA, gl.UNSIGNED_BYTE,
                    this.canvas);
      gl.useProgram(this._glProgram);
      gl.uniform1i(gl.getUniformLocation(this._glProgram, 'u_tex'), 0);
      gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
      gl.readPixels(0, 0, w, h, gl.RGBA, gl.UNSIGNED_BYTE,
                    this._glReadBuffer);
      if (!this._grayBuffer || this._grayBuffer.length !== w * h)
        this._grayBuffer = new Uint8Array(w * h);
      const gray = this._grayBuffer, rgba = this._glReadBuffer;
      for (let i = 0, j = 0; i < gray.length; i++, j += 4) gray[i] = rgba[j];
      return gray;
    } catch (e) {
      return null;
    }
  }

  stop() {
    if (this.video && this.video.srcObject)
      this.video.srcObject.getTracks().forEach(t => t.stop());
    this.video = null;
  }
}

if (typeof module !== 'undefined') module.exports = { CameraCapture };
