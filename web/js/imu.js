/**
 * IMU capture -> calibrated, body-frame samples for the VIO client.
 *
 * Role of the reference's web/js/imu.js (dual-path Generic Sensor /
 * DeviceMotionEvent capture with iOS permission flow, stationary gyro-bias
 * calibration, ring buffer + flush, imu.js:129-420) and of app.js's
 * W3C-device -> VIO-body axis transform (+90 deg about X so gravity reads
 * +Z when the phone faces forward, app.js:905-978).
 */
'use strict';

class IMUCapture {
  constructor() {
    this.buffer = [];           // [ts, ax, ay, az, gx, gy, gz] (body frame)
    this.maxBuffer = 1024;      // ring semantics (vio-worker.js:72-97)
    this.gyroBias = [0, 0, 0];
    this.calibrated = false;
    this.rateEstimate = 0;
    this._lastTs = 0;
    this._calibSamples = [];
    this._calibUntil = 0;
    this._mode = null;
  }

  /** iOS 13+ requires a user-gesture permission request. */
  static async requestPermission() {
    if (typeof DeviceMotionEvent !== 'undefined' &&
        typeof DeviceMotionEvent.requestPermission === 'function') {
      const r = await DeviceMotionEvent.requestPermission();
      if (r !== 'granted') throw new Error('motion permission denied');
    }
  }

  async start() {
    // Generic Sensor API preferred (separate accel/gyro at native rate);
    // DeviceMotionEvent is the universal fallback.
    if (typeof Gyroscope === 'function' &&
        typeof Accelerometer === 'function') {
      try {
        await this._startGenericSensors();
        this._mode = 'generic-sensor';
        return this._mode;
      } catch (e) { /* permissions policy may block; fall through */ }
    }
    this._startDeviceMotion();
    this._mode = 'devicemotion';
    return this._mode;
  }

  async _startGenericSensors() {
    const freq = 100;
    const acc = new Accelerometer({ frequency: freq });
    const gyr = new Gyroscope({ frequency: freq });
    let lastAcc = null;
    acc.addEventListener('reading', () => {
      lastAcc = [acc.x, acc.y, acc.z];
    });
    gyr.addEventListener('reading', () => {
      if (!lastAcc) return;
      const ts = (gyr.timestamp || performance.now()) / 1000;
      this._push(ts, lastAcc, [gyr.x, gyr.y, gyr.z]);
    });
    acc.start(); gyr.start();
    this._sensors = [acc, gyr];
  }

  _startDeviceMotion() {
    this._dmHandler = (e) => {
      const a = e.accelerationIncludingGravity;
      const r = e.rotationRate;
      if (!a || a.x === null) return;
      const ts = e.timeStamp / 1000;
      // rotationRate is deg/s in DeviceMotionEvent.
      const d2r = Math.PI / 180;
      this._push(ts, [a.x, a.y, a.z],
                 r && r.alpha !== null
                     ? [r.alpha * d2r, r.beta * d2r, r.gamma * d2r]
                     : [0, 0, 0]);
    };
    window.addEventListener('devicemotion', this._dmHandler);
  }

  /**
   * W3C device frame: X right, Y up (screen), Z out of the screen.
   * VIO body frame (phone held portrait, camera facing forward): X right,
   * Y down the screen, Z forward — a +90 deg rotation about X:
   *   x_b = x_d,  y_b = -z_d,  z_b = y_d
   * Gravity while upright then reads ~+9.8 on y_b... the reference
   * validates the gravity axis after transform (app.js:938-961); here the
   * same check runs in calibrate().
   */
  _toBody(v) { return [v[0], -v[2], v[1]]; }

  _push(ts, accDev, gyrDev) {
    if (ts <= this._lastTs) return;                  // dedup/monotone
    if (this._lastTs > 0)
      this.rateEstimate = 0.95 * this.rateEstimate
          + 0.05 * (1 / (ts - this._lastTs));
    this._lastTs = ts;
    const acc = this._toBody(accDev);
    const gyrRaw = this._toBody(gyrDev);
    if (this._calibUntil && ts < this._calibUntil) {
      this._calibSamples.push(gyrRaw);
      return;
    }
    if (this._calibUntil && this._calibSamples.length) {
      const n = this._calibSamples.length;
      this.gyroBias = [0, 1, 2].map(
          k => this._calibSamples.reduce((s, g) => s + g[k], 0) / n);
      this._calibSamples = [];
      this._calibUntil = 0;
      this.calibrated = true;
    }
    const gyr = [gyrRaw[0] - this.gyroBias[0],
                 gyrRaw[1] - this.gyroBias[1],
                 gyrRaw[2] - this.gyroBias[2]];
    this.buffer.push([ts, acc[0], acc[1], acc[2], gyr[0], gyr[1], gyr[2]]);
    if (this.buffer.length > this.maxBuffer) this.buffer.shift();
  }

  /** Hold the device still for `seconds` to estimate the gyro bias
   * (reference: imu.js calibrate(), :173). */
  calibrate(seconds) {
    this._calibUntil = this._lastTs + (seconds || 1.5);
    this.calibrated = false;
  }

  /** Drain buffered samples (sent as one binary batch). */
  flush() {
    const out = this.buffer;
    this.buffer = [];
    return out;
  }

  /** Mean |acc| over the buffer — gravity sanity check. */
  gravityEstimate() {
    if (!this.buffer.length) return 0;
    let s = 0;
    for (const b of this.buffer)
      s += Math.hypot(b[1], b[2], b[3]);
    return s / this.buffer.length;
  }

  stop() {
    if (this._sensors) this._sensors.forEach(s => s.stop());
    if (this._dmHandler)
      window.removeEventListener('devicemotion', this._dmHandler);
  }
}

if (typeof module !== 'undefined') module.exports = { IMUCapture };
