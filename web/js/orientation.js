/**
 * Screen-orientation handling — role of the reference's
 * web/js/orientation.js:24-228: per-orientation camera-from-body extrinsic
 * rotations, a portrait-lock attempt, and a change listener that
 * reconfigures the engine (the gateway rebuilds the engine on configure,
 * so an orientation flip maps to a reconfigure with the new r_ic).
 */
'use strict';

const Orientation = {
  // Camera-from-body rotation (row-major 3x3) per screen orientation, for
  // a phone whose camera looks out of the back. Body frame: X right,
  // Y down-screen, Z forward (see imu.js _toBody).
  R_IC: {
    'portrait-primary':    [1, 0, 0,  0, 1, 0,  0, 0, 1],
    'portrait-secondary':  [-1, 0, 0,  0, -1, 0,  0, 0, 1],
    'landscape-primary':   [0, -1, 0,  1, 0, 0,  0, 0, 1],
    'landscape-secondary': [0, 1, 0,  -1, 0, 0,  0, 0, 1],
  },

  current() {
    return (screen.orientation && screen.orientation.type)
        || 'portrait-primary';
  },

  r_ic() {
    return this.R_IC[this.current()] || this.R_IC['portrait-primary'];
  },

  /** Try to lock portrait (mobile browsers may refuse; that's fine —
   * the change listener handles rotation). */
  async lockPortrait() {
    try {
      if (screen.orientation && screen.orientation.lock)
        await screen.orientation.lock('portrait-primary');
      return true;
    } catch (e) {
      return false;
    }
  },

  /** cb(orientationType, r_ic) on every change. */
  onChange(cb) {
    const fire = () => cb(this.current(), this.r_ic());
    if (screen.orientation && screen.orientation.addEventListener)
      screen.orientation.addEventListener('change', fire);
    else
      window.addEventListener('orientationchange', fire);
  },
};

if (typeof module !== 'undefined') module.exports = { Orientation };
