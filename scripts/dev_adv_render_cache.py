"""Prewarm the adversarial oracle-frame render cache.

The bench ``--adversarial`` phase renders every frame through the
independent OpenCV geometry oracle (eval/adversarial.py), which is
host-side NumPy/cv2 work — ~1 min per 12 s arm — and is the wall-clock
bottleneck of a multiseed curve (5 seeds x 4 levels = 20 arms). The VIO
run itself needs the TPU; the rendering does not. This script renders any
missing arms into the shared cache directory so several instances can run
in parallel on CPU while the chip does other work.

Usage:
    python scripts/dev_adv_render_cache.py --levels=0,1,2,3 \
        --seeds=11,23 --duration=12 --cache=/tmp/adv_cache
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from mobile_slam_tpu.eval import adversarial as adv
from mobile_slam_tpu.eval import simulation as sim


def arg(name, default):
    return next((a.split("=")[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


def main():
    levels = [int(s) for s in arg("levels", "0,1,2,3").split(",")]
    seeds = [int(s) for s in arg("seeds", "11").split(",")]
    duration = float(arg("duration", "12"))
    cache_dir = arg("cache", "/tmp/adv_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cfg = bench.make_cfg()
    t_ic = np.asarray(cfg.camera.t_ic_vec)
    for lvl in levels:
        for seed in seeds:
            cache = os.path.join(
                cache_dir, f"frames_l{lvl}_s{seed}_d{int(duration)}.npz")
            if os.path.exists(cache):
                continue
            # Claim the arm so parallel instances don't duplicate work.
            # A claim left behind by a SIGKILLed renderer would otherwise
            # block the arm forever (ADVICE r4): treat claims older than
            # 1 h as stale and reclaim them.
            claim = cache + ".claim"
            try:
                if (os.path.exists(claim)
                        and time.time() - os.path.getmtime(claim) > 3600):
                    print(f"[render-cache] reclaiming stale claim {claim}",
                          flush=True)
                    os.remove(claim)
            except OSError:
                pass
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
            except FileExistsError:
                print(f"[render-cache] skipping claimed arm l{lvl} s{seed} "
                      f"(claim {claim} held by another instance)", flush=True)
                continue
            try:
                nuis = adv.LEVELS[lvl]
                scfg = sim.SimConfig(
                    duration=duration, cam_rate=20.0, imu_rate=200.0,
                    num_landmarks=900, max_features=150,
                    acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.0,
                    acc_bias=(0.01, -0.005, 0.015),
                    gyr_bias=(0.001, -0.0005, 0.0008), seed=seed,
                )
                data = adv.make_adversarial_data(
                    scfg, cfg.camera, bench.R_IC, t_ic, nuis)
                movers = adv.make_movers(nuis)
                t_r = time.perf_counter()
                frames = [adv.render_frame_adversarial(
                    data, fi, cfg.camera, bench.R_IC, t_ic, nuis, movers)
                    for fi in range(len(data.cam_ts))]
                np.savez_compressed(cache, frames=np.stack(frames))
                print(f"[render-cache] l{lvl} s{seed}: {len(frames)} frames "
                      f"in {time.perf_counter()-t_r:.0f}s -> {cache}",
                      flush=True)
            finally:
                os.remove(claim)


if __name__ == "__main__":
    main()
