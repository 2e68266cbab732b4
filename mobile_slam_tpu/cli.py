"""Command-line entry point (tiny_vins_mono equivalent,
src/tiny_vins_mono.cpp): load + validate a YAML config, run the dataset
sequence through VIOSystem, print the evaluation.

    python -m mobile_slam_tpu.cli configs/tum_vi_room1.yaml [--cpu]
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m mobile_slam_tpu.cli <config.yaml> "
              "[--cpu] [--frames=N] [--pipelined] [--checkpoint=PATH] "
              "[--checkpoint-every=N] [--resume=PATH]", file=sys.stderr)
        return 2

    import jax

    if "--cpu" in argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from mobile_slam_tpu.config import load_config, validate_config
    from mobile_slam_tpu.engine.vio_system import VIOSystem

    cfg_path = argv[0]
    cfg = load_config(cfg_path)
    problems = validate_config(cfg)
    if problems:
        print(f"invalid config: {problems}", file=sys.stderr)
        return 1
    ckpt_path = resume_path = None
    ckpt_every = 200
    for a in argv:
        if a.startswith("--frames="):
            cfg = cfg.replace(end_frame=int(a.split("=")[1]))
        elif a.startswith("--checkpoint="):
            ckpt_path = a.split("=", 1)[1]
        elif a.startswith("--checkpoint-every="):
            ckpt_every = int(a.split("=")[1])
        elif a.startswith("--resume="):
            resume_path = a.split("=", 1)[1]

    print(f"[cli] dataset: {cfg.dataset_path}", file=sys.stderr)
    print(f"[cli] camera: {cfg.camera.model_type} "
          f"{cfg.camera.width}x{cfg.camera.height} "
          f"focal={cfg.camera.focal_length:.1f}", file=sys.stderr)

    with open(cfg_path) as f:
        blob = f.read()
    system = VIOSystem(cfg, config_blob=blob,
                       pipelined="--pipelined" in argv,
                       checkpoint_path=ckpt_path, checkpoint_every=ckpt_every,
                       resume_path=resume_path)
    s = system.process_sequence()
    print(f"[cli] {s.poses_recovered}/{s.frames_processed} poses, "
          f"{s.fps:.1f} fps, log: {s.log_dir}", file=sys.stderr)
    if s.ate_rmse is not None:
        print(f"[cli] ATE RMSE {s.ate_rmse:.4f} m  median "
              f"{s.ate_median:.4f} m  RPE(1s) {s.rpe_trans_rmse:.4f} m",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
