"""Full operator-story CLI test (VERDICT r3 item 8).

Proves the exact workflow of the reference's entry point
(src/tiny_vins_mono.cpp:9-44): generate an EuRoC-layout dataset on disk,
run `python -m mobile_slam_tpu.cli <config>` as a real subprocess, and
check that a logs/<ts>/ run directory appears with config copy, TUM
trajectory, evaluation (ATE/RPE) and the trajectory/error plots.

Slow tier (RUN_SLOW_TESTS=1): dataset render ~1 min + ~7 s/frame on the
1-core CI host. The driver's bench runs exercise the same path on TPU
every round; this test pins the artifact contract.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("RUN_SLOW_TESTS"),
                    reason="CLI e2e takes ~8 min on 1 core; "
                           "set RUN_SLOW_TESTS=1")
def test_cli_produces_full_run_artifacts(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    ds = tmp_path / "ds"
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_synthetic_dataset.py"),
         "--out", str(ds), "--duration", "8", "--noise"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert gen.returncode == 0, gen.stderr[-2000:]

    with open(os.path.join(REPO, "configs", "tum_vi_room1.yaml")) as f:
        cfg_text = f.read()
    cfg_path = tmp_path / "cfg.yaml"
    cfg_lines = [
        f"dataset_path: {ds}" if line.startswith("dataset_path:") else line
        for line in cfg_text.splitlines()
    ]
    cfg_path.write_text("\n".join(cfg_lines) + "\n")

    # Run from tmp_path so logs/<ts>/ lands in the test sandbox.
    cli = subprocess.run(
        [sys.executable, "-m", "mobile_slam_tpu.cli", str(cfg_path),
         "--cpu", "--frames=70"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=str(tmp_path))
    assert cli.returncode == 0, cli.stderr[-3000:]
    assert "ATE RMSE" in cli.stderr, cli.stderr[-2000:]

    runs = sorted((tmp_path / "logs").iterdir())
    assert runs, "no logs/<ts>/ run directory created"
    run = runs[-1]
    names = {p.name for p in run.iterdir()}
    for required in ("config.yaml", "trajectory_pose.txt",
                     "evaluation.txt", "evaluation.json",
                     "trajectory.png", "error.png"):
        assert required in names, f"missing {required} in {sorted(names)}"
    n_poses = sum(1 for line in open(run / "trajectory_pose.txt")
                  if not line.startswith("#"))
    assert n_poses >= 30, f"only {n_poses} poses recovered"
    ate = dict(
        line.split(": ") for line in
        (run / "evaluation.txt").read_text().strip().splitlines())
    assert float(ate["ate_rmse_m"]) < 0.5, ate


def _read_poses(run_dir):
    out = {}
    for line in open(run_dir / "trajectory_pose.txt"):
        if line.startswith("#") or not line.strip():
            continue
        vals = line.split()
        out[vals[0]] = tuple(vals[1:])
    return out


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("RUN_SLOW_TESTS"),
                    reason="CLI checkpoint/resume e2e is slow; "
                           "set RUN_SLOW_TESTS=1")
def test_cli_checkpoint_resume_matches_uninterrupted(tmp_path):
    """--checkpoint mid-run + --resume must reproduce the uninterrupted
    run's trailing poses exactly (engine/checkpoint.py full snapshot)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    ds = tmp_path / "ds"
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_synthetic_dataset.py"),
         "--out", str(ds), "--duration", "8", "--noise"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert gen.returncode == 0, gen.stderr[-2000:]

    with open(os.path.join(REPO, "configs", "tum_vi_room1.yaml")) as f:
        cfg_text = f.read()
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text("\n".join(
        f"dataset_path: {ds}" if line.startswith("dataset_path:") else line
        for line in cfg_text.splitlines()) + "\n")

    # Uninterrupted reference run over the full range.
    full_dir = tmp_path / "full"
    full_dir.mkdir()
    full = subprocess.run(
        [sys.executable, "-m", "mobile_slam_tpu.cli", str(cfg_path),
         "--cpu", "--frames=70"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=str(full_dir))
    assert full.returncode == 0, full.stderr[-3000:]

    # Interrupted run: stop at frame 40, final checkpoint written at end.
    ckpt = tmp_path / "ckpt.npz"
    part_dir = tmp_path / "partial"
    part_dir.mkdir()
    part = subprocess.run(
        [sys.executable, "-m", "mobile_slam_tpu.cli", str(cfg_path),
         "--cpu", "--frames=40", f"--checkpoint={ckpt}"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=str(part_dir))
    assert part.returncode == 0, part.stderr[-3000:]
    assert ckpt.exists(), part.stderr[-2000:]
    assert "checkpoint ->" in part.stderr

    res_dir = tmp_path / "resumed"
    res_dir.mkdir()
    resumed = subprocess.run(
        [sys.executable, "-m", "mobile_slam_tpu.cli", str(cfg_path),
         "--cpu", "--frames=70", f"--resume={ckpt}"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=str(res_dir))
    assert resumed.returncode == 0, resumed.stderr[-3000:]
    assert "resumed from" in resumed.stderr

    # Every pose the resumed run produces must bit-match the uninterrupted
    # run's pose at the same timestamp (plain Python + XLA:CPU is fully
    # deterministic, so equality is exact, not approximate).
    full_poses = _read_poses(sorted((full_dir / "logs").iterdir())[-1])
    res_poses = _read_poses(sorted((res_dir / "logs").iterdir())[-1])
    assert len(res_poses) >= 10, f"resumed run logged {len(res_poses)} poses"
    overlap = set(full_poses) & set(res_poses)
    assert len(overlap) >= 10
    for ts in overlap:
        assert full_poses[ts] == res_poses[ts], (
            f"pose at t={ts} diverged after resume")
