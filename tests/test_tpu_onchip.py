"""On-chip Pallas parity tier: ``pytest -m tpu``.

VERDICT r3 weak-item 3: the CI suite runs the Pallas kernels only in
interpret mode, so the real Mosaic lowering was untested — a silent
miscompile (lk_pallas.py's own header documents pltpu.roll miscompiling on
non-power-of-2 sizes) would surface as end-to-end drift, not a failure.
This tier executes tests/onchip_parity.py in a SUBPROCESS because
tests/conftest.py pins the in-process backend to CPU; the helper sees the
real device, runs every kernel's Mosaic lowering against the XLA reference
(ops/lk.py) and pins the pack1==pack4 bit-parity claim on silicon.

Skips (not fails) when no TPU is attached, so the tier is safe in the
default CPU suite; on a TPU host `pytest -m tpu` is the gate.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
def test_onchip_kernel_parity():
    env = dict(os.environ)
    # The axon plugin lives outside the repo; keep whatever site the parent
    # had, just make sure the repo itself resolves first.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "onchip_parity.py")],
        capture_output=True, text=True, timeout=1200, env=env)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode == 42:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, "on-chip parity failed (see output above)"


@pytest.mark.tpu
def test_onchip_north_star_perf_gate():
    """The >=200 fps/chip north star (BASELINE.md) as a failing gate:
    runs the real bench image path (chunked scans) on the attached chip
    via tests/onchip_perf_gate.py and fails if the sustained rate dips
    under the bar (VERDICT r4 weak #4: 193-vs-228 run variance straddled
    it with nothing failing)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "onchip_perf_gate.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode == 42:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, "north-star perf gate failed (see output)"
