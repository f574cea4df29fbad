"""CI-time smokes of the (β × σ) phase-diagram drivers: --small runs a
tiny grid on CPU and each driver's own check_physics asserts the ordered /
disordered phases and the mean-field β_c bracket."""
import json
import os
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).parent.parent


def _run(driver, tmp_path, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(ROOT / "experiments" / driver), "--small",
         "--outdir", str(tmp_path), *extra],
        capture_output=True, text=True, timeout=560, env=env, cwd=str(ROOT))
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-2000:])
    return out


def test_run_particle_phase_diagram_small(tmp_path):
    _run("run_particle_phase_diagram.py", tmp_path)
    rec = json.loads((tmp_path / "particle_phase_diagram.json").read_text())
    m = np.asarray(rec["m"])
    assert m.shape == (3, 6)
    # mean-field (global-m) row: disordered at beta=0, ordered at beta=3
    assert m[-1, 0] < 0.3 and m[-1, -1] > 0.7
    assert (tmp_path / "particle_phase_diagram.png").stat().st_size > 10_000
    # all-XLA on the CPU suite (auto falls back off-TPU)
    assert rec["engines_used"] == ["xla"] * 3


def test_crossing_curve_unit():
    sys.path.insert(0, str(ROOT / "experiments"))
    try:
        from run_particle_phase_diagram import crossing_curve
    finally:
        sys.path.pop(0)
    beta = np.array([0.0, 1.0, 2.0, 3.0])
    rows = [[0.0, 0.25, 0.75, 1.0],     # crosses 0.5 midway between 1 and 2
            [0.0, 0.1, 0.2, 0.3],       # never orders -> NaN
            [0.9, 0.9, 0.9, 0.9]]       # already above at beta=0 -> NaN
    c = crossing_curve(beta, rows)
    assert np.isclose(c[0], 1.5)
    assert np.isnan(c[1]) and np.isnan(c[2])
