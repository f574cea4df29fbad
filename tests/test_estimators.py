"""Estimator unit tests: measurement-window modes, blocking probability,
D_eff displacement slope."""
import numpy as np

from hydrolim_tpu.observables.estimators import (
    blocking_probability,
    compute_v_eff_and_window,
    d_eff_from_positions,
    measurement_window,
)


def _drifting_out(M=40, L=50, v=0.01):
    """Synthetic out-dict: a Gaussian density bump drifting right."""
    times = np.arange(M) * 0.5
    x = np.linspace(0, 1, L)
    total = np.stack([np.exp(-0.5 * ((x - 0.2 - v * t) / 0.05) ** 2)
                      for t in times])
    total /= total.sum(axis=1, keepdims=True) * (x[1] - x[0])
    return {"times_obs": times, "total_list": total}


def test_window_legacy_vs_strict():
    out = _drifting_out(v=0.05)  # bump reaches the boundary
    total = out["total_list"]
    s_leg, e_leg, frac = measurement_window(total, window_mode="legacy")
    s_str, e_str, _ = measurement_window(total, window_mode="strict")
    M = total.shape[0]
    assert s_leg == s_str == int(0.65 * M)
    # legacy collapses to the min window whenever any frame is unsafe
    assert frac.max() > 0.06
    assert e_leg == min(M, s_leg + max(3, int(0.1 * M)))
    # strict ends at the first unsafe frame after start (>= min length)
    assert e_str >= s_str + 3


def test_v_eff_recovers_drift():
    v = 0.004
    out = _drifting_out(M=40, v=v)
    mean_v, v_ts, times, si, ei, _ = compute_v_eff_and_window(out)
    assert abs(mean_v - v) < 0.001  # d<x>/dt of the center of mass


def test_v_eff_xlim_scaling():
    """VERDICT r1 #8: the x grid must come from the config, not a hardcoded
    [0, 1].  The same drifting bump on an xlim=2 domain moves 2x faster in
    physical units, and the boundary-safety window scales with the domain."""
    v = 0.004
    out = _drifting_out(M=40, v=v)   # bump positions in *fractional* units

    class _PS:
        xlim = 2.0

    mean_v, v_ts, times, si, ei, _ = compute_v_eff_and_window(out, _PS())
    assert abs(mean_v - 2.0 * v) < 0.002
    # window indices are identical to the xlim=1 run (pure rescaling)
    m1, _, _, s1, e1, _ = compute_v_eff_and_window(out)
    assert (si, ei) == (s1, e1)
    assert abs(mean_v - 2.0 * m1) < 1e-9


def test_blocking_probability_limits():
    # all forward neighbors full -> p_block = 1
    rho_p = np.ones((5, 10))
    total = np.full((5, 10), 2.0)
    assert float(blocking_probability(rho_p, total, 0, 5)) == 1.0
    # empty neighbors -> 0
    total2 = np.zeros((5, 10))
    assert float(blocking_probability(rho_p, total2, 0, 5)) == 0.0


def test_d_eff_from_positions_ballistic_free():
    """Deterministic spreading: positions fan out linearly, variance grows
    quadratically; the linear fit slope equals the mean variance rate."""
    rng = np.random.default_rng(0)
    n, M = 200, 20
    speeds = rng.normal(0, 1.0, n)
    times = np.arange(M) * 1.0
    pos = np.outer(times, speeds) + 100.0
    alive = np.ones((M, n), bool)
    D = d_eff_from_positions(pos, alive, times, dx=1.0, start_idx=0,
                             end_idx=M)
    assert D > 0
