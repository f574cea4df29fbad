"""Theory + fit layers: fixed point, frozen-constant self-consistency
(SURVEY.md §4.3), kinesin fit, f/g meta-fit, cross-engine baselines."""
import numpy as np
import pytest

from hydrolim_tpu.fit import datasets as ds
from hydrolim_tpu.theory import blocking as bl
from hydrolim_tpu.theory.meanfield import D_theory, m_fixed_point, v_theory


def test_fixed_point_values():
    assert m_fixed_point(0.0) == 0.0
    assert m_fixed_point(1.0) == 0.0
    # classic values of the CW magnetization
    assert abs(m_fixed_point(1.5) - 0.8586) < 1e-3
    assert abs(m_fixed_point(2.0) - 0.9575) < 1e-3
    # exact self-consistency
    for b in (1.2, 2.5, 3.0):
        m = m_fixed_point(b)
        assert abs(np.tanh(b * m) - m) < 1e-10


def test_theory_curves_match_frozen_baseline():
    """Theory v/D at λ=0.6, γ=0.2 agree with the frozen particle-sim series
    at large β (BASELINE.md rows 1-2) — the flagship physics cross-check."""
    beta = ds.PLOTFIGS_BETA
    v_th = v_theory(beta, lam=0.6)
    D_th = D_theory(beta, gamma=0.2, lam=0.6)
    # deep ordered phase (β ≥ 1.8): frozen series sits within ~2% of theory
    # (larger finite-size deviations near the β=1 critical point)
    sel = beta >= 1.79
    np.testing.assert_allclose(ds.PARTICLE_V_EFF[sel], v_th[sel], rtol=0.025)
    np.testing.assert_allclose(ds.PARTICLE_D_EFF[sel], D_th[sel], rtol=0.025)


def test_phi_poisson_tail():
    # K=1: P(occ >= 1) with mu = rho -> 1 - exp(-mu)
    rho = 0.5
    assert abs(bl.phi_poisson(rho, 1) - (1 - np.exp(-0.5))) < 1e-12


def test_fg_metafit_reproduces_frozen_constants():
    """Re-fitting the frozen f/g series must reproduce C0/C1/C2
    (SURVEY.md §4.3 self-consistency of fitted constants)."""
    from hydrolim_tpu.viz.cross_engine import plot_f_and_g
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        C0, C1, C2 = plot_f_and_g(outdir=d)
    assert abs(C0 - bl.C0) < 1e-9
    assert abs(C1 - bl.C1) < 1e-9
    assert abs(C2 - bl.C2) < 1e-9


def test_kinesin_fit_beats_tasep_lk(tmp_path):
    from hydrolim_tpu.fit.real_data import fit_kinesin, plot_kinesin_fit

    fit = fit_kinesin()
    assert 1 <= fit["k"] <= 20
    assert np.isfinite(fit["chi2_red"])
    # the mean-field exclusion model fits the kinesin data at least as well
    # as the fixed TASEP-LK curve (the reference's headline comparison)
    assert fit["chi2"] < fit["chi2_tasep_lk"]
    plot_kinesin_fit(fit, str(tmp_path))
    assert (tmp_path / "KinII_fit.png").exists()
    assert (tmp_path / "KinII_residual.png").exists()


def test_cross_engine_figure(tmp_path):
    from hydrolim_tpu.viz.cross_engine import plot_particle_vs_pde

    plot_particle_vs_pde(outdir=str(tmp_path))
    assert (tmp_path / "PDE_v_eff_vs_beta.png").exists()
    assert (tmp_path / "PDE_D_eff_vs_beta.png").exists()


def test_veff_fit_constants_forms():
    # canonical (real-data) form vs sweep form disagree only through the
    # documented ±0.1/±0.01 offsets
    rho, k, lam = 0.5, 1, 0.005
    beta = np.asarray([2.0])
    from hydrolim_tpu.theory.meanfield import compute_m_of_beta_non

    m = compute_m_of_beta_non(beta)
    v_canon = bl.v_eff_fit(rho, k, beta, lam)
    v_sweep = bl.v_eff_fit(rho, k, beta, lam, m, m)
    assert not np.allclose(v_canon, v_sweep)
