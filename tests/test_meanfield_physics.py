"""Flagship physics validation (SURVEY.md §4.2, §7.3): the mean-field
(bidirectional, global-m) particle ensemble reproduces the closed-form
hydrodynamic-limit laws

    v_eff(β) = λ·m_β          (m_β = fixed point of tanh(βm))
    D_eff(β) = γ + λ²/(2·cosh³(β·m_β))

within sampling + τ-leap tolerance, and the PDE tracer ensemble agrees.
Small-scale version of the plot_figs.py cross-engine figure.
"""
import numpy as np
import jax
import pytest

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.sweeps.ensemble import (
    broadcast_params,
    ensemble_dt,
    run_particle_ensemble,
)
from hydrolim_tpu.theory.meanfield import m_fixed_point


RD, RA = 0.5, 2.0      # site-unit diffusion and active rates
L, N, T, OBS = 128, 400, 12.0, 0.5


def _run(beta_values, n_runs, seed=0, max_event_prob=0.05):
    config = ParticleConfig(
        L=L, N=N, init="fixed", scale_rates=False, local_kernel_sigma=0.0,
        periodic=True, site_capacity=None, active_model="bidirectional",
        max_event_prob=max_event_prob)
    params = broadcast_params(config, beta=beta_values, rate_diffusion=RD,
                              rate_active=RA, n_runs=n_runs)
    dt = ensemble_dt(config, beta_max=float(np.max(beta_values)),
                     rate_diffusion=RD, rate_active=RA)
    res = run_particle_ensemble(config, params, jax.random.PRNGKey(seed),
                                T=T, obs_dt=OBS, dt=dt)
    return jax.device_get(res)


def _v_and_D(frames, rep):
    """Per-replica v_eff and D_eff from unwrapped positions over the second
    half of the run (steady state)."""
    pos = np.asarray(frames.pos[rep], float)
    times = np.arange(0.0, T, OBS)
    M = len(times)
    s = M // 2
    disp = pos[s:] - pos[s]
    span = times[s:] - times[s]
    v = np.polyfit(span, disp.mean(axis=1), 1)[0]
    var = ((disp - disp.mean(axis=1, keepdims=True)) ** 2).mean(axis=1)
    D = np.polyfit(span, var, 1)[0] / 2.0
    return v, D


def test_v_eff_matches_tanh_law():
    betas = np.array([0.0, 1.5, 2.5])
    n_runs = 3
    res = _run(betas, n_runs)
    v_sim = []
    for b_idx in range(len(betas)):
        # spontaneous symmetry breaking picks a random sign per run — compare
        # |v| per replica, then average
        vs = [abs(_v_and_D(res.frames, b_idx * n_runs + r)[0])
              for r in range(n_runs)]
        v_sim.append(np.mean(vs))
    m_b = np.array([m_fixed_point(b) for b in betas])
    v_th = RA * m_b
    np.testing.assert_allclose(v_sim, v_th, atol=0.15 * RA, rtol=0.12)


def test_D_eff_matches_cosh_law():
    betas = np.array([0.0, 2.5])
    n_runs = 3
    res = _run(betas, n_runs, seed=1)
    D_sim = []
    for b_idx in range(len(betas)):
        Ds = [_v_and_D(res.frames, b_idx * n_runs + r)[1]
              for r in range(n_runs)]
        D_sim.append(np.mean(Ds))
    m_b = np.array([m_fixed_point(b) for b in betas])
    # discrete-lattice law: the continuum γ + λ²/(2cosh³(βm_β)) plus the
    # active-hop shot noise RA/2 (Poisson jump variance, = λ·dx/2 → 0 in the
    # hydrodynamic limit dx→0)
    D_th = RD + RA / 2.0 + RA ** 2 / (2.0 * np.cosh(betas * m_b) ** 3)
    np.testing.assert_allclose(D_sim, D_th, rtol=0.15)


def test_pde_tracer_veff_matches_tanh_law():
    from hydrolim_tpu import IMEXPDE

    lam, gamma, beta = 0.6, 0.05, 2.0
    pde = IMEXPDE(L=128, T=4.0, dt=1e-3, gamma=gamma, lam=lam, beta=beta,
                  bc="periodic", gaussian_kernel=True, kernel_sigma=1e5 - 10,
                  seed=5, snapshot_interval=100)
    pde.initialize("homogeneous", rho0=1.0, noise=0.3, n_tracers=400)
    # bias the initial densities to break the ± symmetry immediately (the
    # spontaneous route takes ~6 time units from noise-level fluctuations)
    pde.rho_p = pde.rho_p * 1.5
    pde.solve()
    out = pde.get_output()
    m_b = m_fixed_point(beta)
    v_th = lam * np.tanh(beta * m_b)
    tail = out["v_eff_series"][-1000:]
    assert abs(abs(np.nanmean(tail)) - v_th) < 0.1 * lam
    D_th = gamma + lam ** 2 / (2.0 * np.cosh(beta * m_b) ** 3)
    D_tail = out["D_eff_series"][-1000:]
    assert abs(np.nanmean(D_tail) - D_th) < 0.5 * D_th
