"""Micro ↔ macro hydrodynamic-limit validation — the central scientific
claim (plot_figs.py; SURVEY.md §4.2).

Runs BOTH engines fresh at matched parameters (bidirectional mean-field,
λ=0.6, γ=0.2, global magnetization) across the β grid and overlays their
v_eff/D_eff on the closed-form theory curves, reproducing the reference's
cross-engine figure from live simulations instead of frozen arrays.

Usage: python experiments/run_cross_engine_validation.py [--small]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.sweeps.ensemble import (
    broadcast_params,
    ensemble_dt,
    run_particle_ensemble,
)
from hydrolim_tpu.sweeps.pde_sweeps import pde_beta_sweep
from hydrolim_tpu.theory.meanfield import m_fixed_point


LAM, GAMMA = 0.6, 0.2


def particle_side(beta_values, n_runs, *, L, N, T, obs_dt, seed=0):
    """Mean-field bidirectional particle ensemble in lattice units chosen so
    that λ = rate_active·dx and γ = rate_diffusion·dx² match the PDE:
    with dx = 1/L, rate_active = λ·L and rate_diffusion = γ·L²."""
    ra = LAM * L          # site hops / time
    rd = GAMMA * L * L    # per-direction hop rate
    config = ParticleConfig(L=L, N=N, n_pad=N, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    params = broadcast_params(config, beta=beta_values, rate_diffusion=rd,
                              rate_active=ra, n_runs=n_runs)
    dt = ensemble_dt(config, beta_max=float(np.max(beta_values)),
                     rate_diffusion=rd, rate_active=ra)
    res = jax.device_get(run_particle_ensemble(
        config, params, jax.random.PRNGKey(seed), T=T, obs_dt=obs_dt, dt=dt))
    times = np.arange(0.0, T, obs_dt)
    M = len(times)
    s = M // 2
    dx = 1.0 / L

    v_mean, v_err, D_mean, D_err = [], [], [], []
    for b in range(len(beta_values)):
        vs, Ds = [], []
        for r in range(n_runs):
            pos = np.asarray(res.frames.pos[b * n_runs + r], float) * dx
            disp = pos[s:] - pos[s]
            span = times[s:] - times[s]
            vs.append(abs(np.polyfit(span, disp.mean(axis=1), 1)[0]))
            var = ((disp - disp.mean(axis=1, keepdims=True)) ** 2).mean(axis=1)
            Ds.append(np.polyfit(span, var, 1)[0] / 2.0)
        v_mean.append(np.mean(vs))
        v_err.append(np.std(vs) / np.sqrt(n_runs))
        D_mean.append(np.mean(Ds))
        D_err.append(np.std(Ds) / np.sqrt(n_runs))
    return map(np.asarray, (v_mean, v_err, D_mean, D_err))


def main(small: bool = False, outdir: str = "cross_engine_out"):
    if small:
        beta_values = np.linspace(0, 3, 5)
        L, N, T, obs_dt, n_runs = 128, 2000, 10.0, 0.5, 2
        pde_kw = dict(T=8.0, t_min=5.0, t_max=8.0, L=128, dt=1e-3,
                      n_tracers=300)
    else:
        # particle lattice at L=256: the diffusion hop rate γ·L² sets
        # dt ∝ 1/L², and the lattice shot-noise correction λ/(2L) ≈ 1% of D —
        # fine enough to exhibit the hydrodynamic limit at tractable cost
        beta_values = np.linspace(0, 3, 11)
        L, N, T, obs_dt, n_runs = 256, 5000, 30.0, 0.5, 3
        pde_kw = dict(T=40.0, t_min=20.0, t_max=40.0, L=1000, dt=5e-4,
                      n_tracers=1000)

    print("particle side ...")
    v_p, ve_p, D_p, De_p = particle_side(beta_values, n_runs, L=L, N=N, T=T,
                                         obs_dt=obs_dt)
    print("pde side ...")
    pde = pde_beta_sweep(beta_values, n_runs=n_runs, gamma=GAMMA, lam=LAM,
                         outdir=outdir, plot_result=False, **pde_kw)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from pathlib import Path

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    beta_dense = np.linspace(0, 3, 400)
    m_d = np.array([m_fixed_point(b) for b in beta_dense])
    v_th = LAM * np.tanh(beta_dense * m_d)
    D_th = GAMMA + LAM ** 2 / (2 * np.cosh(beta_dense * m_d) ** 3)
    # lattice shot-noise correction for the particle D (λ·dx/2, → 0 as L→∞)
    D_lattice = LAM / L / 2.0

    for p_series, p_err, s_series, s_err, th, ylabel, fname in (
            (v_p, ve_p, pde["v_mean"], pde["v_err"], v_th,
             r"$v_{\mathrm{eff}}$", "cross_v_eff_vs_beta.png"),
            (D_p - D_lattice, De_p, pde["D_mean"], pde["D_err"], D_th,
             r"$D_{\mathrm{eff}}$", "cross_D_eff_vs_beta.png")):
        plt.figure(figsize=(6, 4))
        plt.errorbar(beta_values, p_series, yerr=p_err, fmt="o", capsize=4,
                     label="Particle Sim")
        plt.errorbar(beta_values, s_series, yerr=s_err, fmt="o", capsize=4,
                     label="PDE Sim", color="lightblue")
        plt.plot(beta_dense, th, "--", color="navy", label="theory")
        plt.xlabel(r"$\beta$")
        plt.ylabel(ylabel)
        plt.legend()
        plt.grid()
        plt.tight_layout()
        plt.savefig(out / fname, dpi=200)
        plt.close()

    m_b = np.array([m_fixed_point(b) for b in beta_values])
    v_theory_pts = LAM * np.tanh(beta_values * m_b)
    err = np.abs(v_p - v_theory_pts)
    print("beta:", beta_values)
    print("particle v:", np.round(v_p, 4))
    print("pde v     :", np.round(pde["v_mean"], 4))
    print("theory v  :", np.round(v_theory_pts, 4))
    print(f"max |particle - theory| deviation: {err.max():.4f}")
    return dict(beta=beta_values, v_particle=v_p, v_pde=pde["v_mean"],
                v_theory=v_theory_pts)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    p.add_argument("--outdir", default="cross_engine_out")
    a = p.parse_args()
    main(a.small, a.outdir)
