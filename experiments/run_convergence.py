"""Quantitative hydrodynamic-limit convergence: error(N) ~ N^(-1/2).

The reference validates the micro <-> macro correspondence qualitatively —
cross-engine v_eff/D_eff overlays on the theory curves (plot_figs.py;
reproduced live by experiments/run_cross_engine_validation.py).  This
driver goes one step further and MEASURES the convergence rate of the
particle system to its mean-field PDE: at matched parameters
(lambda = rate_active*dx, gamma = rate_diffusion*dx^2, same lattice) and a
matched inhomogeneous initial profile, the trajectory-wise deviation of
the empirical observables from the deterministic PDE solution is the
CLT fluctuation of N nearly-independent particles, so

    err(N) := ||observable_N - observable_PDE||  ~  C * N^(-1/2)

until it saturates at the micro/macro modeling bias floor (tau-leap dt,
upwind dx).  Two observables: the global magnetization trajectory m(t)
(RMS over the frame grid, per run) and the final total-density profile
(L2 over x, per run).  The driver fits the log-log slope over the
fluctuation-dominated range and asserts it is compatible with -1/2.

Usage: python experiments/run_convergence.py [--small] [--outdir DIR]
"""
import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


LAM, GAMMA, BETA = 0.6, 0.02, 1.5
FRAC_PLUS, DECAY = 0.7, 0.1


def particle_errors(Ns, n_runs, *, L, T, obs_dt, m_pde, rho_pde_final,
                    seed=0):
    """For each ladder point N: run an n_runs ensemble and return per-run
    RMS m(t) errors and final-profile L2 errors vs the PDE solution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.beta_sweep import make_exp_gradient
    from hydrolim_tpu.sweeps.ensemble import (
        broadcast_params,
        ensemble_dt,
        run_particle_ensemble,
    )

    dx = 1.0 / L
    errs_m, errs_rho, m_curves = {}, {}, {}
    for N in Ns:
        t0 = time.time()
        # Poisson totals fluctuate ~sqrt(N): pad generously so the
        # capacity-respecting fill never truncates the draw
        n_pad = int(N + 6 * np.sqrt(N) + 64)
        config = ParticleConfig(L=L, N=N, n_pad=n_pad, init="poisson",
                                scale_rates=False, local_kernel_sigma=0.0,
                                periodic=True, site_capacity=None,
                                active_model="bidirectional")
        params = broadcast_params(config, beta=[BETA],
                                  rate_diffusion=GAMMA * L * L,
                                  rate_active=LAM * L, n_runs=n_runs)
        dt = ensemble_dt(config, beta_max=BETA,
                         rate_diffusion=GAMMA * L * L, rate_active=LAM * L)
        _, _, rho_plus, rho_minus = make_exp_gradient(
            L, N, FRAC_PLUS, DECAY, anchor_positions=None)
        res = run_particle_ensemble(
            config, params, jax.random.PRNGKey(seed + N), T=T, obs_dt=obs_dt,
            dt=dt, rho0_plus=jnp.asarray(rho_plus),
            rho0_minus=jnp.asarray(rho_minus), record_pos=False,
            record_fft=False)
        m_traj = np.asarray(jax.device_get(res.frames.m_global))   # (R, M)
        rho_fin = np.asarray(jax.device_get(res.frames.total[:, -1]))  # (R, L)
        errs_m[N] = np.sqrt(np.mean((m_traj - m_pde[None, :]) ** 2, axis=1))
        errs_rho[N] = np.sqrt(
            dx * np.sum((rho_fin - rho_pde_final[None, :]) ** 2, axis=1))
        m_curves[N] = m_traj.mean(axis=0)
        print(f"# N={N}: dt={dt:.2e}, {time.time()-t0:.1f} s, "
              f"err_m={errs_m[N].mean():.4f}, err_rho={errs_rho[N].mean():.4f}")
    return errs_m, errs_rho, m_curves


def pde_solution(*, L, T, obs_dt):
    """Deterministic PDE at the matched lattice/profile: m(t) on the frame
    grid and the final total-density profile."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydrolim_tpu.core.config import PDEConfig, make_pde_params
    from hydrolim_tpu.pde.stepper import build_pde_ops, pde_step
    from hydrolim_tpu.sweeps.beta_sweep import make_exp_gradient

    dx = 1.0 / L
    # dt divides obs_dt exactly so PDE records land on the particle frames;
    # well inside the upwind CFL bound dx/lam
    sub = max(int(np.ceil(obs_dt / min(2.5e-4, 0.2 * dx / LAM))), 1)
    dt = obs_dt / sub
    n_frames = len(np.arange(0.0, T, obs_dt))
    # gaussian_kernel + the sigma > 1e5 sentinel selects GLOBAL m — matching
    # the particle side's local_kernel_sigma=0.0 (gaussian_kernel=False
    # would be POINTWISE m(x), a different model: on a gradient profile its
    # global relaxation runs ~4x slower than the CW law)
    pcfg = PDEConfig(L=L, T=T, dt=dt, bc="periodic", gaussian_kernel=True,
                     kernel_sigma=2e5, diffusion_solver="auto",
                     snapshot_interval=10 ** 9)
    pparams = make_pde_params(gamma=GAMMA, lam=LAM, beta=BETA)
    ops = build_pde_ops(pcfg, pparams)
    # the exp-gradient mean-count profiles, normalized to densities
    # (counts/(N*dx)) exactly as the particle recorder normalizes
    _, _, rho_plus, rho_minus = make_exp_gradient(
        L, 1.0, FRAC_PLUS, DECAY, anchor_positions=None)
    rp = jnp.asarray(rho_plus / dx, jnp.float32)
    rm = jnp.asarray(rho_minus / dx, jnp.float32)

    @jax.jit
    def frame(carry, _):
        rp, rm = carry
        def body(c, _):
            return pde_step(pcfg, pparams, ops, c[0], c[1]), None
        (rp, rm), _ = jax.lax.scan(body, (rp, rm), None, length=sub)
        m = (jnp.sum(rp) - jnp.sum(rm)) / jnp.maximum(
            jnp.sum(rp) + jnp.sum(rm), 1e-12)
        return (rp, rm), (m, rp + rm)

    m0 = (rp.sum() - rm.sum()) / (rp.sum() + rm.sum())
    (_, _), (m_tail, rho_tail) = jax.lax.scan(
        frame, (rp, rm), None, length=n_frames - 1)
    m_pde = np.concatenate([[float(m0)], np.asarray(m_tail)])
    rho_final = np.asarray(rho_tail[-1])
    return m_pde, rho_final


def fit_slope(Ns, err_mean, err_se):
    """Weighted log-log slope over the fluctuation-dominated range (all
    ladder points whose mean error is > 2x the smallest mean error — the
    saturated tail, if any, is excluded from the rate fit)."""
    import numpy as np

    Ns = np.asarray(Ns, float)
    e = np.asarray(err_mean, float)
    keep = e > 2.0 * e.min()
    keep[np.argmin(e)] = True            # always keep the smallest point
    if keep.sum() < 2:
        keep[:] = True
    k = np.polyfit(np.log(Ns[keep]), np.log(e[keep]), 1)
    return float(k[0]), keep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true", help="quick CPU smoke")
    p.add_argument("--outdir", default="convergence_out")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    import numpy as np

    if a.small:
        L, T, obs_dt, n_runs = 32, 0.5, 0.1, 4
        Ns = [200, 800, 3200]
    else:
        L, T, obs_dt, n_runs = 128, 1.0, 0.05, 8
        Ns = [500, 1000, 2000, 4000, 8000, 16000]

    print("# PDE reference solution ...")
    m_pde, rho_pde_final = pde_solution(L=L, T=T, obs_dt=obs_dt)
    print(f"# m_pde: {m_pde[0]:.3f} -> {m_pde[-1]:.3f}")
    errs_m, errs_rho, m_curves = particle_errors(
        Ns, n_runs, L=L, T=T, obs_dt=obs_dt, m_pde=m_pde,
        rho_pde_final=rho_pde_final, seed=a.seed)

    em = np.array([errs_m[N].mean() for N in Ns])
    em_se = np.array([errs_m[N].std(ddof=1) / np.sqrt(len(errs_m[N]))
                      for N in Ns])
    er = np.array([errs_rho[N].mean() for N in Ns])
    er_se = np.array([errs_rho[N].std(ddof=1) / np.sqrt(len(errs_rho[N]))
                      for N in Ns])
    slope_m, keep_m = fit_slope(Ns, em, em_se)
    slope_r, keep_r = fit_slope(Ns, er, er_se)
    print(f"# slope m(t): {slope_m:.3f}   slope rho(x,T): {slope_r:.3f} "
          f"(CLT: -0.5)")

    # the scientific assertion: both observables converge at the CLT rate
    assert -0.75 < slope_m < -0.25, ("m(t) convergence rate off N^-1/2",
                                     slope_m)
    assert -0.75 < slope_r < -0.25, ("rho(x,T) convergence rate off N^-1/2",
                                     slope_r)

    _os.makedirs(a.outdir, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
    for ax, e, se, slope, keep, label in (
            (axes[0], em, em_se, slope_m, keep_m,
             r"RMS$_t$ $|m_N(t) - m_{PDE}(t)|$"),
            (axes[1], er, er_se, slope_r, keep_r,
             r"$L^2_x$ $|\rho_N(x,T) - \rho_{PDE}(x,T)|$")):
        ax.errorbar(Ns, e, yerr=se, fmt="o", capsize=4, color="navy")
        guide = e[0] * (np.asarray(Ns, float) / Ns[0]) ** -0.5
        ax.loglog(Ns, guide, "--", color="gray", label=r"$N^{-1/2}$")
        ax.set_xlabel("N")
        ax.set_ylabel(label)
        ax.set_title(f"fit slope {slope:.2f}")
        ax.grid(True, which="both", alpha=0.4)
        ax.legend()
    times = np.arange(0.0, T, obs_dt)
    axes[2].plot(times, m_pde, "k-", lw=2, label="PDE")
    for N in (Ns[0], Ns[-1]):
        axes[2].plot(times, m_curves[N], "o--", ms=3,
                     label=f"particle N={N}")
    axes[2].set_xlabel("t")
    axes[2].set_ylabel("m(t)")
    axes[2].grid(True, alpha=0.4)
    axes[2].legend()
    fig.suptitle(rf"Hydrodynamic-limit convergence ($\beta$={BETA}, "
                 rf"$\lambda$={LAM}, $\gamma$={GAMMA}, L={L})")
    fig.tight_layout()
    fig.savefig(_os.path.join(a.outdir, "convergence.png"), dpi=200)

    rec = {"L": L, "T": T, "obs_dt": obs_dt, "n_runs": n_runs, "Ns": Ns,
           "err_m": em.tolist(), "err_m_se": em_se.tolist(),
           "err_rho": er.tolist(), "err_rho_se": er_se.tolist(),
           "slope_m": slope_m, "slope_rho": slope_r,
           "beta": BETA, "lam": LAM, "gamma": GAMMA}
    with open(_os.path.join(a.outdir, "convergence.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"slope_m": round(slope_m, 3),
                      "slope_rho": round(slope_r, 3)}))


if __name__ == "__main__":
    main()
