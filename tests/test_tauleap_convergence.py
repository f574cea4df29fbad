"""τ-leap Δt-convergence: halving the step must not shift the observables
beyond ensemble error (SURVEY.md §7.4 — Δt bias below the 1% budget)."""
import numpy as np
import jax

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.sweeps.ensemble import broadcast_params, run_particle_ensemble


def _mean_abs_m(dt, n_runs=16, seed=0):
    config = ParticleConfig(L=64, N=256, n_pad=256, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    params = broadcast_params(config, beta=[2.0], rate_diffusion=0.5,
                              rate_active=1.0, n_runs=n_runs)
    res = run_particle_ensemble(config, params, jax.random.PRNGKey(seed),
                                T=4.0, obs_dt=0.5, dt=dt, record_pos=False)
    m = np.abs(np.asarray(res.frames.m_global))   # (runs, frames)
    return m.mean(axis=0), m.std(axis=0, ddof=1) / np.sqrt(n_runs)


def test_dt_halving_within_ensemble_error():
    m_coarse, se_c = _mean_abs_m(dt=8e-3)
    m_fine, se_f = _mean_abs_m(dt=2e-3, seed=1)
    tol = 4.0 * np.hypot(se_c, se_f) + 0.03
    assert np.all(np.abs(m_coarse - m_fine) < tol), (m_coarse, m_fine, tol)
    # both converge to the CW fixed point
    assert abs(m_fine[-1] - 0.9575) < 0.05


def test_dt_halving_slot_engine_k3():
    """Δt-convergence of the K=3 slot engine under exclusion pressure: the
    observables (|m|(t), blocking probability) at dt and dt/4 agree within
    ensemble error — the τ-leap bias is below the error budget at the
    production step sizes."""
    from hydrolim_tpu.observables.batched import batched_estimates
    from hydrolim_tpu.particles.lattice_gas_k import run_lattice_gas_k

    def run(dt, seed, n_runs=16):
        config = ParticleConfig(L=64, N=96, init="fixed", scale_rates=False,
                                local_kernel_sigma=0.0, periodic=True,
                                site_capacity=3,
                                active_model="plus_forward")
        params = broadcast_params(config, beta=[1.5], rate_diffusion=1.0,
                                  rate_active=3.0, n_runs=n_runs)
        frames, _ = run_lattice_gas_k(config, params,
                                      jax.random.PRNGKey(seed), T=3.0,
                                      obs_dt=0.5, dt=dt)
        m = np.abs(np.asarray(frames.m_global))
        times = np.arange(0.0, 3.0, 0.5)
        est = jax.device_get(batched_estimates(
            frames.total, frames.m_global, frames.rho_p, times,
            dx=config.dx, xlim=1.0, has_positions=False))
        return (m.mean(0), m.std(0, ddof=1) / 4.0,
                float(np.mean(est.p_block)),
                float(np.std(np.asarray(est.p_block), ddof=1) / 4.0))

    m_c, se_c, pb_c, pb_se_c = run(dt=4e-3, seed=0)
    m_f, se_f, pb_f, pb_se_f = run(dt=1e-3, seed=1)
    tol = 4.0 * np.hypot(se_c, se_f) + 0.04
    assert np.all(np.abs(m_c - m_f) < tol), (m_c, m_f, tol)
    assert abs(pb_c - pb_f) < 4.0 * np.hypot(pb_se_c, pb_se_f) + 0.02, (
        pb_c, pb_f)
