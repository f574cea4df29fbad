"""Exclusion-physics validation of the synchronous conflict resolution
(SURVEY.md §7.4): stationary statistics must match sequential-update
exclusion processes.

TASEP fundamental diagram: all-plus frozen spins hopping right on a ring at
rate λ with K=1 exclusion have stationary tracer velocity v = λ·(1−ρ) (the
reference's v_pred_TASEP benchmark law, `..._sweep_beta.py:296-298`).
"""
import numpy as np
import jax
import pytest

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.sweeps.ensemble import broadcast_params, run_particle_ensemble


def _tasep_velocity(rho: float, ra: float = 2.0, L: int = 128,
                    T: float = 30.0, seed: int = 0, n_runs: int = 2):
    n_buf = L  # upper bound on poisson-drawn particle count at K=1
    config = ParticleConfig(
        L=L, N=n_buf, n_pad=n_buf, init="poisson", scale_rates=False,
        local_kernel_sigma=0.0, periodic=True, site_capacity=1,
        active_model="plus_forward",
        # frozen spins: no flips, pure TASEP dynamics
        flip_rate_fn=lambda s, m, b: 0.0 * s,
        max_event_prob=0.05)
    params = broadcast_params(config, beta=[0.0], rate_diffusion=0.0,
                              rate_active=ra, n_runs=n_runs)
    dt = config.max_event_prob / ra
    # all-plus occupancy: per-site Poisson(μ) truncated to K=1 ⇒ site
    # occupied w.p. 1−exp(−μ); choose μ to hit the target density
    mu = -np.log(1.0 - rho)
    rho0_plus = np.full(L, mu, np.float32)
    rho0_minus = np.zeros(L, np.float32)
    res = jax.device_get(run_particle_ensemble(
        config, params, jax.random.PRNGKey(seed), T=T, obs_dt=1.0, dt=dt,
        rho0_plus=rho0_plus, rho0_minus=rho0_minus))
    times = np.arange(0.0, T, 1.0)
    s = len(times) // 2
    vs, rhos = [], []
    for r in range(n_runs):
        alive = np.asarray(res.frames.alive[r][0])
        pos = np.asarray(res.frames.pos[r], float)[:, alive]
        rho_real = alive.sum() / L
        disp = pos[s:] - pos[s]
        span = times[s:] - times[s]
        vs.append(np.polyfit(span, disp.mean(axis=1), 1)[0])
        rhos.append(rho_real)
    return np.mean(vs), np.mean(rhos)


@pytest.mark.parametrize("rho", [0.25, 0.5, 0.75])
def test_tasep_fundamental_diagram(rho):
    ra = 2.0
    v, rho_real = _tasep_velocity(rho, ra)
    v_expected = ra * (1.0 - rho_real)
    assert abs(v - v_expected) < 0.12 * ra, (v, v_expected, rho_real)
