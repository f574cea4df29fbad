"""Site-centric lattice-gas engine (K=1): invariants, TASEP current, and
law agreement with the particle-centric engine."""
import numpy as np
import jax
import pytest

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.particles.lattice_gas import run_lattice_gas
from hydrolim_tpu.sweeps.ensemble import broadcast_params, run_particle_ensemble


def _config(**over):
    kw = dict(L=64, N=32, init="fixed", scale_rates=False,
              local_kernel_sigma=0.0, periodic=True, site_capacity=1,
              active_model="plus_forward")
    kw.update(over)
    return ParticleConfig(**kw)


def test_conservation_and_capacity():
    config = _config(L=64, N=40)
    params = broadcast_params(config, beta=[1.0, 2.0], rate_diffusion=1.0,
                              rate_active=2.0, n_runs=2)
    frames, occ = run_lattice_gas(config, params, jax.random.PRNGKey(0),
                                  T=2.0, obs_dt=0.5, dt=5e-3)
    occ = np.asarray(occ)
    assert set(np.unique(occ)) <= {-1, 0, 1}
    # particle number conserved (counts from densities * N * dx = counts)
    n_t = (np.asarray(frames.rho_p) + np.asarray(frames.rho_m)).sum(-1)
    np.testing.assert_allclose(n_t * config.dx, 1.0, rtol=1e-5)
    assert np.abs(occ).sum(-1).tolist() == [40] * 4


def test_tasep_current_lattice_gas():
    """All-plus frozen spins on a ring = TASEP.  The product-Bernoulli(ρ)
    measure is stationary for ring TASEP, so the mobile-pair density must
    give the fundamental-diagram current J = λ·ρ(1−ρ) — a quantitative
    check (the previous `J >= 0` smoke could never fail)."""
    rho, ra, L, T = 0.5, 2.0, 128, 10.0
    config = _config(L=L, N=int(rho * L), init="poisson",
                     flip_rate_fn=lambda s, m, b: 0.0 * s)
    # per-site Poisson intensity with 1−exp(−λ) = ρ → site occupied w.p. ρ,
    # all spins +: exactly the stationary product measure
    lam = float(-np.log1p(-rho)) * np.ones(L)
    params = broadcast_params(config, beta=[0.0], rate_diffusion=0.0,
                              rate_active=ra, n_runs=64)
    frames, occ0 = run_lattice_gas(config, params, jax.random.PRNGKey(1),
                                   T=T, obs_dt=2.0, dt=0.02 / ra,
                                   rho0_plus=lam, rho0_minus=np.zeros(L))
    occ = np.asarray(occ0)
    assert np.all(occ >= 0)                   # all-plus system
    plus = occ == 1
    empty_right = np.roll(occ, -1, axis=-1) == 0
    J = ra * (plus & empty_right).mean()
    # tolerance: O(ra·dt = 2%) parallel-update bias + ~2% SE at 64×128
    # pair samples
    np.testing.assert_allclose(J, ra * rho * (1.0 - rho), rtol=0.10)


def test_matches_particle_engine_m_relaxation():
    """Ensemble ⟨|m|(t)⟩ of the lattice gas matches the particle-centric
    engine at identical (global-m, K=1) parameters."""
    L, N, T, obs_dt, beta = 64, 40, 3.0, 0.5, 1.5
    n_runs = 24
    config = _config(L=L, N=N)
    params = broadcast_params(config, beta=[beta], rate_diffusion=1.0,
                              rate_active=2.0, n_runs=n_runs)
    frames, _ = run_lattice_gas(config, params, jax.random.PRNGKey(2),
                                T=T, obs_dt=obs_dt, dt=2e-3)
    m_lg = np.abs(np.asarray(frames.m_global))  # (B, M)

    config_p = ParticleConfig(L=L, N=N, n_pad=N, init="fixed",
                              scale_rates=False, local_kernel_sigma=0.0,
                              periodic=True, site_capacity=1,
                              active_model="plus_forward")
    params_p = broadcast_params(config_p, beta=[beta], rate_diffusion=1.0,
                                rate_active=2.0, n_runs=n_runs)
    res = jax.device_get(run_particle_ensemble(
        config_p, params_p, jax.random.PRNGKey(3), T=T, obs_dt=obs_dt,
        dt=2e-3, record_pos=False))
    m_pc = np.abs(np.asarray(res.frames.m_global))

    me, mt = m_lg.mean(axis=0), m_pc.mean(axis=0)
    se = (m_lg.std(axis=0, ddof=1) + m_pc.std(axis=0, ddof=1)) \
        / np.sqrt(n_runs)
    assert np.all(np.abs(me - mt) < 4 * se + 0.06), (me, mt, se)


def test_local_kernel_lattice_gas_runs():
    config = _config(L=64, N=40, local_kernel_sigma=0.05)
    params = broadcast_params(config, beta=[2.0], rate_diffusion=0.5,
                              rate_active=1.0)
    frames, _ = run_lattice_gas(config, params, jax.random.PRNGKey(4),
                                T=1.0, obs_dt=0.25, dt=5e-3)
    assert np.all(np.isfinite(np.asarray(frames.m_local)))
    assert np.asarray(frames.fft_amp).shape[-1] == 64


def test_structure_sweep_lattice_gas_engine(tmp_path):
    from hydrolim_tpu.sweeps.local_structure import sweep_betas_for_structures

    res = sweep_betas_for_structures(
        np.array([0.5, 2.0]), 2,
        ps_kwargs=dict(L=64, N=48, periodic=True),
        run_kwargs=dict(T=1.5, obs_dt=0.25), seed=0, keep_outs=True,
        engine="lattice_gas")
    for b, r in res.items():
        assert np.isfinite(r["var_mean"])
        assert r["fft_mean_mean"].shape[0] == 64
        assert 1 <= r["dominant_k_mode"] < 64


def test_tagged_tracers_follow_particles():
    """Tracer invariants: tracers stay on occupied sites, stay distinct, and
    their displacement matches the density COM drift direction."""
    config = _config(L=64, N=24)
    params = broadcast_params(config, beta=[2.0], rate_diffusion=0.5,
                              rate_active=2.0, n_runs=2)
    frames, occ = run_lattice_gas(config, params, jax.random.PRNGKey(5),
                                  T=2.0, obs_dt=0.5, dt=2e-3, n_tracers=8)
    tr = np.asarray(frames.tracer_pos)       # (B, M, T) unwrapped
    occ = np.asarray(occ)                    # (B, L)
    assert tr.shape == (2, 4, 8)
    for b in range(2):
        final_sites = tr[b, -1] % 64
        # distinct and occupied
        assert len(set(final_sites.tolist())) == 8
        assert np.all(occ[b][final_sites] != 0)
