"""Pallas multi-step kernel — runs only when a TPU is attached (the Mosaic
PRNG has no interpreter implementation, so there is no CPU fallback)."""
import numpy as np
import jax
import pytest


def _tpu_is_default():
    try:
        if jax.config.jax_default_device is not None:
            return jax.config.jax_default_device.platform != "cpu"
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def test_pallas_meanfield_reaches_cw_fixed_point():
    # evaluated lazily: conftest pins the default device to CPU in its
    # session fixture, which runs after collection-time skipif would fire
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default (Mosaic has no CPU "
                    "interpreter for the on-core PRNG)")
    from hydrolim_tpu.ops.pallas_stepper import (
        meanfield_multi_step,
        pack_particles,
        unpack_particles,
    )

    B, n, L = 4, 1000, 64
    rng = np.random.default_rng(0)
    pos = rng.integers(0, L, (B, n))
    sigma = rng.choice([-1, 1], (B, n))
    wind = np.zeros((B, n), int)
    p, s, w = pack_particles(pos, sigma, wind)
    scal = np.zeros((B, 3), np.float32)
    scal[:, 0] = 2.0    # beta
    scal[:, 1] = 0.5    # rate_diffusion
    scal[:, 2] = 2.0    # rate_active
    seeds = np.arange(B, dtype=np.int32)
    p2, s2, w2 = meanfield_multi_step(
        jax.numpy.asarray(scal), seeds, p, s, w, L=L, k_steps=800, dt=0.005,
        bidirectional=True, n_active=n)
    pos2, sig2, wind2 = unpack_particles(p2, s2, w2, n)
    assert pos2.min() >= 0 and pos2.max() < L
    assert set(np.unique(sig2)) <= {-1, 1}
    # padding lanes untouched
    assert np.all(np.asarray(s2).reshape(B, -1)[:, n:] == 0)
    # T = 4: ordered phase reached, |m| ≈ m_beta(2) = 0.9575
    m_final = np.abs(sig2.sum(axis=1) / n)
    assert np.all(m_final > 0.85), m_final


def test_pallas_per_frame_reseed_changes_stream():
    """Regression (ADVICE r1, high): seeds are int32 end-to-end, so a
    ``base + frame`` reseed must change the random stream even for bases
    >= 2**24 (where a float32 seed column absorbed the increment and every
    frame replayed identical movement)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from hydrolim_tpu.ops.pallas_stepper import (
        meanfield_multi_step,
        pack_particles,
        unpack_particles,
    )

    B, n, L = 2, 512, 256
    rng = np.random.default_rng(1)
    pos = rng.integers(0, L, (B, n))
    sigma = rng.choice([-1, 1], (B, n))
    wind = np.zeros((B, n), int)
    p, s, w = pack_particles(pos, sigma, wind)
    scal = np.zeros((B, 3), np.float32)
    scal[:, 0] = 0.5
    scal[:, 1] = 0.5
    scal[:, 2] = 2.0
    base = np.int32(2 ** 26 + 7)   # in the float32-unrepresentable regime
    step = lambda seed_off: unpack_particles(*meanfield_multi_step(
        jax.numpy.asarray(scal),
        np.full(B, base + seed_off, np.int32), p, s, w,
        L=L, k_steps=50, dt=0.005, bidirectional=True, n_active=n), n)

    pos_a, sig_a, _ = step(0)
    pos_a2, sig_a2, _ = step(0)
    pos_b, sig_b, _ = step(1)
    # same seed → identical trajectory (deterministic kernel)
    np.testing.assert_array_equal(pos_a, pos_a2)
    np.testing.assert_array_equal(sig_a, sig_a2)
    # consecutive frame seed → different movement pattern
    assert np.any(pos_a != pos_b) or np.any(sig_a != sig_b)


def test_fast_meanfield_sweep_pallas_engine():
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.ensemble import broadcast_params, ensemble_dt
    from hydrolim_tpu.sweeps.fast_meanfield import run_meanfield_sweep

    config = ParticleConfig(L=64, N=512, n_pad=512, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    params = broadcast_params(config, beta=[0.0, 2.0], rate_diffusion=0.5,
                              rate_active=1.0, n_runs=2)
    dt = ensemble_dt(config, beta_max=2.0, rate_diffusion=0.5,
                     rate_active=1.0)
    fr = run_meanfield_sweep(config, params, jax.random.PRNGKey(0), T=4.0,
                             obs_dt=0.5, dt=dt, engine="pallas")
    assert fr.m_global.shape == (8, 4)
    mass = (fr.rho_p[-1] + fr.rho_m[-1]).sum(axis=-1) / 64
    np.testing.assert_allclose(mass, 1.0, rtol=1e-5)
    # beta=2 replicas order, beta=0 replicas don't
    m_f = np.abs(fr.m_global[-1])
    assert m_f[0] < 0.3 and m_f[1] < 0.3
    assert m_f[2] > 0.7 and m_f[3] > 0.7
