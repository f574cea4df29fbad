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
    scal = np.zeros((B, 4), np.float32)
    scal[:, 0] = 2.0    # beta
    scal[:, 1] = 0.5    # rate_diffusion
    scal[:, 2] = 2.0    # rate_active
    scal[:, 3] = np.arange(B)
    p2, s2, w2 = meanfield_multi_step(
        jax.numpy.asarray(scal), p, s, w, L=L, k_steps=800, dt=0.005,
        bidirectional=True, n_active=n)
    pos2, sig2, wind2 = unpack_particles(p2, s2, w2, n)
    assert pos2.min() >= 0 and pos2.max() < L
    assert set(np.unique(sig2)) <= {-1, 1}
    # padding lanes untouched
    assert np.all(np.asarray(s2).reshape(B, -1)[:, n:] == 0)
    # T = 4: ordered phase reached, |m| ≈ m_beta(2) = 0.9575
    m_final = np.abs(sig2.sum(axis=1) / n)
    assert np.all(m_final > 0.85), m_final
