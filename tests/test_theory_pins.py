"""Numeric pins for the previously-untested tail of the theory/parallel
surface: the D_eff prediction family and v_pred_block against
independently transcribed reference formulas (the canonical v1 copy,
PARTICLE_solver_BIOLOGY_EXCLUSION_sweep_beta.py:528-560 / :309-311), and
ParticleState mesh placement."""
import jax
import numpy as np
import pytest

from hydrolim_tpu.theory import blocking as B
from hydrolim_tpu.theory.meanfield import (
    compute_m_of_beta,
    compute_m_of_beta_non,
)

BETA = np.linspace(0.1, 3.0, 7)
GAM, LAM, RHO, K = 0.1, 0.5, 0.5, 3.0


def test_d_eff_family_matches_reference_forms():
    m = compute_m_of_beta(BETA)
    m_non = compute_m_of_beta_non(BETA)
    ch, sh = np.cosh(BETA * m_non), np.sinh(BETA * m_non)
    x = RHO / K
    # independent transcription of the reference-v1 formulas
    oracle = {
        "D_eff_global": GAM + LAM ** 2 / np.cosh(BETA * m) ** 3,
        "D_eff_local": (GAM + LAM ** 2) * np.ones_like(BETA),
        "D_eff_theory": GAM + LAM ** 2 * (1 - x) / ch ** 3,
        "D_eff_theory_2": GAM + LAM ** 2 * (1 - x) * abs(1 - x) / ch ** 3,
        "D_eff_theory_3": (GAM + LAM ** 2 * (1 - x) * np.abs(1 - 2 * x) / ch
                           - LAM ** 2 * (1 - x) ** 2 * sh ** 2 / ch ** 3),
        "D_eff_theory_4": GAM + LAM ** 2 * (1 - x) / ch * (
            np.abs(1 - 2 * x) + x / ch ** 2),
    }
    for name, want in oracle.items():
        got = getattr(B, name)(BETA, m, GAM, LAM) if "glob" in name or \
            "local" in name else getattr(B, name)(BETA, m, GAM, LAM, m_non,
                                                  RHO, K)
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=name)


def test_fit_d_eff_composite_pin():
    m = compute_m_of_beta(BETA)
    f = RHO / K * (B.C0 - B.C1 * RHO / K
                   + B.C2 / ((RHO / K) ** 1.5 * np.cosh(BETA * m)))
    want = GAM + LAM ** 2 / np.cosh(BETA * m) ** 3 * (1 - f) ** 2 * \
        (2.5 / np.cosh(BETA * m))
    np.testing.assert_allclose(B.fit_D_eff(BETA, m, RHO, K, GAM, LAM), want,
                               rtol=1e-12)


def test_v_pred_block_pin():
    m = compute_m_of_beta(BETA)
    m_non = compute_m_of_beta_non(BETA, RHO, K, LAM)
    want = LAM * 0.5 * (1 + m) * (
        1 - RHO / K * (1.37 + 4.0 / np.cosh(BETA * m_non)))
    np.testing.assert_allclose(B.v_pred_block(LAM, m, BETA, RHO, K), want,
                               rtol=1e-12)


def _cpu_count():
    try:
        return len(jax.devices("cpu"))
    except RuntimeError:
        return 0


@pytest.mark.skipif(_cpu_count() < 8, reason="needs 8 virtual CPU devices")
def test_shard_particle_state_placement():
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.parallel.mesh import make_mesh, shard_particle_state
    from hydrolim_tpu.particles.init import init_particles

    config = ParticleConfig(L=32, N=64, n_pad=64, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.vmap(lambda k: init_particles(config, k))(keys)
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    sharded = jax.device_get(shard_particle_state(mesh, state))
    # placement must never change values
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(sharded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the (B, n_pad) buffers split over both axes; per-replica scalars
    # only over 'sweep'
    resharded = shard_particle_state(mesh, state)
    pos_spec = resharded.pos.sharding.spec
    assert tuple(pos_spec) == (mesh.axis_names[0], mesh.axis_names[1])
    # unbatched: buffer axis over 'part'
    single = init_particles(config, jax.random.PRNGKey(1))
    s1 = shard_particle_state(mesh, single, batched=False)
    assert tuple(s1.pos.sharding.spec) == (mesh.axis_names[1],)
