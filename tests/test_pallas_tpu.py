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


def test_pallas_hop_rates_unbiased():
    """Regression for the arithmetic-shift RNG bug (round 2): Mosaic lowers
    ``prng_random_bits >> 8`` as an arithmetic shift, which made the uniform
    u negative for ~half the draws and fired the u < t1 left-hop branch at
    ~50%/step regardless of rates.  With diffusion off and active rate v,
    all-plus particles must drift by ~v·T with no spurious moves."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from hydrolim_tpu.ops.pallas_stepper import (
        meanfield_multi_step,
        pack_particles,
        unpack_particles,
    )

    B, n, L = 2, 2048, 4096
    v, T, dt = 2.0, 2.0, 0.002
    k_steps = int(T / dt)
    rng = np.random.default_rng(3)
    pos = rng.integers(0, L, (B, n))
    sigma = np.ones((B, n), int)              # all plus: m=1, flips ~ e^-20
    wind = np.zeros((B, n), int)
    p, s, w = pack_particles(pos, sigma, wind)
    scal = np.zeros((B, 3), np.float32)
    scal[:, 0] = 20.0                          # beta: freezes spins at m=1
    scal[:, 1] = 0.0                           # no diffusion
    scal[:, 2] = v
    p2, s2, w2 = meanfield_multi_step(
        jax.numpy.asarray(scal), np.array([11, 12], np.int32), p, s, w,
        L=L, k_steps=k_steps, dt=dt, bidirectional=True, n_active=n)
    pos2, _, wind2 = unpack_particles(p2, s2, w2, n)
    disp = (pos2 + wind2 * L) - pos
    # mean displacement v*T = 4 sites, SE = sqrt(v*T/n/B) ~ 0.03
    assert abs(disp.mean() - v * T) < 0.15, disp.mean()
    # no spurious hops: every displacement is a sum of +1 moves
    assert disp.min() >= 0


@pytest.mark.parametrize("r_batch", [1, 4])
def test_pallas_exclusion_kernel_matches_slot_engine(r_batch):
    """Fused exclusion kernel vs the XLA slot engine at matched (K=3,
    local-m, periodic) parameters: ensemble |m|(t) within error bars and
    site-occupancy histograms within 0.05 (the same acceptance as the
    CTMC agreement test).  r_batch=4 exercises the replica-row-batched
    grid (VERDICT r2 #6) against the same acceptance."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        exclusion_multi_step,
        pack_slots,
        unpack_slots,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init, run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import broadcast_params

    L, K, nrep, T, obs_dt, dt = 200, 3, 16, 2.0, 0.5, 1.5e-3
    beta, rd, ra = 1.5, 1.0, 3.0
    config = ParticleConfig(L=L, N=150, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=True,
                            site_capacity=3, active_model="plus_forward")
    params = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                              rate_active=ra, n_runs=nrep)
    frames, slots_x = run_lattice_gas_k(config, params, jax.random.PRNGKey(4),
                                        T=T, obs_dt=obs_dt, dt=dt)
    m_x = np.abs(np.asarray(frames.m_global))
    occ_x = np.abs(np.asarray(slots_x)).sum(-2)

    keys = jax.random.split(jax.random.PRNGKey(5), nrep)
    slots0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
    sl = pack_slots(slots0)
    conv = build_conv_matrix(config)
    scal = np.zeros((nrep, 3), np.float32)
    scal[:, 0], scal[:, 1], scal[:, 2] = beta, rd, ra
    n_sub = int(round(obs_dt / dt))
    M = len(np.arange(0.0, T, obs_dt))
    seeds0 = np.arange(nrep, dtype=np.int32) * 9973 + 17

    def m_of(s):
        return s.sum((1, 2)) / np.maximum(np.abs(s).sum((1, 2)), 1)

    m_p = [m_of(unpack_slots(sl, K, L))]
    for f in range(1, M):
        sl = exclusion_multi_step(jnp.asarray(scal), seeds0 + f, sl, conv,
                                  L=L, K=K, k_steps=n_sub, dt=dt,
                                  periodic=True, bidirectional=False,
                                  use_local_m=True, r_batch=r_batch)
        m_p.append(m_of(unpack_slots(sl, K, L)))
    m_p = np.abs(np.asarray(m_p).T)
    s_final = unpack_slots(sl, K, L)
    assert np.abs(s_final).sum() == nrep * 150          # mass conserved
    occ_p = np.abs(s_final).sum(1)
    assert occ_p.max() <= K

    me, mt = m_x.mean(0), m_p.mean(0)
    se = (m_x.std(0, ddof=1) + m_p.std(0, ddof=1)) / np.sqrt(nrep)
    assert np.all(np.abs(me - mt) < 4 * se + 0.06), (me, mt, se)
    h_x = np.array([(occ_x == v).mean() for v in range(K + 1)])
    h_p = np.array([(occ_p == v).mean() for v in range(K + 1)])
    assert np.all(np.abs(h_x - h_p) < 0.05), (h_x, h_p)


def test_pallas_exclusion_rb_mosaic_matches_interpret():
    """Replica-banked exclusion kernel: Mosaic lowering vs the interpreter
    at INJECTED noise — the compiled (K, R, Lp) program must be bit-equal
    to the interpret=True execution (which the CPU suite has already pinned
    to the XLA slot engine at matched draws).  This isolates exactly the
    Mosaic lowering of the banked layout (leading-axis reductions, sublane
    broadcasts, transposed packing)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        exclusion_multi_step_rb,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, R, k_steps, dt = 128, 3, 8, 20, 2e-3
    Lp = 128
    config = ParticleConfig(L=L, N=120, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=True,
                            site_capacity=K, active_model="bidirectional")
    keys = jax.random.split(jax.random.PRNGKey(3), R)
    slots0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
    sl = pack_slots_rb(slots0)
    conv = build_conv_matrix(config)
    scal = np.zeros((R, 3), np.float32)
    scal[:, 0], scal[:, 1], scal[:, 2] = 1.5, 1.0, 3.0
    rng = np.random.default_rng(12)
    noise = rng.integers(0, 2 ** 32, (1, k_steps, 2, K, R, Lp),
                         dtype=np.uint32)
    kw = dict(L=L, K=K, k_steps=k_steps, dt=dt, periodic=True,
              bidirectional=True, use_local_m=True, r_batch=R,
              noise=jnp.asarray(noise))
    out_hw = exclusion_multi_step_rb(
        jnp.asarray(scal), np.zeros(R, np.int32), sl, conv, **kw)
    out_it = exclusion_multi_step_rb(
        jnp.asarray(scal), np.zeros(R, np.int32), sl, conv,
        interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(out_hw), np.asarray(out_it))


def test_pallas_exclusion_rb_matches_slot_engine():
    """Replica-banked kernel with the HW PRNG vs the XLA slot engine at
    matched (K=3, local-m, periodic) parameters: ensemble |m|(t) within
    error bars and occupancy histograms within 0.05 — the same acceptance
    as the original fused kernel's test, now at 100% sublane occupancy
    (R=16 replicas banked in one grid program)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        exclusion_multi_step_rb,
        pack_slots_rb,
        unpack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init, run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import broadcast_params

    L, K, nrep, T, obs_dt, dt = 200, 3, 16, 2.0, 0.5, 1.5e-3
    beta, rd, ra = 1.5, 1.0, 3.0
    config = ParticleConfig(L=L, N=150, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=True,
                            site_capacity=3, active_model="plus_forward")
    params = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                              rate_active=ra, n_runs=nrep)
    frames, slots_x = run_lattice_gas_k(config, params, jax.random.PRNGKey(4),
                                        T=T, obs_dt=obs_dt, dt=dt)
    m_x = np.abs(np.asarray(frames.m_global))
    occ_x = np.abs(np.asarray(slots_x)).sum(-2)

    keys = jax.random.split(jax.random.PRNGKey(5), nrep)
    slots0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
    sl = pack_slots_rb(slots0)
    conv = build_conv_matrix(config)
    scal = np.zeros((nrep, 3), np.float32)
    scal[:, 0], scal[:, 1], scal[:, 2] = beta, rd, ra
    n_sub = int(round(obs_dt / dt))
    M = len(np.arange(0.0, T, obs_dt))
    seeds0 = np.arange(nrep, dtype=np.int32) * 9973 + 17

    def m_of(s):
        return s.sum((1, 2)) / np.maximum(np.abs(s).sum((1, 2)), 1)

    m_p = [m_of(unpack_slots_rb(sl, K, L))]
    for f in range(1, M):
        sl = exclusion_multi_step_rb(jnp.asarray(scal), seeds0 + f, sl, conv,
                                     L=L, K=K, k_steps=n_sub, dt=dt,
                                     periodic=True, bidirectional=False,
                                     use_local_m=True, r_batch=nrep)
        m_p.append(m_of(unpack_slots_rb(sl, K, L)))
    m_p = np.abs(np.asarray(m_p).T)
    s_final = unpack_slots_rb(sl, K, L)
    assert np.abs(s_final).sum() == nrep * 150          # mass conserved
    occ_p = np.abs(s_final).sum(1)
    assert occ_p.max() <= K

    me, mt = m_x.mean(0), m_p.mean(0)
    se = (m_x.std(0, ddof=1) + m_p.std(0, ddof=1)) / np.sqrt(nrep)
    assert np.all(np.abs(me - mt) < 4 * se + 0.06), (me, mt, se)
    h_x = np.array([(occ_x == v).mean() for v in range(K + 1)])
    h_p = np.array([(occ_p == v).mean() for v in range(K + 1)])
    assert np.all(np.abs(h_x - h_p) < 0.05), (h_x, h_p)


def test_pallas_exclusion_payload_ids_survive():
    """Signed slot payloads (sign = spin, magnitude = particle id) must move
    and compact intact: the id multiset is invariant and every id keeps
    occupying exactly one slot."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        exclusion_multi_step,
        pack_slots,
        unpack_slots,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, B = 256, 3, 4
    config = ParticleConfig(L=L, N=200, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=True,
                            site_capacity=K, active_model="plus_forward")
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    spins0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
    ids = (np.arange(K * L, dtype=np.int32) + 1).reshape(K, L)
    slots0 = spins0 * ids[None]
    id_sets = [set(np.abs(slots0[b])[slots0[b] != 0]) for b in range(B)]

    sl = pack_slots(slots0)
    conv = build_conv_matrix(config)
    scal = np.zeros((B, 3), np.float32)
    scal[:, 0], scal[:, 1], scal[:, 2] = 1.0, 1.0, 3.0
    sl = exclusion_multi_step(jnp.asarray(scal),
                              np.arange(B, dtype=np.int32), sl, conv,
                              L=L, K=K, k_steps=500, dt=2e-3, periodic=True,
                              bidirectional=False, use_local_m=True)
    out = unpack_slots(sl, K, L)
    for b in range(B):
        vals = np.abs(out[b])[out[b] != 0]
        assert len(vals) == 200                    # mass conserved
        assert set(vals) == id_sets[b]             # identity multiset intact
    occ = (out != 0).sum(1)
    assert occ.max() <= K


@pytest.mark.parametrize("fused_engine", ["pallas", "pallas_rb"])
def test_run_exclusion_sweep_pallas_matches_xla(fused_engine):
    """User-facing fused sweep vs the XLA slot engine at the reference
    flagship shape (K=3, non-periodic, local m): ensemble |m|(t) within
    error bars, occupancy histogram within 0.05, and tracer drift
    (displacement-based v) agreeing between engines.  Parametrized over
    both fused layouts (original and replica-banked)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.ensemble import broadcast_params
    from hydrolim_tpu.sweeps.fast_exclusion import run_exclusion_sweep

    config = ParticleConfig(L=200, N=150, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=False,
                            site_capacity=3, active_model="plus_forward")
    nrep, T, obs_dt, dt = 16, 4.0, 0.5, 2e-3
    params = broadcast_params(config, beta=[1.5], rate_diffusion=0.5,
                              rate_active=3.0, n_runs=nrep)

    out = {}
    for eng in (fused_engine, "xla"):
        frames, spins = run_exclusion_sweep(
            config, params, jax.random.PRNGKey(3), T=T, obs_dt=obs_dt,
            dt=dt, engine=eng, n_tracers=64)
        from hydrolim_tpu.particles.lattice_gas import tracer_valid_mask

        tr = np.asarray(frames.tracer_pos, float)
        # mask BOTH endpoints of the displacement: a tag invalidated
        # mid-run would put the TRACER_INVALID sentinel (~-2.1e9) into
        # the drift instead of a NaN (cf. test_golden.py)
        valid = (tracer_valid_mask(frames.tracer_pos[:, :1])
                 & tracer_valid_mask(frames.tracer_pos[:, -1:]))
        drift = np.where(valid, tr[:, -1:] - tr[:, :1], np.nan)
        out[eng] = (np.abs(np.asarray(frames.m_global)),
                    np.abs(spins).sum(1), np.nanmean(drift))

    m_p, occ_p, v_p = out[fused_engine]
    m_x, occ_x, v_x = out["xla"]
    se = (m_p.std(0, ddof=1) + m_x.std(0, ddof=1)) / np.sqrt(nrep)
    assert np.all(np.abs(m_p.mean(0) - m_x.mean(0)) < 4 * se + 0.06), (
        m_p.mean(0), m_x.mean(0))
    h_p = np.array([(occ_p == v).mean() for v in range(4)])
    h_x = np.array([(occ_x == v).mean() for v in range(4)])
    assert np.all(np.abs(h_p - h_x) < 0.05), (h_p, h_x)
    # active plus-forward drift: both positive, same scale
    assert v_p > 0 and v_x > 0
    assert abs(v_p - v_x) < 0.35 * max(v_p, v_x) + 1.0, (v_p, v_x)


def test_run_exclusion_sweep_shardmap_mesh1_bit_identical():
    """VERDICT r2 #5 acceptance: the shard_map replica-axis wrapper on a
    mesh of 1 (the single real TPU) is bit-identical to the unwrapped fused
    kernel — the wrapper adds no collectives and must not perturb the RNG
    stream or any arithmetic."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from jax.sharding import Mesh
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.ensemble import broadcast_params
    from hydrolim_tpu.sweeps.fast_exclusion import run_exclusion_sweep

    config = ParticleConfig(L=128, N=64, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=True,
                            site_capacity=2, active_model="plus_forward")
    params = broadcast_params(config, beta=[0.8, 2.0], rate_diffusion=0.5,
                              rate_active=3.0, n_runs=2)
    kw = dict(T=1.0, obs_dt=0.25, dt=2e-3, engine="pallas", n_tracers=16)
    fa, sa = run_exclusion_sweep(config, params, jax.random.PRNGKey(11),
                                 **kw)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sweep",))
    fb, sb = run_exclusion_sweep(config, params, jax.random.PRNGKey(11),
                                 mesh=mesh, **kw)
    jax.tree.map(np.testing.assert_array_equal, fa, fb)
    np.testing.assert_array_equal(sa, sb)


@pytest.mark.parametrize("sigma", [0.05, 0.1])
def test_pallas_pde_kernel_matches_xla_fields(sigma):
    """Fused IMEX kernel vs the XLA solve: the FIELD dynamics carry no RNG,
    so rho/m_mean/Var series must agree to f32 tolerance (dense vs spectral
    solve); tracer v_eff/D_eff agree statistically.  σ=0.05 exercises the
    rolled 'narrow' smoothing (σ_grid=6.4 → 37 rolls), σ=0.1 the matmul
    'smooth' branch (roll radius 73 > the narrow bound)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import _m_mode, pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    config = PDEConfig(L=128, T=0.4, dt=1e-3, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=sigma,
                       snapshot_interval=100, n_tracers=128,
                       tracer_window_time=0.05)
    assert _m_mode(config) == ("narrow" if sigma == 0.05 else "smooth")
    B = 4
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 1.0, 2.0, 3.0]))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=128))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(7)

    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="pallas")
    want = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                           engine="xla")

    # deterministic field evolution: tight agreement
    np.testing.assert_allclose(np.asarray(got.rho_p),
                               np.asarray(want.rho_p), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.records.m_mean),
                               np.asarray(want.records.m_mean), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.records.var),
                               np.asarray(want.records.var),
                               rtol=5e-3, atol=1e-6)
    assert got.snapshots.shape == want.snapshots.shape
    np.testing.assert_allclose(np.asarray(got.snap_times),
                               np.asarray(want.snap_times), atol=1e-6)

    # spectra (VERDICT r2 #4): the fused path records rfft at snapshot
    # cadence (chunk starts + final state) — those rows must match the XLA
    # per-step record; all other rows are NaN by contract
    fa = np.asarray(got.records.fft_ri)
    fb = np.asarray(want.records.fft_ri)
    snap_steps = np.arange(0, config.nsteps + 1, config.snapshot_interval)
    snap_steps = np.unique(np.append(snap_steps, config.nsteps))
    np.testing.assert_allclose(fa[:, snap_steps], fb[:, snap_steps],
                               rtol=5e-3, atol=5e-5)
    other = np.setdiff1d(np.arange(config.nsteps + 1), snap_steps)
    assert np.all(np.isnan(fa[:, other]))

    # tracer statistics (independent RNG streams): window-mean agreement
    n_iters = config.nsteps + 1
    for name in ("v_eff", "D_eff"):
        a = np.asarray(getattr(got.records, name))[:, :n_iters]
        b = np.asarray(getattr(want.records, name))[:, :n_iters]
        # NaN pattern identical (first `window` steps invalid)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        ma, mb = np.nanmean(a, axis=1), np.nanmean(b, axis=1)
        sd = (np.nanstd(a, axis=1) + np.nanstd(b, axis=1) + 1e-4)
        assert np.all(np.abs(ma - mb) < sd), (name, ma, mb, sd)


def test_pallas_pde_banded_large_L_matches_xla():
    """Large-L fused scope (VERDICT r2 #7): at L=8192 the dense (Lp, Lp)
    solve matrix cannot fit VMEM; the banded in-kernel solve (rolled
    truncated inverse kernel) must match the XLA banded solve's field
    dynamics to f32 tolerance."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import dataclasses

    import jax.numpy as jnp
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import _solve_mode_of, pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    L, gamma, dt = 8192, 0.2, 2e-7
    config = PDEConfig(L=L, T=dt * 200, dt=dt, bc="periodic",
                       gaussian_kernel=False, snapshot_interval=50,
                       n_tracers=64, tracer_window_time=20 * dt, fft_kmax=8,
                       diffusion_solver="banded")
    assert _solve_mode_of(config, gamma)[0] == "banded"
    B = 2
    params_b = PDEParams(gamma=jnp.full(B, gamma), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([1.0, 2.5]))
    ops = build_pde_ops(config, make_pde_params(gamma=gamma, lam=0.6,
                                                beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=64))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(9)
    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="pallas")
    want = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                           engine="xla")
    np.testing.assert_allclose(np.asarray(got.rho_p),
                               np.asarray(want.rho_p), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.records.m_mean),
                               np.asarray(want.records.m_mean), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.records.var),
                               np.asarray(want.records.var),
                               rtol=5e-3, atol=1e-6)


def test_pallas_pde_kernel_edge_shapes():
    """Ragged shapes that stress the padding paths: odd L (pad lanes in
    every roll/solve), tracer count not a lane multiple, a tiny ring
    window, and B=5 with R-padding."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    config = PDEConfig(L=100, T=0.2, dt=1e-3, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=0.02,
                       snapshot_interval=50, n_tracers=50,
                       tracer_window_time=0.037)
    B = 5
    params_b = PDEParams(gamma=jnp.full(B, 0.1), lam=jnp.full(B, 0.6),
                         beta=jnp.linspace(0.2, 2.8, B))
    ops = build_pde_ops(config, make_pde_params(gamma=0.1, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.2, n_tracers=50))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(13)

    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="pallas", keep_snapshots=False)
    want = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                           engine="xla")
    np.testing.assert_allclose(np.asarray(got.rho_p),
                               np.asarray(want.rho_p), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.records.m_mean),
                               np.asarray(want.records.m_mean), atol=2e-3)
    assert got.snapshots.shape[1] == 0          # keep_snapshots=False
    m = np.asarray(got.records.m_mean)
    assert np.isfinite(m[:, :config.nsteps + 1]).all()


@pytest.mark.parametrize("legacy", [False, True])
def test_pallas_pde_anchored_neumann_matches_xla(legacy):
    """The other kernel branch set: anchored_minus reaction/advection order,
    Neumann BC (dense solve + one-sided boundary stencils), global m-mode,
    and the flag-gated legacy double-diffusion quirk."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    config = PDEConfig(L=96, T=0.2, dt=1e-3, bc="neumann",
                       active_model="anchored_minus", gaussian_kernel=True,
                       kernel_sigma=1e6, diffusion_solver="dense",
                       snapshot_interval=50, n_tracers=64,
                       tracer_window_time=0.04, legacy_double_diffusion=legacy)
    B = 3
    params_b = PDEParams(gamma=jnp.full(B, 0.15), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 1.5, 2.5]))
    ops = build_pde_ops(config, make_pde_params(gamma=0.15, lam=0.6,
                                                beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="poisson",
                                             noise=0.1, n_tracers=64))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(11)

    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="pallas")
    want = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                           engine="xla")

    np.testing.assert_allclose(np.asarray(got.rho_p),
                               np.asarray(want.rho_p), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.rho_m),
                               np.asarray(want.rho_m), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.records.m_mean),
                               np.asarray(want.records.m_mean), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.records.var),
                               np.asarray(want.records.var),
                               rtol=5e-3, atol=1e-6)


def test_double_sweep_constants_match_frozen_reference(tmp_path):
    """Full-scale (N, β) double sweep at the reference's own configuration
    reproduces the frozen exclusion constants
    (PARTICLE_solver_BIOLOGY_EXCLUSION_double_sweep.py:549-551; fit
    pipeline :851-961).  TPU-gated for speed (836 replicas × 10 time
    units); measured agreement at seed 0 is 0.05% / 2.9% / 0.3%
    (VALIDATION.md round-3 config audit) — tolerances leave room for
    seed-to-seed wobble at 4 runs per grid point."""
    if not _tpu_is_default():
        pytest.skip("full-scale double sweep needs the TPU slot engine")
    from hydrolim_tpu.sweeps.double_sweep import double_sweep_fused
    from hydrolim_tpu.theory import blocking as bl

    res = double_sweep_fused(
        np.linspace(0, 3, 11), np.linspace(50, 950, 19),
        n_runs_per_beta=4, outdir=str(tmp_path), seed=0,
        plot_result=False, engine="lattice_gas")
    assert abs(res["C0"] - bl.C0) / bl.C0 < 0.02
    assert abs(res["C1"] - bl.C1) / bl.C1 < 0.08
    assert abs(res["C2"] - bl.C2) / bl.C2 < 0.12


def test_pallas_pde_per_step_spectra_match_xla():
    """With fft_kmax <= 62 the fused kernel streams rfft re/im into every
    record row — records.fft_ri must be finite at EVERY step and match the
    XLA per-step record (the sweep drivers' kmax=8 configuration)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import _kmax_rec, pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    config = PDEConfig(L=128, T=0.3, dt=1e-3, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=0.05,
                       snapshot_interval=100, n_tracers=64,
                       tracer_window_time=0.05, fft_kmax=8)
    assert _kmax_rec(config) == 8
    B = 2
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 2.0]))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=64))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(11)
    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="pallas")
    want = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                           engine="xla")
    fa = np.asarray(got.records.fft_ri)
    fb = np.asarray(want.records.fft_ri)
    assert fa.shape == (B, config.nsteps + 1, 8, 2)
    assert np.all(np.isfinite(fa))
    np.testing.assert_allclose(fa, fb, rtol=5e-3, atol=5e-5)


def test_fused_exclusion_ckpt_chunked_matches_straight_tpu(tmp_path):
    """ckpt_dir= on the fused sweep, real HW-PRNG path: per-frame seeds are
    seeds0 + f, so the chunked run's trajectory (slots, tracer sites,
    counts) is bit-identical to the unsplit run; matmul-derived records
    (fft_amp, local m) agree to ~1 ulp (per-chunk record blocks —
    documented run_exclusion_sweep contract)."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.ensemble import broadcast_params
    from hydrolim_tpu.sweeps.fast_exclusion import run_exclusion_sweep

    config = ParticleConfig(L=200, N=150, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=False,
                            site_capacity=3, active_model="plus_forward")
    params = broadcast_params(config, beta=[1.5], rate_diffusion=0.5,
                              rate_active=3.0, n_runs=4)
    kw = dict(T=1.5, obs_dt=0.25, dt=2e-3, engine="pallas", n_tracers=32,
              r_batch=1)
    straight_frames, straight_slots = run_exclusion_sweep(
        config, params, jax.random.PRNGKey(3), **kw)
    ck = tmp_path / "ck"
    partial = run_exclusion_sweep(config, params, jax.random.PRNGKey(3),
                                  ckpt_dir=ck, chunk_frames=2,
                                  stop_after_chunks=1, **kw)
    assert partial is None
    frames, slots = run_exclusion_sweep(config, params, jax.random.PRNGKey(3),
                                        ckpt_dir=ck, chunk_frames=2, **kw)
    for field in straight_frames._fields:
        a = np.asarray(getattr(frames, field))
        b = np.asarray(getattr(straight_frames, field))
        # var joins the ~1-ulp set (r5): the lattice-variance reduction is
        # also lowered per record-block shape, and per-chunk blocks differ
        # from the straight run's _REC_CHUNK blocks (observed 2.2e-7 rel)
        if field in ("fft_amp", "m_local", "var"):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-4,
                                       err_msg=field)
        else:
            np.testing.assert_array_equal(a, b, err_msg=field)
    np.testing.assert_array_equal(np.asarray(slots), straight_slots)


def test_pallas_exclusion_narrow_mosaic_matches_interpret():
    """NARROW smoothing path (round 5): Mosaic lowering of the rolled-taps
    + corner-override smoothing vs the interpreter at injected noise, bit
    equal — the CPU suite already pins interpret-narrow ≡ interpret-dense ≡
    XLA slot engine at matched draws, so this isolates the Mosaic lowering
    of the tap rolls, the (1, 1) weight-slice broadcasts and the corner
    matmul.  Both kernels (plain (R, Kp, Lp) and banked (K, R, Lp))."""
    if not _tpu_is_default():
        pytest.skip("needs a TPU device as default")
    import jax.numpy as jnp
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_narrow_smooth,
        exclusion_multi_step,
        narrow_smooth_radius,
        pack_slots,
    )
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        exclusion_multi_step_rb,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, k_steps, dt = 768, 3, 12, 2e-3
    for periodic in (False, True):
        config = ParticleConfig(
            L=L, N=700, init="fixed", scale_rates=False,
            local_kernel_sigma=0.005, periodic=periodic,
            site_capacity=K, active_model="bidirectional")
        sr = narrow_smooth_radius(config)
        assert sr > 0
        conv = jnp.asarray(build_narrow_smooth(config, sr))
        rng = np.random.default_rng(21)
        for variant, step, pack, R, Kx in (
                ("plain", exclusion_multi_step, pack_slots, 2, 4),
                ("rb", exclusion_multi_step_rb, pack_slots_rb, 8, 3)):
            keys = jax.random.split(jax.random.PRNGKey(5), R)
            sl = pack(np.stack([np.asarray(lgk_init(config, k))
                                for k in keys]))
            scal = np.tile(np.array([[1.2, 0.8, 3.0]], np.float32), (R, 1))
            nshape = ((1, k_steps, 2, Kx, R, 768) if variant == "rb"
                      else (1, k_steps, 2, R, Kx, 768))
            noise = rng.integers(0, 2 ** 32, nshape, dtype=np.uint32)
            kw = dict(L=L, K=K, k_steps=k_steps, dt=dt, periodic=periodic,
                      bidirectional=True, use_local_m=True,
                      smooth_radius=sr, r_batch=R,
                      noise=jnp.asarray(noise))
            out_hw = step(jnp.asarray(scal), np.zeros(R, np.int32), sl,
                          conv, **kw)
            out_it = step(jnp.asarray(scal), np.zeros(R, np.int32), sl,
                          conv, interpret=True, **kw)
            np.testing.assert_array_equal(
                np.asarray(out_hw), np.asarray(out_it),
                err_msg=f"{variant} periodic={periodic}")
