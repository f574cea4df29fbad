"""CPU-exercisable validation of the fused Pallas kernel logic (VERDICT r3
#3).

``pltpu.prng_*`` has no interpreter lowering, so the Mosaic kernels could
previously only be validated on a live TPU (the 17-skip blind spot).  Each
kernel now accepts pre-drawn random bits (``noise=``) consumed instead of
the on-core PRNG; with that, the ENTIRE kernel body — thresholds, admission,
compaction, tracer SDE, ring buffer, record rows — runs under
``interpret=True`` in the default CPU suite, and the XLA engines accept the
same draws through their injection hooks, so the two implementations are
compared at MATCHED randomness rather than statistically.  What remains
TPU-only is exactly the Mosaic lowering + the hardware PRNG
(tests/test_pallas_tpu.py).

All tests run on fixed seeds: the comparisons are exact (integer state) or
deterministic, not flaky-statistical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrolim_tpu.core.config import ParticleConfig, PDEConfig, make_particle_params, make_pde_params

_MASK24 = np.uint32(0x00FFFFFF)


def _bits_to_u(bits):
    """The kernels' bits→uniform map (low-24-bit mask; exact in f32)."""
    return (np.asarray(bits, np.uint32) & _MASK24).astype(np.float32) * \
        np.float32(2.0 ** -24)


# ---------------------------------------------------------------------------
# mean-field kernel (ops/pallas_stepper.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bidirectional", [True, False])
def test_meanfield_kernel_interpret_matches_xla_engine(bidirectional):
    """Fused mean-field kernel under interpret=True vs the XLA fast path
    (_step_meanfield_global) at matched uniforms: pos/σ/wind must be EQUAL
    after every step — same thresholds, same wrap, same winding number."""
    from hydrolim_tpu.ops.pallas_stepper import (
        meanfield_multi_step,
        pack_particles,
        unpack_particles,
    )
    from hydrolim_tpu.particles.init import init_particles
    from hydrolim_tpu.particles.stepper import (
        _is_meanfield_fast_path,
        _step_meanfield_global,
    )

    L, N, k_steps, dt = 64, 96, 48, 2e-3
    model = "bidirectional" if bidirectional else "plus_forward"
    config = ParticleConfig(L=L, N=N, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.0, periodic=True,
                            site_capacity=None, active_model=model)
    assert _is_meanfield_fast_path(config)
    params = make_particle_params(config, beta=1.2, rate_diffusion=0.5,
                                  rate_active=2.0)

    state = init_particles(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2 ** 32, size=(1, k_steps, 1, 128),
                        dtype=np.uint32)
    u_all = _bits_to_u(bits)                     # (1, k_steps, 1, 128)

    # XLA engine, one eager step at a time with the kernel's uniforms
    st = state
    for s in range(k_steps):
        st = _step_meanfield_global(
            config, params, st, dt,
            u_override=jnp.asarray(u_all[0, s, 0, :N]))

    # fused kernel, the whole chain in one interpret=True invocation
    pos0 = np.asarray(state.pos)[None]
    sig0 = np.asarray(state.sigma)[None]
    wnd0 = np.asarray(state.wind)[None]
    p, sg, w = pack_particles(pos0, sig0, wnd0)
    scal = np.array([[1.2, 0.5, 2.0]], np.float32)
    p2, s2, w2 = meanfield_multi_step(
        jnp.asarray(scal), jnp.zeros((1,), jnp.int32), p, sg, w,
        L=L, k_steps=k_steps, dt=dt, bidirectional=bidirectional,
        n_active=N, interpret=True, noise=jnp.asarray(bits))
    pos_k, sig_k, wnd_k = unpack_particles(p2, s2, w2, N)

    np.testing.assert_array_equal(pos_k[0], np.asarray(st.pos))
    np.testing.assert_array_equal(sig_k[0], np.asarray(st.sigma))
    np.testing.assert_array_equal(wnd_k[0], np.asarray(st.wind))
    # and the dynamics actually did something
    assert (pos_k[0] != pos0[0]).any() and (sig_k[0] != sig0[0]).any()


def test_meanfield_kernel_padding_lanes_inert():
    """σ=0 padding lanes must not contribute to m: a replica padded
    128−N lanes and an exactly-full one evolve identically when fed the
    same per-particle uniforms."""
    from hydrolim_tpu.ops.pallas_stepper import (
        meanfield_multi_step,
        pack_particles,
        unpack_particles,
    )

    L, N, k_steps, dt = 32, 100, 16, 2e-3
    rng = np.random.default_rng(3)
    pos = rng.integers(0, L, (1, N))
    sig = rng.choice([-1, 1], (1, N))
    wnd = np.zeros((1, N), int)
    bits = rng.integers(0, 2 ** 32, size=(1, k_steps, 1, 128),
                        dtype=np.uint32)
    # force padding-lane draws to 0xFFFFFF (u≈1): if padding was live it
    # would hop every step and corrupt nothing *visible* — the real check
    # is m: copy the state into lanes with u drawn freely and compare
    scal = np.array([[1.0, 0.5, 2.0]], np.float32)
    p, sg, w = pack_particles(pos, sig, wnd)
    out1 = meanfield_multi_step(
        jnp.asarray(scal), jnp.zeros((1,), jnp.int32), p, sg, w,
        L=L, k_steps=k_steps, dt=dt, bidirectional=True, n_active=N,
        interpret=True, noise=jnp.asarray(bits))
    bits2 = bits.copy()
    bits2[..., N:] = rng.integers(0, 2 ** 32, bits2[..., N:].shape,
                                  dtype=np.uint32)
    out2 = meanfield_multi_step(
        jnp.asarray(scal), jnp.zeros((1,), jnp.int32), p, sg, w,
        L=L, k_steps=k_steps, dt=dt, bidirectional=True, n_active=N,
        interpret=True, noise=jnp.asarray(bits2))
    for a, b in zip(unpack_particles(*out1, N), unpack_particles(*out2, N)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# exclusion kernel (ops/pallas_exclusion.py)
# ---------------------------------------------------------------------------

def _exclusion_pair_step(config, params, mf_op, slots_xla, sl_pack, conv,
                         scal, dt, rng, *, use_local_m, n_steps):
    """Advance both engines n_steps with matched draws; assert slot-field
    equality after every step.  Returns the final (K, L) field."""
    from hydrolim_tpu.ops.pallas_exclusion import (
        exclusion_multi_step,
        unpack_slots,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_step

    K, L = config.K, config.L
    Kp = -(-K // 4) * 4
    Lp = -(-L // 128) * 128
    for s in range(n_steps):
        u_bits = rng.integers(0, 2 ** 32, (Kp, Lp), dtype=np.uint32)
        u = _bits_to_u(u_bits)
        # shared strict priority order: a distinct random rank per slot,
        # encoded for each engine's packing (kernel: rand_hi = (bits>>1) &
        # 0x7FFFFFF0 | row; XLA: (bits & 0xFFFE0000) | slot_id).  Distinct
        # ranks → no ties → identical admission decisions.
        rank = rng.permutation(K * L).astype(np.uint32)       # < 2^15
        rank2d = rank.reshape(K, L)
        prio_xla = (rank2d << np.uint32(17)) | \
            np.arange(K * L, dtype=np.uint32).reshape(K, L)
        pr_bits = np.zeros((Kp, Lp), np.uint32)
        pr_bits[:K, :L] = rank2d << np.uint32(6)     # (>>1)&MASK → rank<<5
        noise = np.zeros((1, 1, 2, 1, Kp, Lp), np.uint32)
        noise[0, 0, 0, 0] = u_bits
        noise[0, 0, 1, 0] = pr_bits

        slots_xla, _aux, _ex = lgk_step(
            config, params, mf_op, slots_xla, jax.random.PRNGKey(s), dt,
            _inject=(jnp.asarray(u[:K, :L]), jnp.asarray(prio_xla)))
        sl_pack = exclusion_multi_step(
            jnp.asarray(scal), jnp.zeros((1,), np.int32), sl_pack, conv,
            L=L, K=K, k_steps=1, dt=dt, periodic=config.periodic,
            bidirectional=config.active_model == "bidirectional",
            use_local_m=use_local_m, interpret=True,
            noise=jnp.asarray(noise))
        got = unpack_slots(sl_pack, K, L)[0]
        np.testing.assert_array_equal(
            got, np.asarray(slots_xla),
            err_msg=f"slot fields diverged at step {s}")
    return np.asarray(slots_xla)


@pytest.mark.parametrize("use_local_m,active_model", [
    (False, "plus_forward"),
    (True, "plus_forward"),
    (False, "bidirectional"),
])
def test_exclusion_kernel_interpret_matches_slot_engine(use_local_m,
                                                        active_model):
    """Fused exclusion kernel under interpret=True vs the XLA slot engine
    (lgk_step) at matched event draws AND matched admission priorities:
    the signed slot fields must be EQUAL after every step — rates,
    admission rounds, and stable compaction all agree."""
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.ops.pallas_exclusion import build_conv_matrix, pack_slots
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, dt = 64, 3, 2e-3
    sigma = 0.02 if use_local_m else 0.0
    config = ParticleConfig(L=L, N=80, init="fixed", scale_rates=False,
                            local_kernel_sigma=sigma, periodic=True,
                            site_capacity=K, active_model=active_model)
    params = make_particle_params(config, beta=1.5, rate_diffusion=1.0,
                                  rate_active=3.0)
    mf_op = build_mfield_op(L, config.dx, sigma, True)
    slots0 = lgk_init(config, jax.random.PRNGKey(11))
    conv = build_conv_matrix(config) if use_local_m else np.zeros((0, 0))
    scal = np.array([[1.5, 1.0, 3.0]], np.float32)
    rng = np.random.default_rng(5)

    final = _exclusion_pair_step(
        config, params, mf_op, slots0, pack_slots(np.asarray(slots0)[None]),
        conv, scal, dt, rng, use_local_m=use_local_m, n_steps=25)
    # physics invariants on the shared trajectory
    assert np.abs(np.sign(final)).sum() == 80            # mass conserved
    assert (final != 0).sum(0).max() <= K                # capacity respected


def test_exclusion_kernel_interpret_nonperiodic_walls():
    """Non-periodic boundaries: matched-draw equality plus no leakage
    through the walls (payload ids conserved, occupancy within K)."""
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.ops.pallas_exclusion import build_conv_matrix, pack_slots
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, dt = 48, 2, 2e-3
    config = ParticleConfig(L=L, N=40, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.015, periodic=False,
                            site_capacity=K, active_model="plus_forward")
    params = make_particle_params(config, beta=0.8, rate_diffusion=1.0,
                                  rate_active=4.0)
    mf_op = build_mfield_op(L, config.dx, 0.015, False)
    slots0 = lgk_init(config, jax.random.PRNGKey(2))
    conv = build_conv_matrix(config)
    scal = np.array([[0.8, 1.0, 4.0]], np.float32)
    rng = np.random.default_rng(9)

    final = _exclusion_pair_step(
        config, params, mf_op, slots0, pack_slots(np.asarray(slots0)[None]),
        conv, scal, dt, rng, use_local_m=True, n_steps=25)
    assert np.abs(np.sign(final)).sum() == 40
    assert (final != 0).sum(0).max() <= K


# ---------------------------------------------------------------------------
# replica-banked exclusion kernel (ops/pallas_exclusion_rb.py)
# ---------------------------------------------------------------------------

def _exclusion_rb_pair_step(config, params, mf_op, slots_xla_b, sl_pack,
                            conv, scal, dt, rng, *, use_local_m, n_steps):
    """Advance the (K, R, Lp) replica-banked kernel and R independent XLA
    slot-engine replicas with matched draws; assert slot-field equality
    after every step.  Returns the final (R, K, L) fields."""
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        exclusion_multi_step_rb,
        unpack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_step

    K, L = config.K, config.L
    R = len(slots_xla_b)
    Lp = -(-L // 128) * 128
    for s in range(n_steps):
        noise = np.zeros((1, 1, 2, K, R, Lp), np.uint32)
        for r in range(R):
            u_bits = rng.integers(0, 2 ** 32, (K, Lp), dtype=np.uint32)
            u = _bits_to_u(u_bits)
            rank = rng.permutation(K * L).astype(np.uint32)   # < 2^15
            rank2d = rank.reshape(K, L)
            prio_xla = (rank2d << np.uint32(17)) | \
                np.arange(K * L, dtype=np.uint32).reshape(K, L)
            pr_bits = np.zeros((K, Lp), np.uint32)
            pr_bits[:, :L] = rank2d << np.uint32(6)
            noise[0, 0, 0, :, r, :] = u_bits
            noise[0, 0, 1, :, r, :] = pr_bits
            slots_xla_b[r], _aux, _ex = lgk_step(
                config, params, mf_op, slots_xla_b[r],
                jax.random.PRNGKey(s * R + r), dt,
                _inject=(jnp.asarray(u[:, :L]), jnp.asarray(prio_xla)))
        sl_pack = exclusion_multi_step_rb(
            jnp.asarray(scal), jnp.zeros((R,), np.int32), sl_pack, conv,
            L=L, K=K, k_steps=1, dt=dt, periodic=config.periodic,
            bidirectional=config.active_model == "bidirectional",
            use_local_m=use_local_m, r_batch=R, interpret=True,
            noise=jnp.asarray(noise))
        got = unpack_slots_rb(sl_pack, K, L)
        for r in range(R):
            np.testing.assert_array_equal(
                got[r], np.asarray(slots_xla_b[r]),
                err_msg=f"replica {r} slot fields diverged at step {s}")
    return [np.asarray(x) for x in slots_xla_b]


@pytest.mark.parametrize("use_local_m,active_model", [
    (False, "bidirectional"),
    (True, "plus_forward"),
])
def test_exclusion_rb_kernel_interpret_matches_slot_engine(use_local_m,
                                                           active_model):
    """Replica-banked fused exclusion kernel under interpret=True vs TWO
    independent XLA slot-engine replicas at matched draws: the banked
    (K, R, Lp) layout must reproduce each replica's trajectory exactly —
    rates, admission rounds, stable compaction AND the replica banking
    (transpose + per-sublane scalars) all agree."""
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, dt = 64, 3, 2e-3
    sigma = 0.02 if use_local_m else 0.0
    config = ParticleConfig(L=L, N=80, init="fixed", scale_rates=False,
                            local_kernel_sigma=sigma, periodic=True,
                            site_capacity=K, active_model=active_model)
    params = make_particle_params(config, beta=1.5, rate_diffusion=1.0,
                                  rate_active=3.0)
    mf_op = build_mfield_op(L, config.dx, sigma, True)
    slots_b = [lgk_init(config, jax.random.PRNGKey(11)),
               lgk_init(config, jax.random.PRNGKey(12))]
    conv = build_conv_matrix(config) if use_local_m else np.zeros((0, 0))
    scal = np.array([[1.5, 1.0, 3.0]] * 2, np.float32)
    rng = np.random.default_rng(5)

    finals = _exclusion_rb_pair_step(
        config, params, mf_op, slots_b,
        pack_slots_rb(np.stack([np.asarray(s) for s in slots_b])),
        conv, scal, dt, rng, use_local_m=use_local_m, n_steps=25)
    for final in finals:
        assert np.abs(np.sign(final)).sum() == 80        # mass conserved
        assert (final != 0).sum(0).max() <= K            # capacity respected


def test_exclusion_rb_kernel_interpret_nonperiodic_walls():
    """Non-periodic boundaries in the banked layout: matched-draw equality
    plus no leakage through the walls."""
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    L, K, dt = 48, 2, 2e-3
    config = ParticleConfig(L=L, N=40, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.015, periodic=False,
                            site_capacity=K, active_model="plus_forward")
    params = make_particle_params(config, beta=0.8, rate_diffusion=1.0,
                                  rate_active=4.0)
    mf_op = build_mfield_op(L, config.dx, 0.015, False)
    slots_b = [lgk_init(config, jax.random.PRNGKey(2))]
    conv = build_conv_matrix(config)
    scal = np.array([[0.8, 1.0, 4.0]], np.float32)
    rng = np.random.default_rng(9)

    finals = _exclusion_rb_pair_step(
        config, params, mf_op, slots_b,
        pack_slots_rb(np.stack([np.asarray(s) for s in slots_b])),
        conv, scal, dt, rng, use_local_m=True, n_steps=25)
    assert np.abs(np.sign(finals[0])).sum() == 40
    assert (finals[0] != 0).sum(0).max() <= K


# ---------------------------------------------------------------------------
# fused PDE kernel (ops/pallas_pde.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m_expect,sigma,bc,active_model", [
    ("global", 2e5, "periodic", "bidirectional"),
    ("smooth", 0.15, "neumann", "anchored_minus"),
    ("narrow", 0.05, "periodic", "bidirectional"),
])
def test_pde_kernel_interpret_matches_xla_stepper(m_expect, sigma, bc,
                                                  active_model):
    """Fused PDE kernel under interpret=True vs the XLA IMEX stepper +
    tracer update at matched draws: fields track to f32 roundoff, tracer
    trajectories and windowed v/D records agree, ring-buffer slots line up
    across chunk boundaries (two invocations with a step0 offset).
    Parametrized over the kernel's magnetization modes (global reduction /
    smoothing matmul / narrow rolls), both IMEX branches and both BCs."""
    from hydrolim_tpu.ops.pallas_pde import _pad, pde_multi_step
    from hydrolim_tpu.pde.fast_solve import (
        _m_mode,
        _narrow_radius,
        build_kernel_mats,
        build_narrow_weights,
    )
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import (
        TracerState,
        _tracer_update,
        build_pde_ops,
        magnetization,
        pde_step,
    )

    L, n_t, dt, gamma, lam, beta = 128, 48, 5e-5, 0.2, 0.6, 1.4
    k_steps, window = 14, 6
    config = PDEConfig(L=L, T=2 * k_steps * dt, dt=dt, bc=bc,
                       active_model=active_model,
                       gaussian_kernel=True, kernel_sigma=sigma,
                       snapshot_interval=k_steps, n_tracers=n_t,
                       tracer_window_time=window * dt,
                       diffusion_solver="dense", fft_kmax=8)
    assert config.tracer_window == window
    assert _m_mode(config) == m_expect
    params = make_pde_params(gamma=gamma, lam=lam, beta=beta)
    ops = build_pde_ops(config, params)
    Lp, Ntp = _pad(L), _pad(n_t)

    rho_p, rho_m, tr = pde_initialize(config, jax.random.PRNGKey(1),
                                      mode="homogeneous", noise=0.3,
                                      n_tracers=n_t)
    rng = np.random.default_rng(13)
    n_total = 2 * k_steps
    bits = rng.integers(0, 2 ** 32, (1, n_total, 3, 1, Ntp),
                        dtype=np.uint32)
    flip_u = _bits_to_u(bits[0, :, 0, 0])                 # (n_total, Ntp)
    u2 = np.maximum(_bits_to_u(bits[0, :, 1, 0]), np.float32(1e-12))
    u3 = _bits_to_u(bits[0, :, 2, 0])
    # the kernel's Box–Muller, reproduced with the same f32 jnp ops
    z = np.asarray(jnp.sqrt(-2.0 * jnp.log(jnp.asarray(u2))) *
                   jnp.cos(jnp.float32(2.0 * np.pi) * jnp.asarray(u3)))

    # ---- XLA reference loop ----
    rp_x, rm_x, tr_x = rho_p, rho_m, tr
    v_hist, d_hist = [], []
    for n in range(n_total):
        m_field = magnetization(config, ops, rp_x, rm_x)
        tr_x, v_eff, D_eff = _tracer_update(
            config, params, m_field, tr_x, jax.random.PRNGKey(n),
            jnp.int32(n),
            _inject=(jnp.asarray(flip_u[n, :n_t]), jnp.asarray(z[n, :n_t])))
        v_hist.append(float(v_eff))
        d_hist.append(float(D_eff))
        rp_x, rm_x = pde_step(config, params, ops, rp_x, rm_x, m=m_field)

    # ---- fused kernel, two chained invocations (ring buffer continuity) --
    solve_mat, smooth_mat, solve_mode, solve_r, solve_wts = \
        build_kernel_mats(config, gamma, Lp)
    assert solve_mode == "dense"
    if m_expect == "narrow":
        narrow_r = _narrow_radius(config)
        wts = jnp.asarray(build_narrow_weights(config))
    else:
        narrow_r, wts = 0, None
    pad_to = lambda a, n: np.pad(np.asarray(a, np.float32),
                                 ((0, 0), (0, n - a.shape[-1])))
    rp_k = jnp.asarray(pad_to(np.asarray(rho_p)[None], Lp))
    rm_k = jnp.asarray(pad_to(np.asarray(rho_m)[None], Lp))
    pos_k = jnp.asarray(pad_to(np.asarray(tr.unwrapped)[None], Ntp))
    spin_k = jnp.asarray(pad_to(np.asarray(tr.spin, np.float32)[None], Ntp))
    Wp = _pad(window, 8)
    hist_k = jnp.zeros((1, Wp, Ntp), jnp.float32)
    scal = np.zeros((1, 4), np.float32)
    scal[0, 0], scal[0, 1] = beta, lam
    scal[0, 2] = np.float32(np.sqrt(2.0 * gamma * dt))

    recs_all = []
    for chunk in range(2):
        sl = slice(chunk * k_steps, (chunk + 1) * k_steps)
        rp_k, rm_k, pos_k, spin_k, hist_k, recs = pde_multi_step(
            jnp.asarray(scal), jnp.zeros((1,), jnp.int32),
            jnp.asarray([chunk * k_steps], jnp.int32),
            rp_k, rm_k, pos_k, spin_k, hist_k,
            jnp.asarray(solve_mat), jnp.asarray(smooth_mat),
            wts=wts, solve_wts=jnp.asarray(solve_wts),
            L=L, n_t=n_t, window=window, k_steps=k_steps, dt=dt,
            dx=config.dx, xlim=config.xlim, periodic=bc == "periodic",
            m_mode=m_expect, narrow_r=narrow_r,
            solve_mode=solve_mode, solve_r=solve_r,
            bidirectional=active_model == "bidirectional",
            has_noise=True, kmax_rec=0, interpret=True,
            noise=jnp.asarray(bits[:, sl]))
        recs_all.append(np.asarray(recs[0]))
    recs = np.concatenate(recs_all, axis=0)               # (n_total, 128)

    # fields to f32 roundoff (different matmul shapes/orders, same math)
    np.testing.assert_allclose(np.asarray(rp_k)[0, :L], np.asarray(rp_x),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rm_k)[0, :L], np.asarray(rm_x),
                               rtol=2e-4, atol=1e-7)
    # tracer ensemble: same flips, same noise → trajectories track
    np.testing.assert_allclose(np.asarray(pos_k)[0, :n_t],
                               np.asarray(tr_x.unwrapped),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(spin_k)[0, :n_t],
                                  np.asarray(tr_x.spin, np.float32))
    # windowed v/D records, incl. the NaN warmup prefix
    v_k, d_k = recs[:, 2], recs[:, 3]
    assert np.isnan(v_k[:window]).all() and np.isnan(v_hist[0])
    np.testing.assert_allclose(v_k[window:], np.asarray(v_hist[window:]),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(d_k[window:], np.asarray(d_hist[window:]),
                               rtol=5e-4, atol=1e-6)


def test_pde_kernel_r_banking_is_replica_independent():
    """One R=4 fused-PDE program must reproduce four R=1 programs
    bit-for-bit at matched injected draws — per-replica scalars, fields,
    tracers and record rows.  This is the independence property the
    production big-batch route (R up to 32 per program,
    pde/fast_solve.max_r) relies on: R only changes how replicas are
    banked onto MXU rows, never what any replica computes."""
    from hydrolim_tpu.ops.pallas_pde import _pad, pde_multi_step
    from hydrolim_tpu.pde.fast_solve import build_kernel_mats
    from hydrolim_tpu.pde.init import pde_initialize

    L, n_t, dt, gamma, lam = 128, 16, 5e-5, 0.2, 0.6
    k_steps, window, R = 10, 4, 4
    config = PDEConfig(L=L, T=k_steps * dt, dt=dt, bc="periodic",
                       active_model="bidirectional", gaussian_kernel=True,
                       kernel_sigma=2e5, snapshot_interval=k_steps,
                       n_tracers=n_t, tracer_window_time=window * dt,
                       diffusion_solver="dense", fft_kmax=8)
    Lp, Ntp = _pad(L), _pad(n_t)
    Wp = _pad(window, 8)
    solve_mat, smooth_mat, solve_mode, solve_r, solve_wts = \
        build_kernel_mats(config, gamma, Lp)

    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2 ** 32, (1, k_steps, 3, R, Ntp),
                        dtype=np.uint32)
    pad_to = lambda a, n: np.pad(np.asarray(a, np.float32),
                                 ((0, 0), (0, n - a.shape[-1])))
    rp0, rm0, pos0, spin0 = [], [], [], []
    for r in range(R):
        rp, rm, tr = pde_initialize(config, jax.random.PRNGKey(10 + r),
                                    mode="homogeneous", noise=0.3,
                                    n_tracers=n_t)
        rp0.append(np.asarray(rp))
        rm0.append(np.asarray(rm))
        pos0.append(np.asarray(tr.unwrapped))
        spin0.append(np.asarray(tr.spin, np.float32))
    rp0, rm0 = pad_to(np.stack(rp0), Lp), pad_to(np.stack(rm0), Lp)
    pos0, spin0 = pad_to(np.stack(pos0), Ntp), pad_to(np.stack(spin0), Ntp)
    scal = np.zeros((R, 4), np.float32)
    scal[:, 0] = np.linspace(0.5, 2.0, R)       # per-replica beta
    scal[:, 1] = lam
    scal[:, 2] = np.float32(np.sqrt(2.0 * gamma * dt))

    def run(rb, rows, noise):
        return pde_multi_step(
            jnp.asarray(scal[rows]), jnp.zeros((len(rows),), jnp.int32),
            jnp.zeros((len(rows),), jnp.int32),
            jnp.asarray(rp0[rows]), jnp.asarray(rm0[rows]),
            jnp.asarray(pos0[rows]), jnp.asarray(spin0[rows]),
            jnp.zeros((len(rows), Wp, Ntp), jnp.float32),
            jnp.asarray(solve_mat), jnp.asarray(smooth_mat),
            solve_wts=jnp.asarray(solve_wts),
            L=L, n_t=n_t, window=window, k_steps=k_steps, r_batch=rb,
            dt=dt, dx=config.dx, xlim=config.xlim, periodic=True,
            m_mode="global", narrow_r=0, solve_mode=solve_mode,
            solve_r=solve_r, bidirectional=True, has_noise=True,
            kmax_rec=0, interpret=True, noise=jnp.asarray(noise))

    banked = run(R, np.arange(R), bits)
    for r in range(R):
        single = run(1, np.array([r]), bits[:, :, :, r:r + 1])
        for got, want in zip(banked, single):
            np.testing.assert_array_equal(np.asarray(got)[r],
                                          np.asarray(want)[0])


@pytest.mark.parametrize("idx", range(6))
def test_exclusion_rb_kernel_fuzzed_configs_match_slot_engine(idx):
    """Config-space fuzz of the replica-banked kernel: seeded random draws
    over (K, L, periodicity, active model, local/global m, R, rates) —
    matched-draw exact slot-field equality with the XLA engine for 8 steps
    each.  Deterministic (seed = idx), so failures reproduce exactly."""
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    rng = np.random.default_rng(1000 + idx)
    K = int(rng.integers(1, 5))
    L = int(rng.choice([32, 48, 64, 100]))
    periodic = bool(rng.integers(0, 2))
    am = str(rng.choice(["plus_forward", "bidirectional"]))
    use_local_m = bool(rng.integers(0, 2))
    R = int(rng.choice([1, 2, 3]))
    N = int(rng.integers(K * L // 4, K * L // 2))
    beta = float(rng.uniform(0.0, 2.5))
    rd = float(rng.uniform(0.1, 2.0))
    ra = float(rng.uniform(0.0, 4.0))
    sigma = float(rng.uniform(0.008, 0.05)) if use_local_m else 0.0
    config = ParticleConfig(L=L, N=N, init="fixed", scale_rates=False,
                            local_kernel_sigma=sigma, periodic=periodic,
                            site_capacity=K, active_model=am)
    params = make_particle_params(config, beta=beta, rate_diffusion=rd,
                                  rate_active=ra)
    mf_op = build_mfield_op(L, config.dx, sigma, periodic)
    slots_b = [lgk_init(config, jax.random.PRNGKey(100 * idx + r))
               for r in range(R)]
    conv = build_conv_matrix(config) if use_local_m else np.zeros((0, 0))
    scal = np.array([[beta, rd, ra]] * R, np.float32)

    finals = _exclusion_rb_pair_step(
        config, params, mf_op, slots_b,
        pack_slots_rb(np.stack([np.asarray(s) for s in slots_b])),
        conv, scal, 2e-3, rng, use_local_m=use_local_m, n_steps=8)
    for final in finals:
        assert np.abs(np.sign(final)).sum() == N
        assert (final != 0).sum(0).max() <= K


# ---------------------------------------------------------------------------
# narrow smoothing path (round 5: rolled taps + exact corner matmul)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("periodic", [True, False])
def test_narrow_smooth_operand_matches_dense_matrix(periodic):
    """The packed narrow operand reproduces the dense conv matrix: a
    float64 emulation of the kernel's rolled-interior + corner-override
    computation must match x @ M to float32-roundoff for random fields,
    both boundary conditions."""
    from hydrolim_tpu.ops.pallas_exclusion import (
        _pad_lanes,
        build_conv_matrix,
        build_narrow_smooth,
        narrow_smooth_radius,
    )

    L = 1000
    config = ParticleConfig(L=L, N=100, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.004, periodic=periodic,
                            site_capacity=3, active_model="plus_forward")
    rb = narrow_smooth_radius(config)
    assert rb > 0
    P = build_narrow_smooth(config, rb)
    M = build_conv_matrix(config)
    Lp = _pad_lanes(L)

    rng = np.random.default_rng(3)
    x = np.zeros((4, Lp))
    x[:, :L] = rng.uniform(0, 3, (4, L))
    want = x @ M                                 # dense reference

    # interior: 2rb+1 cyclic rolls, ascending input index per output
    taps = P[768, :2 * rb + 1]
    acc = taps[2 * rb] * np.roll(x, rb, axis=1)
    for d in range(rb - 1, -rb - 1, -1):
        acc = acc + taps[rb + d] * np.roll(x, d, axis=1)
    # corners: exact small matmul over the packed windows
    win = np.concatenate([x[:, 0:384], x[:, Lp - 384:Lp]], axis=1)
    corners = win @ P[:768]
    got = np.concatenate(
        [corners[:, 0:256], acc[:, 256:Lp - 256], corners[:, 256:512]],
        axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
    # padding output lanes are exactly zero on the dense path; the narrow
    # kernel's pad-lane values are unread (occupancy masks every rate)
    assert np.abs(want[:, L:]).max() == 0.0


@pytest.mark.parametrize("variant", ["plain", "rb"])
def test_exclusion_narrow_matches_dense_interpret(variant):
    """Matched-draw trajectory equality of the NARROW smoothing path vs the
    dense-matmul path on the same kernel (interpret mode, injected noise):
    the m fields agree to f32 roundoff, so on a fixed seed no event
    threshold flips and the integer slot trajectories are EQUAL.  Chained
    with the existing dense-vs-XLA matched-draw pins, this covers the
    production narrow route end-to-end."""
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        build_narrow_smooth,
        narrow_smooth_radius,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    if variant == "plain":
        from hydrolim_tpu.ops.pallas_exclusion import (
            exclusion_multi_step as step,
            pack_slots as pack,
        )
        R = 1
    else:
        from hydrolim_tpu.ops.pallas_exclusion_rb import (
            exclusion_multi_step_rb as step,
            pack_slots_rb as pack,
        )
        R = 2
    L, K, k_steps, dt = 768, 3, 6, 2e-3
    config = ParticleConfig(L=L, N=800, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.005, periodic=False,
                            site_capacity=K, active_model="bidirectional")
    sr = narrow_smooth_radius(config)
    assert sr > 0
    Kp = -(-K // 4) * 4 if variant == "plain" else K
    rng = np.random.default_rng(11)
    slots0 = np.stack([np.asarray(lgk_init(config, jax.random.PRNGKey(r)))
                       for r in range(R)])
    sl0 = pack(slots0)
    scal = np.array([[1.3, 0.6, 3.0]] * R, np.float32)
    # plain layout noise: (G, k_steps, 2, R, Kp, Lp); banked: (…, K, R, Lp)
    nshape = ((1, k_steps, 2, K, R, 768) if variant == "rb"
              else (1, k_steps, 2, R, Kp, 768))
    noise = rng.integers(0, 2 ** 32, nshape, dtype=np.uint32)
    kw = dict(L=L, K=K, k_steps=k_steps, dt=dt, periodic=False,
              bidirectional=True, use_local_m=True, r_batch=R,
              interpret=True, noise=jnp.asarray(noise))
    seeds = np.zeros(R, np.int32)
    out_dense = step(jnp.asarray(scal), seeds, sl0,
                     jnp.asarray(build_conv_matrix(config)),
                     smooth_radius=0, **kw)
    out_narrow = step(jnp.asarray(scal), seeds, sl0,
                      jnp.asarray(build_narrow_smooth(config, sr)),
                      smooth_radius=sr, **kw)
    np.testing.assert_array_equal(np.asarray(out_dense),
                                  np.asarray(out_narrow))
    # the dynamics actually moved
    assert (np.asarray(out_dense) != np.asarray(sl0)).any()


def test_narrow_smooth_radius_gates():
    """Routing gates: small lattices and wide kernels stay dense; the
    flagship class (σ_grid ≈ 2, L = 1000) routes narrow."""
    from hydrolim_tpu.ops.pallas_exclusion import narrow_smooth_radius

    mk = lambda L, sig, per=False: ParticleConfig(
        L=L, N=10, init="fixed", scale_rates=False, local_kernel_sigma=sig,
        periodic=per, site_capacity=3, active_model="plus_forward")
    assert narrow_smooth_radius(mk(1000, 0.002)) == 8       # flagship
    # periodic uses the full-circulant 1e-7 tail criterion (~5.5σ), not 4σ
    assert narrow_smooth_radius(mk(1000, 0.002, per=True)) == 16
    assert narrow_smooth_radius(mk(1000, 0.0)) == 0         # global m
    assert narrow_smooth_radius(mk(512, 0.002)) == 0        # Lp < 768
    assert narrow_smooth_radius(mk(1000, 0.05)) == 0        # σ_grid 50: wide
    assert narrow_smooth_radius(mk(1000, 0.012)) == 48      # boundary bucket
