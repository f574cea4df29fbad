"""pde.fast_solve — fused-PDE runner, CPU-testable surface.

The kernel itself (ops/pallas_pde.py) is TPU-only (Mosaic PRNG); these
tests pin down the pieces the kernel consumes: operator matrices match the
XLA solve ops exactly, config gating, and the XLA fallback contract."""
import numpy as np
import jax
import jax.numpy as jnp

from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
from hydrolim_tpu.ops.diffusion import build_diffusion_op, diffusion_solve
from hydrolim_tpu.pde.fast_solve import (
    build_kernel_mats,
    is_fused_pde_path,
    pde_solve_fused,
)
from hydrolim_tpu.pde.stepper import build_pde_ops, magnetization


def test_path_gating():
    ok = PDEConfig(L=1000, T=1.0, dt=5e-4, snapshot_interval=50)
    assert is_fused_pde_path(ok, np.full(4, 0.2))
    assert not is_fused_pde_path(ok, np.array([0.1, 0.2]))   # non-uniform γ
    big = PDEConfig(L=4096, T=1.0, dt=5e-4, snapshot_interval=50)
    assert not is_fused_pde_path(big, np.full(4, 0.2))
    ragged = PDEConfig(L=1000, T=1.0, dt=5e-4, snapshot_interval=33)
    # nsteps=2000 not a multiple of 33
    assert not is_fused_pde_path(ragged, np.full(4, 0.2))
    # the gate is a VMEM estimate, not a bare L limit: at L=2048 the
    # smooth+solve matrices alone are ~34 MB (> VMEM) and must route to
    # XLA, while the matrix-free γ=0 + wide-kernel (global-m) config of
    # the same L fits and stays fused
    heavy = PDEConfig(L=2048, T=1.0, dt=5e-4, snapshot_interval=50,
                      gaussian_kernel=True, kernel_sigma=0.05)
    assert not is_fused_pde_path(heavy, np.full(4, 0.2))
    light = PDEConfig(L=2048, T=1.0, dt=5e-4, snapshot_interval=50,
                      gaussian_kernel=True, kernel_sigma=1e6)
    assert is_fused_pde_path(light, np.zeros(4))


def test_solve_matrix_matches_spectral_solve():
    L, dt, gamma = 200, 5e-4, 0.3
    config = PDEConfig(L=L, T=1.0, dt=dt, bc="periodic",
                       snapshot_interval=50)
    Lp = 256
    solve_mat, _, solve_mode, _, _ = build_kernel_mats(config, gamma, Lp)
    assert solve_mode == "dense"
    rng = np.random.default_rng(0)
    x = rng.random((3, L)).astype(np.float32)
    xp = np.zeros((3, Lp), np.float32)
    xp[:, :L] = x
    got = (xp @ solve_mat)[:, :L]
    op = build_diffusion_op(L, config.dx, dt, gamma, "periodic", "fft")
    want = np.asarray(diffusion_solve(op, jnp.asarray(x), "fft"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
    # pad lanes never leak
    np.testing.assert_array_equal((xp @ solve_mat)[:, L:], 0.0)


def test_solve_matrix_neumann():
    L, dt, gamma = 128, 1e-3, 0.2
    config = PDEConfig(L=L, T=1.0, dt=dt, bc="neumann",
                       snapshot_interval=50, diffusion_solver="dense")
    solve_mat, _, _, _, _ = build_kernel_mats(config, gamma, 128)
    rng = np.random.default_rng(1)
    x = rng.random((L,)).astype(np.float32)
    got = x @ solve_mat
    op = build_diffusion_op(L, config.dx, dt, gamma, "neumann", "dense")
    want = np.asarray(diffusion_solve(op, jnp.asarray(x), "dense"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_smooth_matrix_matches_magnetization():
    L = 200
    # σ_grid = 16 → roll radius 92 > the narrow bound: stays a matmul
    config = PDEConfig(L=L, T=1.0, dt=5e-4, gaussian_kernel=True,
                       kernel_sigma=0.08, snapshot_interval=50)
    _, smooth_mat, _, _, _ = build_kernel_mats(config, 0.0, 256)
    params = make_pde_params(gamma=0.0, lam=0.6, beta=1.0)
    ops = build_pde_ops(config, params)
    rng = np.random.default_rng(2)
    rp = rng.random(L).astype(np.float32)
    rm = rng.random(L).astype(np.float32)
    num, den = rp - rm, rp + rm
    pack = np.zeros((2, 256), np.float32)
    pack[0, :L], pack[1, :L] = num, den
    sm = pack @ smooth_mat
    got = sm[0, :L] / (sm[1, :L] + 1e-12)
    want = np.asarray(magnetization(config, ops, jnp.asarray(rp),
                                    jnp.asarray(rm)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_kernel_width_routing():
    """σ = 1e5−10 (the reference's just-under-the-sentinel sweep quirk,
    IMEX_PDE_solver_run_sweep.py:36) must route to the exact global mean
    (the circulant is uniform to ~1e-11, far below f32 resolution); small
    σ routes to the rolled 'narrow' form; mid-width σ keeps the matmul."""
    from hydrolim_tpu.pde.fast_solve import _m_mode

    mk = lambda sig, L=1000: PDEConfig(L=L, T=1.0, dt=5e-4,
                                       gaussian_kernel=True,
                                       kernel_sigma=sig,
                                       snapshot_interval=50)
    assert _m_mode(mk(1e5 - 10)) == "global"
    assert _m_mode(mk(0.005)) == "narrow"      # σ_grid=5 → r=29 rolls
    assert _m_mode(mk(0.05)) == "smooth"       # σ_grid=50 → r>63: matmul
    assert _m_mode(mk(0.1, L=128)) == "smooth"
    # and the smoothing circulant at a mid-width sigma is not uniform
    _, smooth_mat, _, _, _ = build_kernel_mats(mk(0.1, L=128), 0.0, 128)
    assert smooth_mat.std() > 0


def test_narrow_weights_match_circulant():
    """The truncated-roll weights reproduce the full periodic circulant:
    out[j] = Σ_d w(d)·x[(j−d) mod L] vs the (L, L) matrix apply."""
    from hydrolim_tpu.ops.convolve import periodic_gaussian_kernel
    from hydrolim_tpu.pde.fast_solve import (
        _m_mode,
        _narrow_radius,
        build_narrow_weights,
    )

    config = PDEConfig(L=200, T=1.0, dt=5e-4, gaussian_kernel=True,
                       kernel_sigma=0.01, snapshot_interval=50)
    assert _m_mode(config) == "narrow"
    r = _narrow_radius(config)
    w = build_narrow_weights(config)[0]
    rng = np.random.default_rng(5)
    x = rng.random(config.L).astype(np.float32)
    got = np.zeros_like(x)
    for d in range(-r, r + 1):
        got += w[r + d] * np.roll(x, d)
    k = periodic_gaussian_kernel(config.L, config.dx, config.kernel_sigma)
    # full circulant: out[j] = sum_i x[i] * k[(j - i) mod L]
    i = np.arange(config.L)
    M = np.zeros((config.L, config.L), np.float32)
    for j in range(config.L):
        M[i, j] = k[(j - i) % config.L]
    want = x @ M
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_banded_solve_mode_routing_and_weights():
    """Large-L fused scope (VERDICT r2 #7): past the dense (Lp, Lp) VMEM
    gate, a periodic γ>0 config with γ·dt/dx² O(1) (large-L runs scale dt
    with dx) routes to the in-kernel BANDED solve; the truncated rolled
    weights must equal the banded XLA solve and the exact spectral solve."""
    from hydrolim_tpu.pde.fast_solve import (
        _solve_mode_of,
        build_banded_solve_weights,
    )

    L, gamma, dt = 8192, 0.2, 2e-7          # c = γ·dt/dx² ≈ 2.7
    config = PDEConfig(L=L, T=dt * 100, dt=dt, bc="periodic",
                       snapshot_interval=10, gaussian_kernel=False,
                       n_tracers=64, tracer_window_time=10 * dt,
                       fft_kmax=8)
    mode, r = _solve_mode_of(config, gamma)
    assert mode == "banded" and 1 <= r <= 63
    assert is_fused_pde_path(config, np.full(2, gamma))
    # a config whose band cannot decay inside the roll bound falls back
    wide = PDEConfig(L=4096, T=1.0, dt=5e-4, snapshot_interval=50)
    assert _solve_mode_of(wide, gamma)[0] == "unsupported"
    assert not is_fused_pde_path(wide, np.full(2, gamma))
    # an EXPLICIT diffusion_solver='banded' is honored even when the dense
    # inverse fits VMEM (ADVICE r3) — the XLA engine applies the truncated
    # banded kernel for that config, so the fused engine must too
    small_banded = PDEConfig(L=512, T=1e-4, dt=1e-6, bc="periodic",
                             snapshot_interval=10, gaussian_kernel=False,
                             n_tracers=16, tracer_window_time=1e-5,
                             fft_kmax=8, diffusion_solver="banded")
    mode_sb, r_sb = _solve_mode_of(small_banded, gamma)
    assert mode_sb == "banded" and r_sb >= 1, (mode_sb, r_sb)
    auto_small = PDEConfig(L=512, T=1e-4, dt=1e-6, bc="periodic",
                           snapshot_interval=10, gaussian_kernel=False,
                           n_tracers=16, tracer_window_time=1e-5,
                           fft_kmax=8)
    assert _solve_mode_of(auto_small, gamma)[0] == "dense"

    w = build_banded_solve_weights(config, gamma, r)
    rng = np.random.default_rng(3)
    x = rng.random(L).astype(np.float32)
    # kernel semantics: out[i] = sum_d w(d) · x[(i - d) mod L]
    y_roll = sum(w[0, r + d] * np.roll(x, d) for d in range(-r, r + 1))
    dx = config.dx
    op_b = build_diffusion_op(L, dx, dt, gamma, "periodic", "banded")
    y_banded = np.asarray(diffusion_solve(op_b, jnp.asarray(x), "banded"))
    np.testing.assert_allclose(y_roll, y_banded, rtol=1e-5, atol=1e-7)
    op_s = build_diffusion_op(L, dx, dt, gamma, "periodic", "fft")
    y_fft = np.asarray(diffusion_solve(op_s, jnp.asarray(x), "fft"))
    np.testing.assert_allclose(y_roll, y_fft, rtol=1e-4, atol=1e-5)


def test_gamma_zero_skips_solve():
    config = PDEConfig(L=100, T=1.0, dt=1e-3, snapshot_interval=50)
    _, _, solve_mode, _, _ = build_kernel_mats(config, 0.0, 128)
    assert solve_mode == "none"


def test_fetch_snapshots_false_drops_blocks_keeps_records():
    """The sweep drivers' transfer opt-out: records identical, snapshot
    blocks empty (they are ~0.4 GB at reference scale)."""
    from hydrolim_tpu.sweeps.pde_sweeps import run_pde_ensemble

    config = PDEConfig(L=64, T=0.1, dt=1e-3, gaussian_kernel=True,
                       kernel_sigma=0.05, snapshot_interval=50, n_tracers=16)
    kw = dict(gamma=0.2, lam=0.6, n_runs=2, seed=3, n_tracers=16)
    full, fb = run_pde_ensemble(config, [0.5, 2.0], **kw)
    thin, fb2 = run_pde_ensemble(config, [0.5, 2.0], fetch_snapshots=False,
                                 **kw)
    np.testing.assert_array_equal(fb, fb2)
    np.testing.assert_array_equal(np.asarray(full.records.m_mean),
                                  np.asarray(thin.records.m_mean))
    np.testing.assert_array_equal(np.asarray(full.records.v_eff),
                                  np.asarray(thin.records.v_eff))
    np.testing.assert_array_equal(np.asarray(full.rho_p),
                                  np.asarray(thin.rho_p))
    assert full.snapshots.shape[1] > 0
    assert thin.snapshots.shape[1] == 0 and thin.m_snapshots.shape[1] == 0


def test_facade_engine_auto_cpu_fallback():
    """IMEXPDE.solve(engine='auto') off-TPU = the XLA solve (field dynamics
    identical; tracer streams may differ by key plumbing)."""
    from hydrolim_tpu import IMEXPDE

    import tempfile

    tmp = tempfile.mkdtemp()
    mk = lambda: IMEXPDE(L=96, T=0.1, dt=1e-3, gamma=0.2, lam=0.6, beta=1.5,
                         bc="periodic", gaussian_kernel=True,
                         kernel_sigma=0.05, seed=11, outdir=tmp)
    a = mk()
    a.initialize("homogeneous", noise=0.2, n_tracers=32)
    a.solve()
    b = mk()
    b.initialize("homogeneous", noise=0.2, n_tracers=32)
    b.solve(engine="auto")
    np.testing.assert_allclose(np.asarray(a._result.rho_p),
                               np.asarray(b._result.rho_p), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a._result.records.m_mean),
                               np.asarray(b._result.records.m_mean),
                               rtol=1e-6)
    out = b.get_output()
    assert np.isfinite(out["m_series"]).all()


def test_xla_fallback_matches_vmapped_solve():
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import pde_solve

    config = PDEConfig(L=64, T=0.1, dt=1e-3, gaussian_kernel=True,
                       kernel_sigma=0.05, snapshot_interval=50, n_tracers=16)
    B = 3
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 1.0, 2.0]))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.2, n_tracers=16))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(7)
    got = pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                          engine="xla")
    want = jax.vmap(lambda p, a, b, t, k: pde_solve(config, p, ops, a, b,
                                                    t, k))(
        params_b, rp, rm, tr, jax.random.split(key, B))
    np.testing.assert_allclose(np.asarray(got.rho_p), np.asarray(want.rho_p),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.records.m_mean),
                               np.asarray(want.records.m_mean), rtol=1e-6)


def test_fft_record_slab_matches_partial_dft():
    """total @ build_fft_record_slab puts rfft re at lanes 4..4+k-1 and im
    at 4+k..4+2k-1, exactly dft.rfft_ri_partial, with the scalar record
    lanes (0..3) untouched (zero columns)."""
    import jax.numpy as jnp

    from hydrolim_tpu.core.config import PDEConfig
    from hydrolim_tpu.ops import dft
    from hydrolim_tpu.pde.fast_solve import _kmax_rec, build_fft_record_slab

    L, Lp, k = 100, 128, 8
    config = PDEConfig(L=L, T=1e-3, dt=1e-3, fft_kmax=k)
    assert _kmax_rec(config) == k
    slab = build_fft_record_slab(config, Lp)
    assert slab.shape == (Lp, 128)
    assert np.all(slab[:, :4] == 0) and np.all(slab[:, 4 + 2 * k:] == 0)
    assert np.all(slab[L:] == 0)
    rng = np.random.default_rng(5)
    x = np.zeros(Lp, np.float32)
    x[:L] = rng.random(L)
    row = x @ slab
    want = np.asarray(dft.rfft_ri_partial(jnp.asarray(x[:L]), k))
    np.testing.assert_allclose(row[4:4 + k], want[:, 0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(row[4 + k:4 + 2 * k], want[:, 1], rtol=1e-5,
                               atol=1e-5)
    # wide kmax (full rfft at reference L: 501 bins) stays on chunk cadence
    assert _kmax_rec(PDEConfig(L=1000, T=1e-3, dt=1e-3)) == 0


def test_gamma_zero_ensemble_promotes_to_identity_solver():
    """run_pde_ensemble must resolve diffusion_solver='auto' to 'identity'
    at gamma=0 like the IMEXPDE facade (regression, round-3 review: the
    'magn' sweep variant paid two (L, L) DFT round-trips per step
    computing A^-1 = I, and accumulated f32 round-trip noise)."""
    import numpy as np

    from hydrolim_tpu.core.config import PDEConfig
    from hydrolim_tpu.sweeps.pde_sweeps import run_pde_ensemble

    kw = dict(L=64, T=0.02, dt=1e-3, bc="periodic", gaussian_kernel=True,
              kernel_sigma=0.05, snapshot_interval=10, n_tracers=8)
    res_auto, _ = run_pde_ensemble(
        PDEConfig(**kw), [1.5], gamma=0.0, lam=0.6, n_runs=2, seed=5,
        n_tracers=8)
    res_id, _ = run_pde_ensemble(
        PDEConfig(**kw, diffusion_solver="identity"), [1.5], gamma=0.0,
        lam=0.6, n_runs=2, seed=5, n_tracers=8)
    # the promotion makes 'auto' the SAME program as explicit 'identity'
    np.testing.assert_array_equal(np.asarray(res_auto.rho_p),
                                  np.asarray(res_id.rho_p))
    np.testing.assert_array_equal(np.asarray(res_auto.records.m_mean),
                                  np.asarray(res_id.records.m_mean))
    # and the spectral solve at gamma=0 is the identity up to f32 noise
    res_fft, _ = run_pde_ensemble(
        PDEConfig(**kw, diffusion_solver="fft"), [1.5], gamma=0.0,
        lam=0.6, n_runs=2, seed=5, n_tracers=8)
    np.testing.assert_allclose(np.asarray(res_fft.rho_p),
                               np.asarray(res_id.rho_p), rtol=2e-4,
                               atol=2e-6)


def test_wide_kmax_auto_routes_to_xla_full_cadence(monkeypatch):
    """Cadence contract (VERDICT r3 #6): engine='auto' with kmax > 62 (the
    facade's default full rfft) must route to the XLA solve — full per-step
    fft_ri, no silent drop to chunk-start cadence — even when the default
    device is a TPU (mocked here; the fused branch would crash on CPU, so
    this test is discriminating)."""
    import hydrolim_tpu.sweeps.fast_exclusion as fx
    from hydrolim_tpu.pde.fast_solve import (
        _kmax_rec,
        is_fused_pde_path,
        pde_solve_fused,
    )
    from hydrolim_tpu.pde.init import pde_initialize

    monkeypatch.setattr(fx, "default_device_is_tpu", lambda: True)
    config = PDEConfig(L=256, T=0.04, dt=1e-3, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=1e5 - 10,
                       snapshot_interval=20, n_tracers=16,
                       tracer_window_time=5e-3)   # fft_kmax=None: full rfft
    assert config.kmax == 129 and _kmax_rec(config) == 0
    B = 2
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 1.5]))
    assert is_fused_pde_path(config, params_b.gamma)   # fused-eligible...
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    rp, rm, tr = jax.vmap(lambda k: pde_initialize(
        config, k, mode="homogeneous", noise=0.3, n_tracers=16))(keys)
    res = pde_solve_fused(config, params_b, ops, rp, rm, tr,
                          jax.random.PRNGKey(1), engine="auto")
    fft = np.asarray(res.records.fft_ri)
    assert fft.shape[1] == config.nsteps + 1
    assert np.isfinite(fft).all()                      # ...but full cadence


def test_explicit_pallas_wide_kmax_warns():
    """engine='pallas' at wide kmax is an explicit opt-in to chunk-cadence
    spectra — it must WARN so the change is never silent (the kernel itself
    needs a TPU; off-TPU the call fails after the warning)."""
    import pytest

    from hydrolim_tpu.pde.fast_solve import pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize

    config = PDEConfig(L=256, T=0.04, dt=1e-3, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=1e5 - 10,
                       snapshot_interval=20, n_tracers=16,
                       tracer_window_time=5e-3)
    B = 2
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray([0.5, 1.5]))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    rp, rm, tr = jax.vmap(lambda k: pde_initialize(
        config, k, mode="homogeneous", noise=0.3, n_tracers=16))(keys)
    with pytest.warns(UserWarning, match="chunk-start cadence"):
        try:
            pde_solve_fused(config, params_b, ops, rp, rm, tr,
                            jax.random.PRNGKey(1), engine="pallas")
        except Exception:
            pass        # Mosaic lowering needs a TPU; the warning is the contract
