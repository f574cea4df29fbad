"""Fused-kernel PDE solve runner (ops/pallas_pde.py) — the production fast
path for the PDE sweep drivers.

``pde_solve_fused`` advances the whole (β × runs) batch through the fused
multi-step IMEX kernel, one ``lax.scan`` over snapshot-interval chunks (the
frame loop MUST stay on device: a host-side chunk loop costs a synchronous
tunnel round-trip per chunk on the remote axon backend).  Returns a
``PDESolveResult``-compatible batch: per-step m/Var/v_eff/D_eff records and
snapshot blocks match ``pde/stepper.pde_solve`` semantics (record at state
n, tracer update at n, step masked at n = nsteps).  The rfft record
(``records.fft_ri``) is populated at full PER-STEP cadence whenever
``fft_kmax ≤ 62`` (the kernel streams re/im into the spare record-row
lanes — all the sweep drivers qualify at kmax = 8, matching the
reference's per-step spectra, IMEX_PDE_solver_class.py:248-250); wider
kmax (e.g. the facade's default full rfft) records at chunk-start cadence
(one (B, L) @ (L, 2k) matmul-DFT per chunk; intermediate rows NaN).

The tracer RNG stream differs from the XLA path (on-core Mosaic PRNG,
Box–Muller noise) — statistically equivalent, not bitwise.

Scope (``is_fused_pde_path``): the whole working set — operator matrices
plus per-replica fields/tracer ring — must fit a ~14 MB VMEM budget
(roughly L ≤ 1300 for smooth+dense-solve configs), with uniform γ across
the batch, n_tracers ≥ 1, and nsteps a multiple of snapshot_interval.
Past the dense gate, periodic γ>0 configs stay fused via the BANDED
in-kernel solve (``_solve_mode_of``): the exponentially-decaying inverse
kernel of ops/diffusion.py applies as ≤ 2·63+1 wrap-corrected rolls, so
large-L runs (which scale dt with dx, keeping γ·dt/dx² O(1)) need no
(Lp, Lp) matrix; configs whose band is wider than the roll bound fall
back to the vmapped XLA ``pde_solve`` (as does everything off-TPU,
``engine='auto'``).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import PDEConfig, PDEParams
from hydrolim_tpu.ops import dft
from hydrolim_tpu.ops.convolve import periodic_gaussian_kernel
from hydrolim_tpu.ops.diffusion import build_diffusion_op
from hydrolim_tpu.pde.stepper import (
    PDEOps,
    PDERecord,
    PDESolveResult,
    TracerState,
    _tracer_update,
    magnetization,
    pde_solve,
)


_VMEM_BUDGET = 14 * 2 ** 20      # ~16 MB/core on v5e, minus working margin


_BANDED_R_MAX = 63   # solve rolls per side (shares the narrow-roll bound)


def _solve_mode_of(config: PDEConfig, gamma: float):
    """(solve_mode, solve_r) for the fused kernel.

    'none' for γ=0/identity; 'dense' (exact (Lp, Lp) inverse matmul) while
    the matrix fits the VMEM budget alongside the smoothing operator;
    otherwise 'banded' (VERDICT r2 #7): the truncated inverse kernel of
    ops/diffusion.py applied as 2r+1 wrap-corrected rolls — feasible when
    γ·dt/dx² is small enough that the kernel decays within the roll bound
    (large-L runs scale dt with dx, keeping c = γ·dt/dx² O(1))."""
    from hydrolim_tpu.ops.pallas_pde import _pad

    if config.solver_kind == "identity" or gamma == 0.0:
        return "none", 0
    Lp = _pad(config.L)
    fixed_smooth = 4 * Lp * Lp if _m_mode(config) == "smooth" else 0
    # an EXPLICIT diffusion_solver='banded' is honored even when the dense
    # inverse would fit VMEM (ADVICE r3): the XLA engine applies the
    # truncated banded kernel for that config, and upgrading the fused path
    # to the exact dense solve would give the two engines slightly
    # different numerics for the same user request
    if config.diffusion_solver != "banded" and \
            4 * Lp * Lp + fixed_smooth + 4 * 2 ** 20 <= _VMEM_BUDGET:
        return "dense", 0
    if config.bc != "periodic":
        return "unsupported", 0
    try:
        w = np.asarray(build_diffusion_op(config.L, config.dx, config.dt,
                                          gamma, config.bc, "banded").denom)
    except ValueError:
        return "unsupported", 0
    r = (len(w) - 1) // 2
    if r > _BANDED_R_MAX:
        return "unsupported", 0
    # round up to a multiple of 16 (capped) so nearby γ·dt/dx² values share
    # one compiled kernel — extra taps carry ~zero weight
    return "banded", min(-(-max(r, 1) // 16) * 16, _BANDED_R_MAX)


def build_banded_solve_weights(config: PDEConfig, gamma: float,
                               solve_r: int) -> np.ndarray:
    """(1, 128) float32 — symmetric truncated inverse kernel, w(d) at lane
    solve_r + d (the layout build_narrow_weights uses for smoothing)."""
    from hydrolim_tpu.ops.pallas_pde import LANE

    w = np.asarray(build_diffusion_op(config.L, config.dx, config.dt,
                                      gamma, config.bc, "banded").denom)
    r = (len(w) - 1) // 2
    out = np.zeros((1, LANE), np.float32)
    out[0, solve_r - r:solve_r + r + 1] = w
    return out


def _vmem_estimate(config: PDEConfig, gamma: float, r: int,
                   k_chunk: int) -> int:
    """Bytes of VMEM the kernel needs at r replicas/program: resident
    operator matrices + per-replica state (hist ring dominates) + margin."""
    from hydrolim_tpu.ops.pallas_pde import _pad

    Lp = _pad(config.L)
    Ntp = _pad(max(config.n_tracers, 1))
    Wp = _pad(config.tracer_window, 8)
    mode, solve_r = _solve_mode_of(config, gamma)
    fixed = 4 * Lp * Lp * (int(mode == "dense")
                           + int(_m_mode(config) == "smooth"))
    if _kmax_rec(config) > 0:
        fixed += 4 * Lp * 128          # per-step spectra record slab
    per_rep = 4 * (Wp * Ntp + k_chunk * 128 + 4 * Ntp + 2 * Lp)
    if mode == "banded":
        # the fori_loop tap body keeps a handful of (·, Lp) roll
        # temporaries live (dynamic-shift rolls; NOT the unrolled form,
        # which stacked ~6 temps per tap and overflowed scoped VMEM).
        # Measured scoped stack at (r=32, Lp=8192): ~2.0 MB/replica →
        # ~48 lane-rows of headroom per replica
        per_rep += 4 * Lp * 48
    return fixed + r * per_rep + 2 * 2 ** 20


def is_fused_pde_path(config: PDEConfig, gamma_b) -> bool:
    g = np.asarray(gamma_b)
    return (config.n_tracers >= 1
            and config.nsteps % config.snapshot_interval == 0
            and bool(np.all(g == g.flat[0]))
            and config.solver_kind in ("fft", "dct", "dense", "identity",
                                       "banded")
            and _solve_mode_of(config, float(g.flat[0]))[0] != "unsupported"
            # the whole working set must be VMEM-resident at r=1 — a bare
            # L limit would admit smooth+solve configs whose two (Lp, Lp)
            # matrices alone exceed the core's VMEM and die in Mosaic
            # instead of falling back to the XLA solve
            and _vmem_estimate(config, float(g.flat[0]), 1,
                               config.snapshot_interval) <= _VMEM_BUDGET)


def _m_mode(config: PDEConfig) -> str:
    if not config.gaussian_kernel:
        return "pointwise"
    if config.kernel_sigma > 1e5:
        return "global"
    # A kernel much wider than the domain is uniform to below f32
    # resolution — the reference β-sweep passes σ = 1e5−10, *just under*
    # the >1e5 global sentinel (IMEX_PDE_solver_run_sweep.py:36), i.e.
    # σ_grid = 1e8 sites for L = 1000: the circulant's largest weight
    # deviation is (L/2)²/(2σ_grid²) ≈ 1e-11 ≪ f32 eps.  Routing it to the
    # exact global mean is bit-equivalent at f32 and saves the (Lp, Lp)
    # smoothing matrix (4 MB of VMEM) plus a per-step matmul.
    sigma_grid = config.kernel_sigma / config.dx
    if (config.L / 2.0) ** 2 / (2.0 * sigma_grid * sigma_grid) < 1e-8:
        return "global"
    # A kernel much NARROWER than the domain applies as 2r+1 wrap-corrected
    # rolls (ops/pallas_pde.py 'narrow') — no (Lp, Lp) matrix in VMEM, so
    # the replica-row batch R can grow.  Truncation at 5.7σ leaves < 1e-7
    # relative tail mass (and the normalization cancels in the num/den
    # ratio), far inside the engines' parity tolerance.
    r = _narrow_radius(config)
    if 1 <= r <= _NARROW_R_MAX and 2 * r + 1 < config.L:
        return "narrow"
    return "smooth"


_NARROW_R_MAX = 63   # rolls per side; support must also fit the domain


def _narrow_radius(config: PDEConfig) -> int:
    """Roll radius covering the Gaussian to a relative tail < ~1e-7
    (exp(-r^2 / 2 sigma^2) < 1e-7 at r of about 5.7 sigma), rounded up to
    a multiple of 16 (capped at the narrow bound) so nearby σ values share
    one compiled kernel — the radius is a static kernel parameter, and the
    extra rolls carry ~zero weights (they only improve the truncation)."""
    sigma_grid = config.kernel_sigma / config.dx
    r = int(np.ceil(5.7 * sigma_grid))
    if r <= _NARROW_R_MAX:
        r = min(-(-r // 16) * 16, _NARROW_R_MAX)
    return r


def build_narrow_weights(config: PDEConfig) -> np.ndarray:
    """(1, 128) float32 — symmetric circulant weights, w(d) at lane r+d."""
    from hydrolim_tpu.ops.pallas_pde import LANE

    r = _narrow_radius(config)
    k = periodic_gaussian_kernel(config.L, config.dx, config.kernel_sigma)
    out = np.zeros((1, LANE), np.float32)
    for d in range(-r, r + 1):
        out[0, r + d] = k[d % config.L]
    return out


def _pad_mat(M: np.ndarray, Lp: int) -> np.ndarray:
    out = np.zeros((Lp, Lp), np.float32)
    out[:M.shape[0], :M.shape[1]] = M
    return out


def _kmax_rec(config: PDEConfig) -> int:
    """Per-step in-kernel spectra bins, or 0 when the record row can't hold
    them.  The (128-wide) record row has lanes 4.. free, so kmax ≤ 62 rides
    the per-step stream (the sweep drivers use fft_kmax = 8); wider
    requests (e.g. the facade's default full rfft) stay at chunk-start
    cadence."""
    from hydrolim_tpu.ops.pallas_pde import _REC_W

    k = config.kmax
    return k if k <= (_REC_W - 4) // 2 else 0


def build_fft_record_slab(config: PDEConfig, Lp: int) -> np.ndarray:
    """(Lp, 128) float32 — per-step spectra operator for the fused kernel:
    ``total @ slab`` puts rfft re bins at lanes 4..4+k-1 and im bins at
    4+k..4+2k-1 (im = −x@sin, matching ops/dft.rfft_ri_partial), zeros in
    the scalar lanes 0..3 so the kernel can add it onto the record row."""
    from hydrolim_tpu.ops.pallas_pde import LANE

    k = _kmax_rec(config)
    assert k > 0
    C, S = dft._rfft_mats_partial(config.L, k)
    out = np.zeros((Lp, LANE), np.float32)
    out[:config.L, 4:4 + k] = C
    out[:config.L, 4 + k:4 + 2 * k] = -S
    return out


def build_kernel_mats(config: PDEConfig, gamma: float,
                      Lp: int):
    """(solve_mat, smooth_mat, solve_mode, solve_r, solve_wts) with the
    kernel's ``x @ M`` orientation, zero-padded to (Lp, Lp); placeholders
    for the operators the chosen modes don't need."""
    placeholder = np.zeros((8, 128), np.float32)
    solve_mode, solve_r = _solve_mode_of(config, gamma)
    assert solve_mode != "unsupported"
    solve_mat = placeholder
    solve_wts = np.zeros((1, 128), np.float32)
    if solve_mode == "dense":
        op = build_diffusion_op(config.L, config.dx, config.dt, gamma,
                                config.bc, "dense")
        # dense path applies a_inv @ x (einsum '...j,ij->...i'); the kernel
        # computes x @ M, so ship the transpose
        solve_mat = _pad_mat(np.asarray(op.a_inv).T, Lp)
    elif solve_mode == "banded":
        solve_wts = build_banded_solve_weights(config, gamma, solve_r)
    if _m_mode(config) == "smooth":
        k = periodic_gaussian_kernel(config.L, config.dx, config.kernel_sigma)
        smooth_mat = _pad_mat(
            np.asarray(dft.circulant_matmul_matrix(k)), Lp)
    else:
        smooth_mat = placeholder
    return solve_mat, smooth_mat, solve_mode, solve_r, solve_wts


@functools.partial(
    jax.jit,
    static_argnames=("config", "B", "R", "k_chunk", "n_chunks", "m_mode",
                     "narrow_r", "solve_mode", "solve_r", "has_noise",
                     "keep", "kmax_rec"))
def _run_scanned(config: PDEConfig, scal, seeds0, rho_p, rho_m, pos, spin,
                 hist, solve_mat, smooth_mat, wts, solve_wts, fftC, fftS,
                 fft_slab, *, B: int,
                 R: int, k_chunk: int, n_chunks: int, m_mode: str,
                 narrow_r: int, solve_mode: str, solve_r: int,
                 has_noise: bool, keep: bool, kmax_rec: int):
    """Module-level jitted scan over fused-kernel chunks.

    Everything value-like (scalars, seeds, fields, operator matrices) is a
    TRACED argument — a closure would bake the matrices in as constants and
    force a fresh trace + compile per call, defeating both jit caches for
    e.g. the per-σ sweep loop where only the smoothing matrix changes."""
    from hydrolim_tpu.ops.pallas_pde import pde_multi_step

    L, dt = config.L, config.dt
    Bp = rho_p.shape[0]
    nsteps = n_chunks * k_chunk

    def chunk_body(carry, c):
        rho_p, rho_m, pos, spin, hist = carry
        # Spectra: with kmax_rec > 0 (kmax ≤ 62) the kernel streams rfft
        # re/im into every per-step record row, so no separate chunk
        # transform is needed; otherwise record chunk-start spectra
        # (state n = c·k_chunk) via one (B, L) @ (L, 2k) matmul-DFT per
        # chunk (the reference records per step, IMEX_PDE_solver_class.py
        # :248-250).  The DFT slabs are TRACED args: as closure constants
        # they are ~268 MB at (L=8192, default kmax) and oversize the
        # remote-compile payload.
        total_c = (rho_p + rho_m)[:B, :L]
        if kmax_rec > 0:
            fft_part = ()
        else:
            fft_part = (dft.rfft_ri_with_slab(total_c, fftC, fftS) / L,)
        if keep:
            snaps = (total_c, (rho_p - rho_m)[:B, :L])
        else:
            snaps = ()
        rho_p, rho_m, pos, spin, hist, recs = pde_multi_step(
            scal, seeds0 + c, jnp.full((Bp,), c * k_chunk, jnp.int32),
            rho_p, rho_m, pos, spin, hist, solve_mat, smooth_mat, wts,
            solve_wts, fft_slab, L=L,
            n_t=config.n_tracers, window=config.tracer_window,
            k_steps=k_chunk, r_batch=R, dt=dt, dx=config.dx,
            xlim=config.xlim, periodic=(config.bc == "periodic"),
            m_mode=m_mode, narrow_r=narrow_r, solve_mode=solve_mode,
            solve_r=solve_r,
            bidirectional=(config.active_model == "bidirectional"),
            has_noise=has_noise, kmax_rec=kmax_rec)
        return (rho_p, rho_m, pos, spin, hist), (recs[:B],) + fft_part + snaps

    carry, ys = jax.lax.scan(
        chunk_body, (rho_p, rho_m, pos, spin, hist),
        jnp.arange(n_chunks, dtype=jnp.int32))
    rho_p, rho_m, pos, spin, hist = carry
    rec_w = 4 + 2 * kmax_rec
    # (n_chunks, B, k_chunk, REC_W) -> (B, nsteps, rec_w): lanes
    # [m_mean, var, v_eff, D_eff] + per-step spectra when kmax_rec > 0
    recs = jnp.moveaxis(ys[0][..., :rec_w], 0, 1).reshape(B, nsteps, rec_w)
    i = 1
    if kmax_rec > 0:
        fft_chunks = jnp.zeros((B, n_chunks, 0, 2), jnp.float32)
    else:
        fft_chunks = jnp.moveaxis(ys[i], 0, 1)   # (B, n_chunks, kmax, 2)
        i += 1
    if keep:
        snaps, m_snaps = ys[i], ys[i + 1]
    else:
        snaps = jnp.zeros((0, B, L), jnp.float32)
        m_snaps = jnp.zeros((0, B, L), jnp.float32)
    return rho_p, rho_m, pos, spin, hist, recs, fft_chunks, snaps, m_snaps


def pde_solve_fused(config: PDEConfig, params_b: PDEParams, ops: PDEOps,
                    rho_p0: jnp.ndarray, rho_m0: jnp.ndarray,
                    tracers0: TracerState, key: jnp.ndarray,
                    engine: str = "auto",
                    keep_snapshots: bool = True) -> PDESolveResult:
    """Batched fused solve; same call shape as ``vmap(pde_solve)``.

    Args are batched on the leading axis (B); ``tracers0`` from the vmapped
    ``pde_initialize``.  ``keep_snapshots=False`` skips accumulating the
    per-chunk ρ snapshot blocks (empty arrays in the result) — at reference
    sweep scale they are ~0.4 GB of HBM + host transfer that the sweep
    drivers never read."""
    from hydrolim_tpu.ops.pallas_pde import _pad, pde_multi_step
    from hydrolim_tpu.sweeps.fast_exclusion import default_device_is_tpu

    if engine == "auto":
        # cadence contract (VERDICT r3 #6): 'auto' picks the fused kernel
        # only when it can match the XLA path's PER-STEP spectra (kmax ≤ 62
        # rides the record rows).  Wider kmax (e.g. the facade's default
        # full rfft) routes to XLA so no user config silently drops from
        # per-step to chunk-start fft cadence; opting into the fused speed
        # at wide kmax requires an explicit engine='pallas' (warned below).
        engine = ("pallas" if default_device_is_tpu()
                  and is_fused_pde_path(config, params_b.gamma)
                  and _kmax_rec(config) == config.kmax else "xla")
    if engine == "xla":
        solve = jax.vmap(
            lambda p, rp, rm, tr, k: pde_solve(config, p, ops, rp, rm, tr, k))
        Bx = params_b.beta.shape[0]
        keys = jax.random.split(key, Bx)
        res = solve(params_b, rho_p0, rho_m0, tracers0, keys)
        if not keep_snapshots:
            # honor the empty-(B, 0, L) contract on the fallback too — the
            # flag exists to avoid materializing/transferring the snapshot
            # blocks (~0.4 GB at reference sweep scale)
            res = res._replace(
                snapshots=jnp.zeros((Bx, 0, config.L), jnp.float32),
                m_snapshots=jnp.zeros((Bx, 0, config.L), jnp.float32),
                snap_times=jnp.zeros((Bx, 0), jnp.float32))
        return res

    gamma = float(np.asarray(params_b.gamma).flat[0])
    if _kmax_rec(config) != config.kmax:
        import warnings

        warnings.warn(
            f"engine='pallas' with kmax={config.kmax} > 62: per-step "
            "spectra don't fit the kernel record rows, so records.fft_ri "
            "is populated at chunk-start cadence only (NaN between — "
            "select rows via isfinite).  Set fft_kmax <= 62 for full "
            "per-step spectra on the fused path, or engine='xla'.",
            stacklevel=2)
    assert is_fused_pde_path(config, params_b.gamma), (
        "pde_solve_fused requires the fused-kernel configuration class "
        "(VMEM-resident working set, uniform gamma, tracers, "
        "nsteps % snapshot_interval == 0)")
    B = params_b.beta.shape[0]
    L, dt, dx = config.L, config.dt, config.dx
    Lp = _pad(L)
    n_t = config.n_tracers
    Ntp = _pad(n_t)
    W = config.tracer_window
    interval = config.snapshot_interval
    nsteps = config.nsteps
    (solve_mat, smooth_mat, solve_mode, solve_r,
     solve_wts) = build_kernel_mats(config, gamma, Lp)
    m_mode = _m_mode(config)
    if m_mode == "narrow":
        narrow_r = _narrow_radius(config)
        wts = build_narrow_weights(config)
    else:
        narrow_r = 0
        wts = np.zeros((1, 128), np.float32)
    has_noise = gamma > 0.0

    # Joint (replicas-per-program, steps-per-launch) choice against a
    # ~14 MB VMEM budget (v5e has ~16 MB/core).  Replica-row batching R
    # dominates (it fills VPU sublanes: measured R=4 @ 50-step chunks beats
    # R=2 @ 800-step chunks ~1.6× at the reference sweep shape), so pick
    # the largest feasible R at the snapshot cadence, then — snapshots are
    # only observable at chunk boundaries, so only when keep_snapshots is
    # off — grow the chunk while that R still fits (fewer kernel launches,
    # shorter scan).  The per-step record rows (k_chunk × 128 lanes) are
    # what the chunk growth pays for.
    Wp = _pad(W, 8)

    def max_r(kc: int) -> int:
        # The implicit solve is one (2R, Lp) @ (Lp, Lp) matmul per step, so
        # MXU row utilization is ~2R/128: R=8 tops out at ~12% of the f32
        # roofline no matter the batch.  The wide candidates (16/32) exist
        # for chip-filling batches (B ≥ hundreds, e.g. the phase-diagram
        # grid); they are gated on replica padding ≤ ~25% so a reference
        # 33-replica sweep keeps R=8 (R=32 would pad it to 64).
        for cand in (32, 16, 8, 4, 2):
            if cand > 8 and -(-B // cand) * cand > B + max(B // 4, 8):
                continue
            if _vmem_estimate(config, gamma, cand, kc) <= _VMEM_BUDGET:
                return cand
        return 1

    k_chunk = interval
    R = max_r(interval)
    if not keep_snapshots:
        # Snapshots are the only consumer of the chunk cadence, so the
        # (R, k_chunk) choice is free.  R dominates throughput (it fills
        # VPU sublanes / MXU rows: measured R=4 @ 50-step chunks beats
        # R=2 @ 800-step chunks ~1.6×), and the per-step record block
        # (k_chunk·128·4 B per replica, VMEM-resident) is what gates R —
        # so SHRINK the chunk below the snapshot interval if that buys a
        # larger R (floor 64 steps: launch overhead amortizes by then),
        # then grow the chunk while the chosen R still fits.
        kc_min = k_chunk
        while kc_min % 2 == 0 and kc_min // 2 >= 64 \
                and nsteps % (kc_min // 2) == 0:
            kc_min //= 2
        if max_r(kc_min) > R:
            R = max_r(kc_min)
            k_chunk = kc_min
        # growth must re-check the budget at R itself: max_r() returns 1 as
        # an unvalidated floor, so `max_r(kc*2) == R` alone is vacuous at
        # R == 1 and would grow the per-step record rows past the budget
        # the is_fused_pde_path gate enforced
        while (k_chunk * 2 <= 1024 and nsteps % (k_chunk * 2) == 0
               and max_r(k_chunk * 2) == R
               and _vmem_estimate(config, gamma, R,
                                  k_chunk * 2) <= _VMEM_BUDGET):
            k_chunk *= 2
    n_chunks = nsteps // k_chunk
    Bp = -(-B // R) * R          # pad replicas to a multiple of R
    rep_idx = jnp.arange(Bp) % B

    scal = np.zeros((B, 4), np.float32)
    scal[:, 0] = np.asarray(params_b.beta)
    scal[:, 1] = np.asarray(params_b.lam)
    scal[:, 2] = np.sqrt(2.0 * gamma * dt)
    k_seed, k_final = jax.random.split(key)
    seeds0 = jax.random.randint(k_seed, (Bp,), 0,
                                2 ** 31 - 1 - n_chunks - 1, dtype=jnp.int32)

    def pad_to(x, n, axis=-1):
        pad = n - x.shape[axis]
        if pad <= 0:
            return jnp.asarray(x, jnp.float32)
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(jnp.asarray(x, jnp.float32), widths)

    wrap = lambda x: jnp.asarray(x, jnp.float32)[rep_idx]
    rho_p = wrap(pad_to(rho_p0, Lp))
    rho_m = wrap(pad_to(rho_m0, Lp))
    pos = wrap(pad_to(tracers0.unwrapped, Ntp))
    spin = wrap(pad_to(tracers0.spin.astype(jnp.float32), Ntp))
    hist = wrap(pad_to(pad_to(tracers0.hist, Ntp), Wp, axis=-2))

    solve_j = jnp.asarray(solve_mat)
    smooth_j = jnp.asarray(smooth_mat)
    scal_j = jnp.asarray(scal)[rep_idx]
    fftC_np, fftS_np = dft._rfft_mats_partial(L, config.kmax)
    fftC, fftS = jnp.asarray(fftC_np), jnp.asarray(fftS_np)
    kmax_rec = _kmax_rec(config)
    fft_slab = (jnp.asarray(build_fft_record_slab(config, Lp))
                if kmax_rec > 0 else jnp.zeros((8, 128), jnp.float32))

    (rho_p, rho_m, pos, spin, hist, recs, fft_chunks, snaps,
     m_snaps) = _run_scanned(
        config, scal_j, seeds0, rho_p, rho_m, pos, spin, hist, solve_j,
        smooth_j, jnp.asarray(wts), jnp.asarray(solve_wts), fftC, fftS,
        fft_slab, B=B, R=R,
        k_chunk=k_chunk, n_chunks=n_chunks, m_mode=m_mode,
        narrow_r=narrow_r, solve_mode=solve_mode, solve_r=solve_r,
        has_noise=has_noise, keep=keep_snapshots, kmax_rec=kmax_rec)

    # final iteration (n = nsteps): record + tracer update, no step —
    # mirrors pde_solve's masked last iteration on the XLA path
    rho_p_f = rho_p[:B, :L]
    rho_m_f = rho_m[:B, :L]
    tr_f = TracerState(
        pos=jnp.mod(pos[:B, :n_t], config.xlim),
        unwrapped=pos[:B, :n_t],
        spin=spin[:B, :n_t].astype(jnp.int32),
        hist=hist[:B, :W, :n_t])

    @jax.jit
    def final_record(rho_p, rho_m, tr, key, fftC, fftS):
        def one(p, rp, rm, t, k):
            m_field = magnetization(config, ops, rp, rm)
            total = rp + rm
            _, v_eff, D_eff = _tracer_update(config, p, m_field, t, k,
                                             jnp.int32(nsteps))
            return (jnp.mean(m_field), jnp.var(total), v_eff, D_eff,
                    total, rp - rm,
                    dft.rfft_ri_with_slab(total, fftC, fftS) / L)
        keys = jax.random.split(key, B)
        return jax.vmap(one)(params_b, rho_p, rho_m, tr, keys)

    m_f, var_f, v_f, D_f, snap_f, snap_m_f, fft_f = final_record(
        rho_p_f, rho_m_f, tr_f, k_final, fftC, fftS)

    n_iters = nsteps + 1
    m_mean = jnp.concatenate([recs[:, :, 0], m_f[:, None]], axis=1)
    var = jnp.concatenate([recs[:, :, 1], var_f[:, None]], axis=1)
    v_eff = jnp.concatenate([recs[:, :, 2], v_f[:, None]], axis=1)
    D_eff = jnp.concatenate([recs[:, :, 3], D_f[:, None]], axis=1)
    if keep_snapshots:
        # snapshots: chunk starts + the final state (pde_solve block
        # semantics: n_blocks = ceil(n_iters / interval) block-start states)
        snaps = jnp.concatenate([jnp.moveaxis(snaps, 0, 1),
                                 snap_f[:, None]], 1)
        m_snaps = jnp.concatenate(
            [jnp.moveaxis(m_snaps, 0, 1), snap_m_f[:, None]], 1)
        snap_times = jnp.broadcast_to(
            jnp.arange(n_chunks + 1, dtype=jnp.float32) * (interval * dt),
            (B, n_chunks + 1))
    else:
        snaps = jnp.zeros((B, 0, L), jnp.float32)
        m_snaps = jnp.zeros((B, 0, L), jnp.float32)
        snap_times = jnp.zeros((B, 0), jnp.float32)

    if kmax_rec > 0:
        # PER-STEP spectra (kmax ≤ 62): the kernel streams rfft re/im into
        # every record row — full reference cadence
        # (IMEX_PDE_solver_class.py:248-250) on the fused path.
        per = jnp.stack([recs[:, :, 4:4 + kmax_rec],
                         recs[:, :, 4 + kmax_rec:4 + 2 * kmax_rec]],
                        axis=-1)                     # (B, nsteps, k, 2)
        fft_ri = jnp.concatenate([per, fft_f[:, None]], axis=1)
    else:
        # wide kmax: spectra at CHUNK-START cadence — rows n = c·k_chunk +
        # the final state; all other rows stay NaN.  k_chunk == interval
        # when keep_snapshots is True, so the populated rows are exactly
        # the snapshot steps; with keep_snapshots=False the chunk may have
        # grown (×2 steps from interval, ≤1024), so populated rows are a
        # coarser SUBSET of the snapshot steps — consumers select rows via
        # isfinite.
        fft_ri = jnp.full((B, n_iters, config.kmax, 2), jnp.nan,
                          jnp.float32)
        chunk_steps = jnp.arange(n_chunks) * k_chunk
        fft_ri = fft_ri.at[:, chunk_steps].set(fft_chunks)
        fft_ri = fft_ri.at[:, nsteps].set(fft_f)
    records = PDERecord(
        m_mean=m_mean, var=var, fft_ri=fft_ri, v_eff=v_eff, D_eff=D_eff)
    if config.record_every > 1:
        # same per-step thinning as pde_solve (records axis 1 here); note
        # populated fft rows are chunk-start cadence, so thinned rows may
        # all be NaN unless record_every divides the chunk stride
        records = jax.tree.map(lambda a: a[:, ::config.record_every],
                               records)
    return PDESolveResult(rho_p=rho_p_f, rho_m=rho_m_f, records=records,
                          snapshots=snaps, m_snapshots=m_snaps,
                          snap_times=snap_times)
