"""Pallas TPU kernel: fused multi-step IMEX PDE solver with tracers.

The XLA solve (pde/stepper.py) pays ~8 MB of HBM matrix reads per step (the
(L,L) smoothing circulant + the (L,L) implicit-diffusion inverse) plus a
slow 1000-element tracer gather — ~45 µs/step single-replica on v5e where
the arithmetic is ~1 µs.  This kernel keeps both operator matrices, the ρ±
fields, the tracer ensemble and its windowed-displacement ring buffer
resident in VMEM across K_STEPS steps, and batches R replicas per grid
program so the VPU's 8 sublanes and the MXU's rows are actually occupied
(a single-replica program runs (1, L) row vectors at ~1/8 sublane
utilization; the operator matrices are shared across the R replicas):

- implicit diffusion: one ``(2R, Lp) @ (Lp, Lp)`` HIGHEST-precision matmul
  (the dense inverse of ``I − γ·dt·D/dx²`` — IMEX_PDE_solver_class.py:68-82;
  bf16 would freeze the dynamics, see ops/dft.py),
- magnetization: pointwise / global / one smoothing matmul, shared by the
  recorder, the tracer flips and the reaction (pre-diffusion densities,
  :198),
- upwind advection + CW reaction + positivity clip + mass renorm
  (:187-233), both ``bidirectional`` and ``anchored_minus`` branches (the
  reference's "double solve" :207-208 re-reads unchanged fields — a
  no-op, so a single solve is bit-faithful; see pde/stepper.py),
- tracer SDE (:256-287): flip Bernoulli(c·dt) with m gathered at tracer
  sites via a one-hot matmul (Mosaic has no vector gather; skipped
  entirely in global-m mode where m is spatially constant), Euler–Maruyama
  advance with in-kernel Box–Muller noise, windowed v_eff/D_eff from a
  (window, n_t) circular buffer carried across invocations,
- per-step records streamed to HBM as (R, K_STEPS, 128) blocks:
  [m_mean, Var, v_eff, D_eff, 0…] per lane row.

Scope: bounded by VMEM (pde/fast_solve.is_fused_pde_path estimates it);
larger L stays on the XLA path (banded large-L solvers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# record row: [m_mean, var, v_eff, D_eff, pad…].  Full 128-lane width —
# Mosaic cannot dynamically sub-slice a ref narrower than one lane tile.
_REC_W = LANE


def _pad(n: int, mult: int = LANE) -> int:
    return -(-n // mult) * mult


def _kernel(scalv_ref, seed_ref, step0_ref, wts_ref, swts_ref, rhop_ref,
            rhom_ref, pos_ref, spin_ref, hist_ref, solve_ref, smooth_ref,
            fft_ref, rhop_out, rhom_out, pos_out, spin_out, hist_out,
            recs_ref, *,
            L: int, Lp: int, n_t: int, Ntp: int, window: int, k_steps: int,
            R: int, dt: float, dx: float, xlim: float, periodic: bool,
            m_mode: str, narrow_r: int, solve_mode: str, solve_r: int,
            bidirectional: bool,
            has_noise: bool, kmax_rec: int, noise_ref=None):
    g = pl.program_id(0)
    beta = scalv_ref[:, 0:1]          # (R, 1) per-replica scalars
    lam = scalv_ref[:, 1:2]
    noise_amp = scalv_ref[:, 2:3]
    # noise_ref != None = injected-randomness mode (VERDICT r3 #3): a
    # (k_steps, 3, R, Ntp) uint32 ref of pre-drawn bits (slots: flip, BM-u2,
    # BM-u3) replaces the on-core PRNG so the whole body runs under
    # interpret=True on CPU (pltpu.prng_* has no interpreter lowering).
    if noise_ref is None:
        pltpu.prng_seed(seed_ref[g], g)
    n0 = step0_ref[g]

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1)
    laneT = jax.lax.broadcasted_iota(jnp.int32, (1, Ntp), 1)
    valid1 = (lane1 < L).astype(jnp.float32)
    validT = (laneT < n_t).astype(jnp.float32)
    inv_L = jnp.float32(1.0 / L)
    inv_nt = jnp.float32(1.0 / max(n_t, 1))

    def shift_right1(x, fill):
        """out[i] = x[i-1] on the L-site topology (rows = replicas)."""
        plain = pltpu.roll(x, 1, axis=1)
        if periodic:
            out = jnp.where(lane1 == 0, pltpu.roll(x, Lp - L + 1, axis=1),
                            plain)
        else:
            out = jnp.where(lane1 == 0, fill, plain)
        return jnp.where(lane1 < L, out, fill)

    def shift_left1(x, fill):
        """out[i] = x[i+1] on the L-site topology."""
        plain = pltpu.roll(x, Lp - 1, axis=1)
        if periodic:
            out = jnp.where(lane1 == L - 1, pltpu.roll(x, L - 1, axis=1),
                            plain)
        else:
            out = jnp.where(lane1 >= L - 1, fill, plain)
        return jnp.where(lane1 < L, out, fill)

    def upwind(f, direction):
        """One-sided difference (pde/stepper.py:81-93)."""
        if direction > 0:
            d = (f - shift_right1(f, 0.0)) / dx
            if not periodic:
                d = jnp.where(lane1 == 0, 0.0, d)
        else:
            d = (shift_left1(f, 0.0) - f) / dx
            if not periodic:
                d = jnp.where(lane1 == L - 1, 0.0, d)
        return d * valid1

    def cw(s, m):
        return jnp.clip(jnp.exp(-beta * s * m), 1e-8, 1e8)

    def uniform(s, j):
        """Draw j (0 = tracer flip, 1/2 = Box–Muller) of step s.  On the
        PRNG path s/j are ignored — call order defines the stream, and the
        injected path reads the same (step, draw) slots in the same order."""
        if noise_ref is None:
            bits = pltpu.prng_random_bits((R, Ntp))
        else:
            bits = noise_ref[pl.ds(s, 1)][0, j]
        # int32 before the float cast: Mosaic rejects uint32->f32 (hit on
        # the injected-noise path); value-identical after the 24-bit mask
        return (bits.astype(jnp.int32) & np.int32(0x00FFFFFF)
                ).astype(jnp.float32) * jnp.float32(2.0 ** -24)

    def row_sum(x, mask):
        return jnp.sum(x * mask, axis=1, keepdims=True)     # (R, 1)

    def roll_l(x, d):
        """out[i] = x[(i - d) mod L] — the circular-convolution shift on
        the L-site torus embedded in Lp padded lanes (static d)."""
        dp = d % L
        if dp == 0:
            return x
        plain = pltpu.roll(x, dp, axis=1)
        fix = pltpu.roll(x, (dp + Lp - L) % Lp, axis=1)
        return jnp.where(lane1 < dp, fix, plain)

    def apply_solve(rho_p, rho_m):
        """Implicit diffusion (I − γ·dt·D/dx²)⁻¹ on both fields."""
        if solve_mode == "dense":
            pack2 = jnp.concatenate([rho_p, rho_m], axis=0)     # (2R, Lp)
            sol = jax.lax.dot_general(
                pack2, solve_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return sol[:R], sol[R:]
        if solve_mode == "banded":
            # large-L scale path (VERDICT r2 #7): the inverse kernel decays
            # exponentially (ops/diffusion.py 'banded'), so the solve is a
            # 2·solve_r+1-tap wrap-corrected roll convolution — no (Lp, Lp)
            # matrix in VMEM; admits L far past the dense gate whenever
            # γ·dt/dx² is small enough that solve_r ≤ the roll bound.
            # The tap loop is a fori_loop with DYNAMIC roll shifts, not a
            # Python unroll: Mosaic allocates stack for every op of a
            # straight-line body without liveness reuse, and the unrolled
            # form's ~6 live (·, Lp) temporaries per tap overflowed scoped
            # VMEM at L=8192 (measured 31.5 MB at r=32, R=1)
            def roll_l_dyn(x, s):
                # out[i] = x[(i - s) mod L] for dynamic s in [0, L)
                plain = pltpu.roll(x, s, axis=1)
                fix = pltpu.roll(x, jax.lax.rem(s + Lp - L, Lp), axis=1)
                return jnp.where(lane1 < s, fix, plain)

            def conv(x):
                def tap(d, y):
                    w = swts_ref[0, solve_r + d]      # symmetric kernel
                    y = y + w * roll_l_dyn(x, d)
                    return y + w * roll_l_dyn(x, L - d)

                y0 = swts_ref[0, solve_r] * x
                return jax.lax.fori_loop(1, solve_r + 1, tap, y0) * valid1

            return conv(rho_p), conv(rho_m)
        return rho_p, rho_m

    def body(s, carry):
        rho_p, rho_m, pos_u, spin = carry
        n = n0 + s

        # -- magnetization of the pre-step densities (shared) --------------
        num = rho_p - rho_m
        den = rho_p + rho_m
        if m_mode == "smooth":
            pack = jnp.concatenate([num, den], axis=0)          # (2R, Lp)
            sm = jax.lax.dot_general(
                pack, smooth_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            m = sm[:R] / (sm[R:] + 1e-12)                       # (R, Lp)
        elif m_mode == "narrow":
            # small-σ circulant as 2r+1 wrap-corrected rolls — no (Lp, Lp)
            # matrix in VMEM; the common normalization cancels in the ratio
            sm_n = wts_ref[0, narrow_r] * num
            sm_d = wts_ref[0, narrow_r] * den
            for d in range(1, narrow_r + 1):
                w = wts_ref[0, narrow_r + d]       # symmetric: w(-d)=w(d)
                sm_n = sm_n + w * (roll_l(num, d) + roll_l(num, -d))
                sm_d = sm_d + w * (roll_l(den, d) + roll_l(den, -d))
            m = sm_n / (sm_d + 1e-12)                           # (R, Lp)
        elif m_mode == "global":
            # spatially constant — carry as a (R, 1) column, broadcast late
            m = row_sum(num, valid1) / (row_sum(den, valid1) + 1e-12)
        else:                                                    # pointwise
            m = num / (den + 1e-12)

        # -- per-step records (state n) -------------------------------------
        if m_mode == "global":
            m_mean = m
        else:
            m_mean = row_sum(m, valid1) * inv_L                 # (R, 1)
        t_mean = row_sum(den, valid1) * inv_L
        var = row_sum((den - t_mean) ** 2, valid1) * inv_L

        # -- tracer SDE (:256-287) ------------------------------------------
        if m_mode == "global":
            m_tr = jnp.broadcast_to(m, (R, Ntp))
        else:
            pos_w = jnp.mod(pos_u, jnp.float32(xlim))
            idx = jnp.mod((pos_w / dx).astype(jnp.int32), L)    # (R, Ntp)
            # one-hot gather m_tr[r, j] = m[r, idx[r, j]] (no vector gather
            # on Mosaic): per-replica m[r] @ P_r in 256-row chunks so the
            # peak one-hot intermediate is (256, Ntp) ≈ 1 MB on top of the
            # resident operator matrices
            chunk = 256
            rows_tr = []
            for r in range(R):
                m_tr_r = jnp.zeros((1, Ntp), jnp.float32)
                idx_r = idx[r:r + 1]
                for c0 in range(0, Lp, chunk):
                    cw_ = min(chunk, Lp - c0)                   # tail < 256
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (cw_, Ntp), 0) + c0
                    Pc = (rows == jnp.broadcast_to(idx_r, (cw_, Ntp))
                          ).astype(jnp.float32)
                    # HIGHEST: the default lowers m to bf16, a systematic
                    # ~2e-3 perturbation of every tracer flip rate
                    m_tr_r = m_tr_r + jax.lax.dot_general(
                        m[r:r + 1, c0:c0 + cw_], Pc,
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)     # (1, Ntp)
                rows_tr.append(m_tr_r)
            m_tr = jnp.concatenate(rows_tr, axis=0)             # (R, Ntp)
        rate = cw(spin, m_tr)
        flip = uniform(s, 0) < rate * dt
        spin = jnp.where(flip, -spin, spin)
        if has_noise:
            u2 = jnp.maximum(uniform(s, 1), jnp.float32(1e-12))
            u3 = uniform(s, 2)
            z = jnp.sqrt(-2.0 * jnp.log(u2)) * jnp.cos(
                jnp.float32(2.0 * np.pi) * u3)
            pos_u = pos_u + lam * spin * dt + noise_amp * z
        else:
            pos_u = pos_u + lam * spin * dt

        # read the slot being overwritten FIRST: it holds u_{n+1-window}
        # (written `window` iterations ago), so dr spans exactly `window`
        # steps — matching the window*dt divisor (pde/stepper._tracer_update)
        slot = jnp.mod(n, window)
        old = hist_out[:, pl.ds(slot, 1), :]
        hist_out[:, pl.ds(slot, 1), :] = pos_u[:, None, :]
        dr = (pos_u - jnp.reshape(old, (R, Ntp))) * validT
        mean_dr = jnp.sum(dr, axis=1, keepdims=True) * inv_nt   # (R, 1)
        var_dr = jnp.sum((dr - mean_dr) ** 2 * validT, axis=1,
                         keepdims=True) * inv_nt
        w_valid = n >= window
        v_eff = jnp.where(w_valid, mean_dr / (window * dt), jnp.nan)
        D_eff = jnp.where(w_valid, var_dr / (2.0 * window * dt), jnp.nan)

        rec_lane = jax.lax.broadcasted_iota(jnp.int32, (R, 1, _REC_W), 2)
        row = jnp.where(rec_lane == 0, m_mean[:, :, None],
                        jnp.where(rec_lane == 1, var[:, :, None],
                                  jnp.where(rec_lane == 2, v_eff[:, :, None],
                                            jnp.where(rec_lane == 3,
                                                      D_eff[:, :, None],
                                                      0.0))))
        if kmax_rec > 0:
            # per-step spectra: one (R, Lp) @ (Lp, 128) matmul against the
            # record slab (cos columns at lanes 4..4+k-1, -sin at
            # 4+k..4+2k-1, zeros elsewhere — so the add below leaves the
            # scalar lanes untouched).  HIGHEST: bf16 spectra would carry an
            # 8-bit mantissa vs the XLA path's f32 DFT.
            fft_row = jax.lax.dot_general(
                den, fft_ref[:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) * inv_L     # (R, 128)
            row = row + fft_row[:, None, :]
        recs_ref[:, pl.ds(s, 1), :] = row

        # -- IMEX step (:187-233) -------------------------------------------
        rho_p1, rho_m1 = apply_solve(rho_p, rho_m)
        if bidirectional:
            adv_p = -lam * upwind(rho_p1, +1)
            adv_m = +lam * upwind(rho_m1, -1)
            R_p = cw(-1.0, m) * rho_m1 - cw(+1.0, m) * rho_p1
            rho_p2 = jnp.maximum(rho_p1 + dt * (adv_p + R_p), 0.0)
            rho_m2 = jnp.maximum(rho_m1 + dt * (adv_m - R_p), 0.0)
        else:                            # anchored_minus (:205-227)
            # NB the reference's second solve call (:207-208) re-reads the
            # UNCHANGED pre-step fields — identical result, no A^-2; the
            # single solve above is bit-faithful (legacy_double_diffusion
            # is an accepted no-op; see pde/stepper.pde_step)
            R_p = cw(-1.0, m) * rho_m1 - cw(+1.0, m) * rho_p1
            rho_p_star = jnp.maximum(rho_p1 + dt * R_p, 0.0)
            rho_m2 = jnp.maximum(rho_m1 - dt * R_p, 0.0)
            adv_p = -lam * upwind(rho_p_star, +1)
            rho_p2 = jnp.maximum(rho_p_star + dt * adv_p, 0.0)
        rho_p2 = rho_p2 * valid1
        rho_m2 = rho_m2 * valid1

        M0 = row_sum(rho_p1 + rho_m1, valid1)                   # (R, 1)
        M1 = jnp.sum(rho_p2 + rho_m2, axis=1, keepdims=True)
        scale = M0 / jnp.maximum(M1, 1e-30)
        return rho_p2 * scale, rho_m2 * scale, pos_u, spin

    hist_out[:] = hist_ref[:]
    rho_p, rho_m, pos_u, spin = jax.lax.fori_loop(
        0, k_steps, body,
        (rhop_ref[:], rhom_ref[:], pos_ref[:], spin_ref[:]))
    rhop_out[:] = rho_p
    rhom_out[:] = rho_m
    pos_out[:] = pos_u
    spin_out[:] = spin


@functools.partial(
    jax.jit,
    static_argnames=("L", "n_t", "window", "k_steps", "r_batch", "dt", "dx",
                     "xlim", "periodic", "m_mode", "narrow_r", "solve_mode",
                     "solve_r", "bidirectional",
                     "has_noise", "kmax_rec", "interpret"))
def pde_multi_step(scal: jnp.ndarray, seeds: jnp.ndarray, step0: jnp.ndarray,
                   rho_p: jnp.ndarray, rho_m: jnp.ndarray, pos: jnp.ndarray,
                   spin: jnp.ndarray, hist: jnp.ndarray,
                   solve_mat: jnp.ndarray, smooth_mat: jnp.ndarray,
                   wts: jnp.ndarray | None = None,
                   solve_wts: jnp.ndarray | None = None,
                   fft_slab: jnp.ndarray | None = None, *,
                   L: int, n_t: int, window: int, k_steps: int,
                   r_batch: int = 1, dt: float, dx: float, xlim: float,
                   periodic: bool, m_mode: str, narrow_r: int = 0,
                   solve_mode: str, solve_r: int = 0, bidirectional: bool,
                   has_noise: bool = True, kmax_rec: int = 0,
                   noise=None, interpret: bool = False):
    """Advance K_STEPS IMEX steps (fields + tracers) fully on-chip.

    Args:
      scal: (B, 4) float32 [beta, lam, sqrt(2·γ·dt), pad] per replica.
      seeds: (B,) int32 — pass ``base + chunk_index`` per invocation; one
        seed per grid program (every ``r_batch``-th entry) is consumed.
      step0: (B,) int32 global step offset (window validity + hist ring).
      rho_p / rho_m: (B, Lp) float32 ρ± fields (pad lanes zero).
      pos: (B, Ntp) float32 unwrapped tracer positions.
      spin: (B, Ntp) float32 tracer spins ±1.
      hist: (B, Wp, Ntp) float32 circular unwrapped buffer, rows padded to
        Wp = window rounded up to a multiple of 8 (Mosaic sublane tiling);
        ring arithmetic stays modulo ``window``, rows ≥ window are unused.
      solve_mat: (Lp, Lp) — ``x @ M`` applies the implicit-diffusion inverse
        (pass a (8, 128) zero placeholder unless solve_mode == 'dense').
      smooth_mat: (Lp, Lp) — ``x @ M`` circular smoothing (placeholder
        unless m_mode == 'smooth').
      wts: (1, LANE) float32 — for m_mode == 'narrow', the symmetric
        circulant weights centered at lane ``narrow_r`` (w(d) at lane
        narrow_r + d); None/placeholder otherwise.  Narrow mode applies
        the small-σ smoothing as 2·narrow_r+1 wrap-corrected rolls and
        needs no (Lp, Lp) matrix in VMEM.
      solve_wts: (1, LANE) float32 — for solve_mode == 'banded', the
        symmetric truncated inverse kernel of (I − γ·dt·D/dx²) centered at
        lane ``solve_r`` (ops/diffusion.py 'banded'); None otherwise.
        Banded mode is the large-L scale path: the solve applies as
        2·solve_r+1 rolls, so no (Lp, Lp) matrix gates the VMEM budget.
      fft_slab: (Lp, 128) float32 — for ``kmax_rec > 0``, the per-step
        spectra record slab (pde/fast_solve.build_fft_record_slab): cos
        columns at lanes 4..4+k-1, −sin at 4+k..4+2k-1, zeros elsewhere;
        each step appends rfft re/im (÷L) of the total density to the
        record row.  Requires kmax_rec ≤ (128−4)//2 = 62.
      r_batch: replicas per grid program (B must divide evenly); the
        operator matrices are shared within a program, and row-batching
        fills the VPU sublanes / MXU rows a single replica leaves idle.
      noise: optional (G, k_steps, 3, R, Ntp) uint32 pre-drawn random bits
        (per-step slots: tracer flip, Box–Muller u2, u3) consumed instead
        of the on-core PRNG — the CPU/interpret validation path (VERDICT
        r3 #3).  None on the production TPU path.

    Returns (rho_p, rho_m, pos, spin, hist, recs) with recs
    (B, k_steps, 128) float32 rows [m_mean, Var, v_eff, D_eff, spectra…]
    (NaN v/D before the first full window, like the XLA path; lanes
    4..4+2·kmax_rec carry the per-step rfft re/im when enabled)."""
    B, Lp = rho_p.shape
    Ntp = pos.shape[-1]
    R = r_batch
    Wp = _pad(window, 8)   # Mosaic sublane tiling: block rows must be 8-aligned
    assert Lp == _pad(L) and Ntp == _pad(max(n_t, 1))
    assert hist.shape[-2] == Wp, (hist.shape, Wp)
    assert B % R == 0, (B, R)
    G = B // R
    grid = (G,)
    assert solve_mode in ("none", "dense", "banded"), solve_mode
    assert solve_mode != "banded" or (1 <= solve_r < LANE // 2 and periodic)
    assert 0 <= kmax_rec <= (_REC_W - 4) // 2, kmax_rec
    kernel = functools.partial(
        _kernel, L=L, Lp=Lp, n_t=n_t, Ntp=Ntp, window=window,
        k_steps=k_steps, R=R, dt=dt, dx=dx, xlim=xlim, periodic=periodic,
        m_mode=m_mode, narrow_r=narrow_r, solve_mode=solve_mode,
        solve_r=solve_r, bidirectional=bidirectional,
        has_noise=has_noise,
        kmax_rec=kmax_rec)
    if wts is None:
        wts = jnp.zeros((1, LANE), jnp.float32)
    if solve_wts is None:
        solve_wts = jnp.zeros((1, LANE), jnp.float32)
    if fft_slab is None:
        fft_slab = jnp.zeros((8, LANE), jnp.float32)

    # per-replica scalars as a VMEM (G, R, LANE) array: lanes 0..3 hold
    # [beta, lam, noise_amp]; the kernel column-slices (R, 1) blocks.
    # Replica-major arrays are reshaped (B, …) → (G, R, …) so every block
    # is (1, R, …): Mosaic only constrains the LAST TWO dims of a block
    # (divisible by (8, 128) or equal to the array dims) — a flat (R, …)
    # block with R ∉ {8, 16, …} would be rejected.
    scalv = jnp.pad(jnp.asarray(scal, jnp.float32),
                    ((0, 0), (0, LANE - scal.shape[1])))
    seeds_g = jnp.asarray(seeds, jnp.int32)[::R]
    step0_g = jnp.asarray(step0, jnp.int32)[::R]

    def gshape(x):
        return x.reshape((G, R) + x.shape[1:])

    inject = noise is not None

    def squeeze(scalv, seed, step0, wts, swts, rp, rm, pos, spin, hist,
                solve, smooth, fft, *rest):
        if inject:
            nz, rp_o, rm_o, pos_o, spin_o, hist_o, recs = rest
            nz_ref = nz.at[0]
        else:
            rp_o, rm_o, pos_o, spin_o, hist_o, recs = rest
            nz_ref = None
        kernel(scalv.at[0], seed, step0, wts, swts, rp.at[0], rm.at[0],
               pos.at[0], spin.at[0], hist.at[0], solve, smooth, fft,
               rp_o.at[0], rm_o.at[0], pos_o.at[0], spin_o.at[0],
               hist_o.at[0], recs.at[0], noise_ref=nz_ref)

    bspec = lambda shape: pl.BlockSpec(
        (1, R) + shape, lambda g: (g, 0) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    mspec = lambda m: pl.BlockSpec(m.shape, lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        bspec((LANE,)),
        pl.BlockSpec((G,), lambda g: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((G,), lambda g: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANE), lambda g: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANE), lambda g: (0, 0),
                     memory_space=pltpu.SMEM),
        bspec((Lp,)),
        bspec((Lp,)),
        bspec((Ntp,)),
        bspec((Ntp,)),
        bspec((Wp, Ntp)),
        mspec(solve_mat),
        mspec(smooth_mat),
        mspec(fft_slab),
    ]
    if inject:
        in_specs.append(pl.BlockSpec(
            (1, k_steps, 3, R, Ntp), lambda g: (g, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        squeeze,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            bspec((Lp,)),
            bspec((Lp,)),
            bspec((Ntp,)),
            bspec((Ntp,)),
            bspec((Wp, Ntp)),
            bspec((k_steps, _REC_W)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R, Lp), jnp.float32),
            jax.ShapeDtypeStruct((G, R, Lp), jnp.float32),
            jax.ShapeDtypeStruct((G, R, Ntp), jnp.float32),
            jax.ShapeDtypeStruct((G, R, Ntp), jnp.float32),
            jax.ShapeDtypeStruct((G, R, Wp, Ntp), jnp.float32),
            jax.ShapeDtypeStruct((G, R, k_steps, _REC_W), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3, 9: 4},
        interpret=interpret,
    )(gshape(scalv), seeds_g, step0_g, jnp.asarray(wts, jnp.float32),
      jnp.asarray(solve_wts, jnp.float32),
      gshape(rho_p), gshape(rho_m),
      gshape(pos), gshape(spin), gshape(hist),
      jnp.asarray(solve_mat, jnp.float32),
      jnp.asarray(smooth_mat, jnp.float32),
      jnp.asarray(fft_slab, jnp.float32),
      *([jnp.asarray(noise, jnp.uint32)] if inject else []))
    rp_o, rm_o, pos_o, spin_o, hist_o, recs = out
    ung = lambda x: x.reshape((B,) + x.shape[2:])
    return (ung(rp_o), ung(rm_o), ung(pos_o), ung(spin_o), ung(hist_o),
            ung(recs))
