"""Pallas TPU kernel: fused multi-step EXCLUSION stepper (slot engine).

Completes the kernel layer of SURVEY.md §2.5 row 5: round 1 fused only the
mean-field path (ops/pallas_stepper.py); the exclusion/lattice-gas paths ran
as per-step XLA programs, paying one dispatch + HBM round-trip per Δt step.
This kernel runs K_STEPS of the site-centric slot engine
(particles/lattice_gas_k.py — same generator, same admission rule) entirely
in VMEM:

- state: signed slot payloads ``(K, Lp)`` int32 — K sublanes × Lp lanes (L
  padded to a lane multiple); sign = spin, magnitude = particle identity
  (1 for anonymous fields, ``id+1`` for tagged/tracer runs — payloads move
  and compact intact, so identities survive every step); padding lanes are
  masked out of every rate/move,
- magnetization: global-m reduction, or local smoothing as ONE MXU matmul
  ``(2, Lp) @ (Lp, Lp)`` against a precomputed conv matrix that matches
  ``ops.convolve`` exactly (periodic torus kernel / non-periodic
  reflect-mode Gaussian),
- ±1-site stencils: lane rolls with a wrap correction for the padded
  periodic topology (the pad region never participates),
- admission: per destination lane the ≤2K candidates (K right-movers from
  x−1, K left-movers from x+1) carry unique random priorities; K rounds of
  a cross-sublane min admit the smallest-priority remaining candidate while
  free capacity (pre-step occupancy, identical to the XLA engines) lasts,
- compaction: stayers + admitted incomers re-packed front-first by an
  exclusive cumsum over the 3K combined rows.

Scope (the flagship configuration class, PARTICLE_solver_BIOLOGY_EXCLUSION
.py:55-94): exclusion with static K, periodic or non-periodic, plus_forward
or bidirectional active hops, global or Gaussian local m, default CW flip
rate, no anchors/binding, no crowding suppression.  Everything else routes
to the XLA engines.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydrolim_tpu.core.config import ParticleConfig

LANE = 128
# np, not jnp, constants: a jnp scalar would be a captured traced constant
# inside the kernel (and would initialize backends at import time).
# Priorities are non-negative int32 (Mosaic lacks unsigned reductions).
_SENT = np.int32(0x7FFFFFFF)     # "no candidate" sentinel, sorts last
_MASK_HI = np.int32(0x7FFFFFF0)  # 27 random bits; low 4 bits carry row ids


def _pad_lanes(L: int) -> int:
    return -(-L // LANE) * LANE


def _pad_rows(K: int) -> int:
    # slot rows padded to the int32 sublane tiling (4); pad rows stay
    # permanently empty (capacity gating uses the true K)
    return -(-K // 4) * 4


def build_conv_matrix(config: ParticleConfig) -> np.ndarray:
    """(Lp, Lp) float32 smoothing matrix, rows=input site, cols=output site;
    zero outside the valid L×L block.  Matches fields.magnetization exactly:
    periodic → ops.convolve.periodic_gaussian_kernel circulant; non-periodic
    → gaussian_filter1d(mode='reflect') weights."""
    from hydrolim_tpu.ops.convolve import (
        gaussian_filter_weights,
        periodic_gaussian_kernel,
    )

    L, Lp = config.L, _pad_lanes(config.L)
    M = np.zeros((Lp, Lp), np.float32)
    if config.periodic:
        # circular convolution: out[j] = sum_i x[i] * k[(j - i) % L] — the
        # one cached/vectorized construction shared with the XLA smoothing
        # and the PDE bridge (a second hand-rolled copy here would have to
        # track dft.py's orientation convention forever)
        from hydrolim_tpu.ops import dft

        k = periodic_gaussian_kernel(L, config.dx, config.local_kernel_sigma)
        M[:L, :L] = np.asarray(dft.circulant_matmul_matrix(k))
    else:
        w = gaussian_filter_weights(config.sigma_grid, 4.0)
        r = (len(w) - 1) // 2
        # reflect extension: out[j] = sum_d w[d+r] * x[reflect(j - d)]
        for d in range(-r, r + 1):
            src = np.arange(L) - d
            src = np.where(src < 0, -1 - src, src)
            src = np.where(src >= L, 2 * L - 1 - src, src)
            M[src, np.arange(L)] += w[d + r]
    return M


def narrow_smooth_radius(config: ParticleConfig) -> int:
    """Bucketed roll radius for the NARROW smoothing path, or 0 when the
    dense (Lp, Lp) matmul stays the right call.

    The flagship exclusion configs smooth with σ_grid ≈ 2 (17 true taps), yet
    the fused kernels paid a full (2R, Lp) @ (Lp, Lp) HIGHEST-precision MXU
    matmul per Δt step — the dominant per-step cost at L=1000 (see
    docs/ROADMAP.md round-5 adjudication).  Narrow kernels instead run
    2r+1 lane rolls (pure f32 VPU FMAs — *more* accurate than the bf16x3
    MXU decomposition) plus one small exact corner matmul.  The radius is
    bucketed to ×16 (zero-weight pad taps) so nearby σ share one compiled
    Mosaic kernel, mirroring ``pde/fast_solve._narrow_radius``.

    Applicability gates: local m, Lp ≥ 768 (the two 384-lane corner input
    windows must not overlap), bucketed radius ≤ 48 (the tap loop is an
    unrolled straight-line body — Mosaic allocates stack per op, so very
    wide kernels stay on the single-matmul path)."""
    if config.local_kernel_sigma <= 0:
        return 0
    if _pad_lanes(config.L) < 6 * LANE:
        return 0
    if config.periodic:
        # the dense path uses the FULL normalized circulant, so the rolled
        # taps must cover its mass to a negligible tail (< 1e-7, like
        # pde/fast_solve._narrow_radius) — a bare 4σ cut leaves ~1e-4
        from hydrolim_tpu.ops.convolve import periodic_gaussian_kernel

        k = np.abs(np.asarray(periodic_gaussian_kernel(
            config.L, config.dx, config.local_kernel_sigma), np.float64))
        total = k.sum()
        r_true = 1
        while r_true <= 48:
            d = np.arange(-r_true, r_true + 1)
            if total - k[d % config.L].sum() <= 1e-7 * total:
                break
            r_true += 1
    else:
        # scipy-convention weights: the dense matrix itself is 4σ-truncated,
        # so the rolled taps reproduce it EXACTLY at the same radius
        from hydrolim_tpu.ops.convolve import gaussian_filter_weights

        r_true = (len(gaussian_filter_weights(config.sigma_grid, 4.0))
                  - 1) // 2
    # bucket ×8 (not the PDE's ×16): the tap rolls are now the smoothing
    # cost, and the flagship's 17 true taps would pay double at ×16 —
    # measured 2.4 → ~1.2 µs/step residual at B=16 R=16
    rb = -(-max(r_true, 1) // 8) * 8
    return rb if rb <= 48 else 0


def build_narrow_smooth(config: ParticleConfig, radius: int) -> np.ndarray:
    """(776, 512) float32 packed narrow-smoothing operand.

    Rows 0:768 — the exact corner-override matrix: the dense conv matrix
    (``build_conv_matrix``) restricted to input lanes [0:384) ∪ [Lp-384:Lp)
    (rows) × output lanes [0:256) ∪ [Lp-256:Lp) (columns).  The kernel
    computes the first/last 256 output lanes by this small matmul — every
    reflect/wrap boundary weight exact — and the interior by plain cyclic
    rolls (whose Lp-wraparound artifacts land only in the overridden
    corner tiles).

    Row 768 — the 2·radius+1 symmetric taps at columns [0:2r+1) (zero
    pad taps outside the true support, so bucketed radii share compiled
    kernels at zero numeric cost)."""
    assert radius >= 1 and 2 * radius + 1 <= 512
    L, Lp = config.L, _pad_lanes(config.L)
    assert Lp >= 6 * LANE, (L, Lp)
    M = build_conv_matrix(config)
    P = np.zeros((776, 512), np.float32)
    rows = np.r_[0:384, Lp - 384:Lp]
    cols = np.r_[0:256, Lp - 256:Lp]
    P[:768, :] = M[np.ix_(rows, cols)]
    if config.periodic:
        from hydrolim_tpu.ops.convolve import periodic_gaussian_kernel

        k = np.asarray(periodic_gaussian_kernel(
            L, config.dx, config.local_kernel_sigma))
        d = np.arange(-radius, radius + 1)
        P[768, 0:2 * radius + 1] = k[d % L]
    else:
        from hydrolim_tpu.ops.convolve import gaussian_filter_weights

        w = gaussian_filter_weights(config.sigma_grid, 4.0)
        r_true = (len(w) - 1) // 2
        assert r_true <= radius, (r_true, radius)
        P[768, radius - r_true:radius + r_true + 1] = w
    return P


def _narrow_conv(pack, conv_ref, taps_ref, *, Lp: int, rb: int, rows2: int):
    """Shared narrow-smoothing body for both fused exclusion kernels:
    ``pack`` carries the (signed counts, total counts) field pair with the
    lane axis LAST and ``rows2`` total leading rows (2R for either layout);
    ``conv_ref`` is the (768, 512) corner block and ``taps_ref`` the
    (1, LANE) SMEM tap row (both sliced from the ``build_narrow_smooth``
    operand by the wrapper — SMEM scalar reads are the Mosaic-proven
    broadcast pattern, pallas_pde.py:198; a (1, 1) VMEM slice broadcast
    into both sublanes and lanes does not lower).  Interior output lanes
    accumulate 2rb+1 cyclic rolls in ascending-input-index order (matching
    the dense matmul's accumulation order); the first/last 256 lanes are
    overridden by the exact corner matmul."""
    ax = pack.ndim - 1
    acc = taps_ref[0, 2 * rb] * pltpu.roll(pack, rb, axis=ax)
    for d in range(rb - 1, -rb - 1, -1):
        acc = acc + taps_ref[0, rb + d] * pltpu.roll(
            pack, d if d >= 0 else Lp + d, axis=ax)
    win = jnp.concatenate(
        [pack[..., 0:384], pack[..., Lp - 384:Lp]], axis=ax)
    corners = jnp.dot(win.reshape(rows2, 768), conv_ref[:],
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32
                      ).reshape(pack.shape[:-1] + (512,))
    return jnp.concatenate(
        [corners[..., 0:256], acc[..., 256:Lp - 256], corners[..., 256:512]],
        axis=ax)


def _kernel(scal_ref, seed_ref, gid_ref, slots_ref, conv_ref, slots_out, *,
            L: int, Lp: int, K: int, Kp: int, R: int, k_steps: int,
            dt: float, periodic: bool, bidirectional: bool,
            use_local_m: bool, smooth_radius: int = 0, taps_ref=None,
            noise_ref=None):
    """R replicas per grid program (VERDICT r2 #6): state is (R, Kp, Lp)
    with the (Kp, Lp) tiles stacked on the leading axis — per-replica
    reductions run over axis 1 (the sublane axis of each tile), rolls over
    axis 2, and the smoothing matmul packs all R replicas into ONE
    (2R, Lp) @ (Lp, Lp) MXU call.  Measured effect: amortizes grid/launch
    overhead and the conv matmul (4.9e8 → 6.1e8 steps/s at the K=3
    flagship B=16) but does NOT fill the idle sublanes — Mosaic tiles the
    last two dims, so each replica's Kp rows stay padded to 8 sublanes
    regardless of R (docs/ROADMAP.md sublane write-off)."""
    g = pl.program_id(0)
    # scal_ref: (R, 1, LANE) VMEM scalar slab — lane c holds scalar c;
    # last-dim slices give natively-(R, 1, 1)-shaped per-replica scalars
    # (an SMEM vector read or a 2-D→3-D reshape would not lower)
    beta = scal_ref[:, :, 0:1]                   # (R, 1, 1)
    p_dif = scal_ref[:, :, 1:2] * dt
    p_act = scal_ref[:, :, 2:3] * dt
    # second seed word is the GLOBAL program id (== g unless the caller is
    # a shard_map shard, which passes its global offset) so that per-shard
    # streams match the unsharded run replica-for-replica.
    # noise_ref != None = injected-randomness mode (VERDICT r3 #3): bits
    # come from a (k_steps, 2, R, Kp, Lp) pre-drawn ref so the whole body
    # runs under interpret=True on CPU (pltpu.prng_* has no interpreter).
    if noise_ref is None:
        pltpu.prng_seed(seed_ref[g], gid_ref[g])

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1, Lp), 2)
    laneK = jax.lax.broadcasted_iota(jnp.int32, (R, Kp, Lp), 2)
    rowK = jax.lax.broadcasted_iota(jnp.int32, (R, Kp, Lp), 1)
    validK = laneK < L
    wrap = Lp - L + 1

    def shift_right1(x, fill=0):
        """out[i] = x[i-1] on the L-site topology; pad lanes → fill."""
        lane = lane1 if x.shape[1] == 1 else laneK
        plain = pltpu.roll(x, 1, axis=2)
        if periodic:
            out = jnp.where(lane == 0, pltpu.roll(x, wrap, axis=2), plain)
        else:
            out = jnp.where(lane == 0, fill, plain)
        return jnp.where(lane < L, out, fill)

    def shift_left1(x, fill=0):
        """out[i] = x[i+1] on the L-site topology; pad lanes → fill."""
        lane = lane1 if x.shape[1] == 1 else laneK
        plain = pltpu.roll(x, Lp - 1, axis=2)   # pltpu.roll needs shift >= 0
        if periodic:
            out = jnp.where(lane == L - 1, pltpu.roll(x, L - 1, axis=2),
                            plain)
        else:
            out = jnp.where(lane >= L - 1, fill, plain)
        return jnp.where(lane < L, out, fill)

    def body(step, slots):
        # slot payloads are SIGNED: sign = spin, magnitude = particle
        # identity (1 for anonymous ±1 fields, `id+1` for tagged runs —
        # sweeps/fast_exclusion.py).  All physics below reads only the sign;
        # moves/compaction carry payloads intact, so identities survive.
        occ_slot = slots != 0
        is_plus = slots > 0
        is_minus = slots < 0
        sgn_f = (is_plus.astype(jnp.float32) - is_minus.astype(jnp.float32))
        counts_s = jnp.sum(sgn_f, axis=1, keepdims=True)        # (R, 1, Lp)
        tot = jnp.sum(jnp.abs(sgn_f), axis=1, keepdims=True)    # (R, 1, Lp)
        occ_tot = tot.astype(jnp.int32)

        if use_local_m:
            pack = jnp.concatenate([counts_s, tot], axis=1)     # (R, 2, Lp)
            if smooth_radius > 0:
                # narrow σ (the flagship class): 2r+1 rolled FMAs + exact
                # corner matmul — ~80× fewer MXU FLOPs than the dense
                # (Lp, Lp) product, and full-f32 VPU arithmetic
                conv = _narrow_conv(pack, conv_ref, taps_ref, Lp=Lp,
                                    rb=smooth_radius, rows2=2 * R)
            else:
                # HIGHEST: the default lowers the smoothing operands to
                # bf16 (~2e-3 relative m error — perturbs every CW flip
                # rate and breaks parity with the XLA engines' f32
                # convolutions)
                conv = jnp.dot(pack.reshape(2 * R, Lp), conv_ref[:],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32
                               ).reshape(R, 2, Lp)
            m = jnp.where(conv[:, 1:2] > 0.0, conv[:, 0:1] / jnp.where(
                conv[:, 1:2] > 0.0, conv[:, 1:2], 1.0), 0.0)
            m = jnp.clip(m, -1.0, 1.0)                          # (R, 1, Lp)
        else:
            s_sum = jnp.sum(counts_s, axis=2, keepdims=True)    # (R, 1, 1)
            n_alive = jnp.maximum(jnp.sum(tot, axis=2, keepdims=True), 1.0)
            m = jnp.broadcast_to(s_sum / n_alive, (R, 1, Lp))

        c = jnp.where(occ_slot, jnp.exp(-beta * sgn_f * m), 0.0)

        right_free = shift_left1(occ_tot, fill=K) < K           # (R, 1, Lp)
        left_free = shift_right1(occ_tot, fill=K) < K
        if not periodic:
            right_free = right_free & (lane1 < L - 1)
            left_free = left_free & (lane1 > 0)

        rate_left = p_dif * (occ_slot & left_free)
        rate_right = p_dif * (occ_slot & right_free)
        rate_right = rate_right + p_act * (is_plus & right_free)
        if bidirectional:
            rate_left = rate_left + p_act * (is_minus & left_free)

        t1 = rate_left
        t2 = t1 + rate_right
        t3 = t2 + c * dt
        # low-24-bit mask, NOT `>> 8`: Mosaic lowers the shift as arithmetic
        # (sign-extends), which would make u negative for half the draws
        if noise_ref is None:
            u_bits = pltpu.prng_random_bits((R, Kp, Lp))
        else:
            u_bits = noise_ref[pl.ds(step, 1)][0, 0]
        # int32 before the float cast: Mosaic rejects uint32->f32 (hit on
        # the injected-noise path; hw prng bits already arrive signed), and
        # the masked value fits 24 bits so the detour is value-identical
        u = (u_bits.astype(jnp.int32) & np.int32(0x00FFFFFF)
             ).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        ev_left = u < t1
        ev_right = (u >= t1) & (u < t2)
        ev_flip = (u >= t2) & (u < t3)

        # unique candidate priorities as NON-NEGATIVE int32 (Mosaic has no
        # unsigned reductions): 27 random high bits | row id (right movers
        # rows 0..K-1, left movers K..2K-1 at the destination lane)
        if noise_ref is None:
            bits = pltpu.prng_random_bits((R, Kp, Lp))
        else:
            bits = noise_ref[pl.ds(step, 1)][0, 1]
        rand_hi = jnp.right_shift(bits, 1).astype(jnp.int32) & _MASK_HI
        pr = rand_hi | rowK
        plf = rand_hi | (rowK + Kp)
        cand_r = shift_right1(jnp.where(ev_right, pr, _SENT), fill=_SENT)
        cand_l = shift_left1(jnp.where(ev_left, plf, _SENT), fill=_SENT)
        cand = jnp.concatenate([cand_r, cand_l], axis=1)      # (R, 2Kp, Lp)

        free = (K - occ_tot)                                    # (R, 1, Lp)
        accept = jnp.zeros((R, 2 * Kp, Lp), bool)
        for r in range(K):
            cur_min = jnp.min(cand, axis=1, keepdims=True)
            win = (cand == cur_min) & (cand != _SENT) & (free > r)
            accept = accept | win
            cand = jnp.where(win, _SENT, cand)
        acc_right_in = accept[:, :Kp]
        acc_left_in = accept[:, Kp:]

        acc_right_src = shift_left1(acc_right_in.astype(jnp.int32)) > 0
        acc_left_src = shift_right1(acc_left_in.astype(jnp.int32)) > 0
        leaver = acc_right_src | acc_left_src
        stay = jnp.where(leaver, 0, slots)
        stay = jnp.where(ev_flip & ~leaver, -stay, stay)

        in_right = jnp.where(acc_right_in & validK, shift_right1(slots), 0)
        in_left = jnp.where(acc_left_in & validK, shift_left1(slots), 0)
        combined = jnp.concatenate([stay, in_right, in_left], axis=1)
        combined = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (R, 3 * Kp, Lp), 2) < L,
            combined, 0)

        # front-pack the nonzero rows (stable): exclusive running count
        nz = (combined != 0).astype(jnp.int32)
        rows = []
        running = jnp.zeros((R, 1, Lp), jnp.int32)
        sel = []
        for q in range(3 * Kp):
            sel.append((running, nz[:, q:q + 1]))
            running = running + nz[:, q:q + 1]
        for j in range(Kp):
            row = jnp.zeros((R, 1, Lp), jnp.int32)
            for q in range(3 * Kp):
                nzb, nzq = sel[q]
                row = row + jnp.where((nzq > 0) & (nzb == j),
                                      combined[:, q:q + 1], 0)
            rows.append(row)
        return jnp.concatenate(rows, axis=1)

    slots_out[:] = jax.lax.fori_loop(0, k_steps, body, slots_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("L", "K", "k_steps", "r_batch", "dt", "periodic",
                     "bidirectional", "use_local_m", "smooth_radius",
                     "interpret"))
def exclusion_multi_step(scalars: jnp.ndarray, seeds: jnp.ndarray,
                         slots: jnp.ndarray, conv_mat: jnp.ndarray, *,
                         L: int, K: int, k_steps: int, dt: float,
                         periodic: bool, bidirectional: bool,
                         use_local_m: bool, r_batch: int = 1,
                         smooth_radius: int = 0,
                         prog_ids: jnp.ndarray = None,
                         interpret: bool = False,
                         noise=None):
    """Advance K_STEPS exclusion steps fully on-chip.

    Args:
      scalars: (B, 3) float32 [beta, rate_diffusion, rate_active] (site
        units).
      seeds: (B,) int32 — pass ``base + frame`` per invocation; with
        ``r_batch`` > 1 one seed per grid program (every r_batch-th entry)
        is consumed.
      slots: (B, K, Lp) int32 signed slot payloads (sign = spin, magnitude
        = identity; pad lanes zero).
      conv_mat: (Lp, Lp) float32 smoothing matrix (ignored unless
        ``use_local_m``; pass a (0, 0) array for global m — it is replaced
        by a 1×1 zero placeholder internally).
      r_batch: replicas per grid program (B must divide evenly).  A
        single-replica program occupies K..2K of 8 sublanes; row-batching
        stacks R (Kp, Lp) tiles per program and shares the conv matrix
        across one (2R, Lp) matmul (the pallas_pde (G, R, …) trick).
      smooth_radius: > 0 switches local-m smoothing to the NARROW rolled
        path (``narrow_smooth_radius``/``build_narrow_smooth``):
        ``conv_mat`` must then be the packed (776, 512) corner+taps
        operand instead of the dense (Lp, Lp) matrix.
      prog_ids: (G,) int32 GLOBAL program ids used as the second PRNG seed
        word (default arange(G)).  A shard_map caller passes its shard's
        global offset + arange so every replica's bit stream matches the
        unsharded run.
      noise: optional (G, k_steps, 2, R, Kp, Lp) uint32 pre-drawn random
        bits (slot 0 = event draw, slot 1 = priority draw per step),
        consumed instead of the on-core PRNG — the CPU/interpret validation
        path (VERDICT r3 #3).  None on the production TPU path.
    """
    B, Kp, Lp = slots.shape
    R = r_batch
    assert Kp == _pad_rows(K), 'pack slots with pack_slots() (row padding)'
    assert 2 * Kp <= 16, 'row-id priority bits support K <= 8'
    assert B % R == 0, (B, R)
    if not use_local_m:
        # minimal tiling-aligned placeholder — shipping a (Lp, Lp) zero
        # matrix would waste ~4 MB of VMEM per program at L=1000
        assert smooth_radius == 0, "smooth_radius requires use_local_m"
        conv_mat = jnp.zeros((8, LANE), jnp.float32)
    elif smooth_radius > 0:
        assert Lp >= 6 * LANE and 1 <= smooth_radius <= 48, (Lp,
                                                             smooth_radius)
        if conv_mat.shape != (776, 512):
            raise ValueError(
                f"smooth_radius={smooth_radius} requires the packed "
                f"(776, 512) narrow operand (build_narrow_smooth); got "
                f"shape {tuple(conv_mat.shape)}")
    elif conv_mat.shape != (Lp, Lp):
        # an empty/mis-shaped matrix with use_local_m would previously be
        # replaced by ZEROS: m ≡ 0 and every occupied slot flips with
        # probability dt — beta-independent coin-flip dynamics with no
        # error.  Fail loudly instead.
        raise ValueError(
            f"use_local_m=True requires a ({Lp}, {Lp}) smoothing matrix "
            f"(build_conv_matrix); got shape {tuple(conv_mat.shape)}")
    G = B // R
    grid = (G,)
    kernel = functools.partial(
        _kernel, L=L, Lp=Lp, K=K, Kp=Kp, R=R, k_steps=k_steps, dt=dt,
        periodic=periodic, bidirectional=bidirectional,
        use_local_m=use_local_m, smooth_radius=smooth_radius)

    inject = noise is not None
    narrow = smooth_radius > 0

    def squeeze(scal, seed, gid, sl, conv, *rest):
        taps = None
        if narrow:
            taps, rest = rest[0], rest[1:]
        if inject:
            nz, out = rest
            kernel(scal.at[0], seed, gid, sl.at[0], conv, out.at[0],
                   taps_ref=taps, noise_ref=nz.at[0])
        else:
            (out,) = rest
            kernel(scal.at[0], seed, gid, sl.at[0], conv, out.at[0],
                   taps_ref=taps)

    if narrow:
        # split the packed operand: corner block → VMEM matmul operand,
        # tap row → SMEM (scalar reads broadcast into (R, ·, Lp) tiles;
        # a (1, 1) VMEM slice would not lower — see _narrow_conv)
        conv_mat = jnp.asarray(conv_mat, jnp.float32)
        taps_arr = conv_mat[768:769, 0:LANE]
        conv_ship = conv_mat[0:768, :]
    else:
        taps_arr = None
        conv_ship = jnp.asarray(conv_mat, jnp.float32)
    slot_spec = pl.BlockSpec((1, R, Kp, Lp), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    scal_g = jnp.pad(jnp.asarray(scalars, jnp.float32),
                     ((0, 0), (0, LANE - 3))).reshape(G, R, 1, LANE)
    seeds_g = jnp.asarray(seeds, jnp.int32)[::R]
    gids_g = (jnp.arange(G, dtype=jnp.int32) if prog_ids is None
              else jnp.asarray(prog_ids, jnp.int32))
    smem_vec = pl.BlockSpec((G,), lambda g: (0,), memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((1, R, 1, LANE), lambda g: (g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        smem_vec,
        smem_vec,
        slot_spec,
        pl.BlockSpec(conv_ship.shape, lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [scal_g, seeds_g, gids_g, slots.reshape(G, R, Kp, Lp),
              conv_ship]
    if narrow:
        in_specs.append(pl.BlockSpec((1, LANE), lambda g: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(taps_arr)
    if inject:
        in_specs.append(pl.BlockSpec(
            (1, k_steps, 2, R, Kp, Lp), lambda g: (g, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(noise, jnp.uint32))
    out = pl.pallas_call(
        squeeze,
        grid=grid,
        in_specs=in_specs,
        out_specs=slot_spec,
        out_shape=jax.ShapeDtypeStruct((G, R, Kp, Lp), jnp.int32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(*inputs)
    return out.reshape(B, Kp, Lp)


def pack_slots(slots: np.ndarray) -> jnp.ndarray:
    """(B, K, L) → (B, Kp, Lp) lane- and row-padded."""
    B, K, L = slots.shape
    Lp, Kp = _pad_lanes(L), _pad_rows(K)
    out = np.zeros((B, Kp, Lp), np.int32)
    out[:, :K, :L] = slots
    return jnp.asarray(out)


def unpack_slots(slots, K: int, L: int) -> np.ndarray:
    return np.asarray(slots)[..., :K, :L]
