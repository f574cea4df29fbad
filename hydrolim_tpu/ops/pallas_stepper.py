"""Pallas TPU kernel: fused multi-step mean-field particle stepper.

The XLA fast path (particles.stepper._step_meanfield_global) round-trips the
particle state through HBM every Δt step (~26 B/particle/step), which caps
throughput near the bandwidth roofline.  This kernel runs K steps entirely
in VMEM: the grid is the replica axis, each program holds one replica's
particle block (R×128 int32 lanes) on-chip, draws per-step randomness from
the on-core PRNG (pltpu.prng_random_bits), performs the event-threshold
update, and writes state back once per K steps — HBM traffic amortized K×.

Model covered (the throughput-benchmark configuration, BASELINE.json):
global magnetization, no exclusion, no anchors, default Curie–Weiss flip
rate, periodic lattice; both active models.  Padding lanes carry σ = 0 —
they contribute nothing to Σσ and their flips are no-ops, so any particle
count works.  Observables are recorded by the caller between kernel
invocations (one invocation per obs_dt frame — the reference's recording
granularity), so the kernel only returns the advanced state.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _kernel(scal_ref, seed_ref, pos_ref, sigma_ref, wind_ref,
            pos_out, sigma_out, wind_out, *,
            L: int, k_steps: int, dt: float, bidirectional: bool,
            n_active: int, noise_ref=None):
    """scal_ref: SMEM (B, 3) float32 = [beta, rate_diffusion, rate_active]
    rows; seed_ref: SMEM (B,) int32 PRNG seeds (int32 end-to-end — a float32
    seed column cannot represent per-frame increments above 2^24, which
    silently replayed identical random streams every obs_dt frame).

    ``noise_ref`` (injected-randomness mode, VERDICT r3 #3): a
    (k_steps, R, 128) uint32 VMEM ref of pre-drawn random bits consumed
    instead of the on-core PRNG — ``pltpu.prng_*`` has no interpreter
    lowering, so this is what lets the CPU suite run the ENTIRE kernel body
    under ``interpret=True`` and assert equality with the XLA engine at
    matched draws (tests/test_kernel_logic_cpu.py).  Production TPU calls
    leave it None and are structurally unchanged."""
    b = pl.program_id(0)
    beta = scal_ref[b, 0]
    p_dif = scal_ref[b, 1] * dt
    p_act = scal_ref[b, 2] * dt
    if noise_ref is None:
        pltpu.prng_seed(seed_ref[b], b)

    # division, not multiply-by-reciprocal: bit-parity with the XLA
    # engine's m = s_sum / n_alive (the integer sums are exact either way)
    n_f = jnp.float32(n_active)
    shape = pos_ref.shape  # (R, 128)

    def body(step, carry):
        pos, sigma, wind = carry
        m = jnp.sum(sigma).astype(jnp.float32) / n_f
        e_p = jnp.exp(-beta * m) * dt
        e_m = jnp.exp(beta * m) * dt

        if noise_ref is None:
            bits = pltpu.prng_random_bits(shape)
        else:
            bits = noise_ref[pl.ds(step, 1)][0]
        # mask the LOW 24 bits: Mosaic lowers `bits >> 8` as an ARITHMETIC
        # shift (sign-extends the top bit), which made u negative for half
        # the draws and fired the u < t1 left-hop branch ~50% of the time.
        # int32 before the float cast: Mosaic rejects uint32->f32 (hit on
        # the injected-noise path); the masked value fits 24 bits, so the
        # detour is value-identical
        u = (bits.astype(jnp.int32) & np.int32(0x00FFFFFF)
             ).astype(jnp.float32) * jnp.float32(2.0 ** -24)

        is_plus = sigma > 0
        t1 = p_dif
        t2 = t1 + p_dif
        if bidirectional:
            t3 = t2 + p_act
            fwd_dir = sigma
        else:
            t3 = t2 + jnp.where(is_plus, p_act, 0.0)
            fwd_dir = jnp.ones_like(sigma)
        t4 = t3 + jnp.where(is_plus, e_p, e_m)

        mv_left = u < t1
        mv_right = (u >= t1) & (u < t2)
        mv_fwd = (u >= t2) & (u < t3)
        flip = (u >= t3) & (u < t4)

        delta = (mv_right.astype(jnp.int32) - mv_left.astype(jnp.int32)
                 + jnp.where(mv_fwd, fwd_dir, 0))
        raw = pos + delta
        pos = jnp.where(raw < 0, raw + L, jnp.where(raw >= L, raw - L, raw))
        wind = wind + jnp.where(raw < 0, -1, jnp.where(raw >= L, 1, 0))
        sigma = jnp.where(flip, -sigma, sigma)

        return pos, sigma, wind

    pos, sigma, wind = jax.lax.fori_loop(
        0, k_steps, body, (pos_ref[:], sigma_ref[:], wind_ref[:]))
    pos_out[:] = pos
    sigma_out[:] = sigma
    wind_out[:] = wind


def _pad_rows(n: int) -> int:
    return -(-n // LANE)


@functools.partial(
    jax.jit,
    static_argnames=("L", "k_steps", "dt", "bidirectional", "n_active",
                     "interpret"))
def meanfield_multi_step(scalars: jnp.ndarray, seeds: jnp.ndarray,
                         pos: jnp.ndarray, sigma: jnp.ndarray,
                         wind: jnp.ndarray, *,
                         L: int, k_steps: int, dt: float,
                         bidirectional: bool, n_active: int,
                         interpret: bool = False,
                         noise=None):
    """Advance K mean-field steps fully on-chip.

    Args:
      scalars: (B, 3) float32 — [beta, rate_diffusion, rate_active]
        per replica (rates in site units after any scale_rates resolution).
      seeds: (B,) int32 PRNG seeds; pass a distinct value per kernel
        invocation (e.g. ``base + frame_index``) so successive obs_dt frames
        draw independent random streams.
      pos/sigma/wind: (B, R, 128) int32 particle lanes; σ = 0 marks padding.
      n_active: true particle count per replica (for the m normalization).
      noise: optional (B, k_steps, R, 128) uint32 pre-drawn random bits —
        consumed instead of the on-core PRNG (CPU/interpret validation;
        see ``_kernel``).  None on the production TPU path.

    Returns the advanced (pos, sigma, wind).
    """
    B, R, _ = pos.shape
    grid = (B,)
    vec_spec = pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, L=L, k_steps=k_steps, dt=dt, bidirectional=bidirectional,
        n_active=n_active)
    inject = noise is not None

    def squeeze_kernel(scal, seed, *refs):
        if inject:
            nz, p, s, w, po, so, wo = refs
            kernel(scal, seed, p.at[0], s.at[0], w.at[0], po.at[0],
                   so.at[0], wo.at[0], noise_ref=nz.at[0])
        else:
            p, s, w, po, so, wo = refs
            # drop the leading block dim of the vector refs
            kernel(scal, seed, p.at[0], s.at[0], w.at[0], po.at[0],
                   so.at[0], wo.at[0])

    in_specs = [
        pl.BlockSpec((B, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
    ]
    inputs = [scalars, jnp.asarray(seeds, jnp.int32)]
    n_state_in = 2
    if inject:
        in_specs.append(pl.BlockSpec((1, k_steps, R, LANE),
                                     lambda b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(noise, jnp.uint32))
        n_state_in = 3
    in_specs += [vec_spec, vec_spec, vec_spec]
    inputs += [pos, sigma, wind]

    return pl.pallas_call(
        squeeze_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[vec_spec, vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
            jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
        ],
        # in-place update: halves VMEM/HBM footprint of the state buffers
        input_output_aliases={n_state_in: 0, n_state_in + 1: 1,
                              n_state_in + 2: 2},
        interpret=interpret,
    )(*inputs)


def pack_particles(pos: np.ndarray, sigma: np.ndarray,
                   wind: np.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(B, n) arrays → (B, R, 128) lanes with σ=0 padding."""
    B, n = pos.shape
    R = _pad_rows(n)
    pad = R * LANE - n

    def pk(a, fill):
        a = np.asarray(a, np.int32)
        a = np.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        return jnp.asarray(a.reshape(B, R, LANE))

    return pk(pos, 0), pk(sigma, 0), pk(wind, 0)


def unpack_particles(pos, sigma, wind, n: int):
    B = pos.shape[0]
    flat = lambda a: np.asarray(a).reshape(B, -1)[:, :n]
    return flat(pos), flat(sigma), flat(wind)
