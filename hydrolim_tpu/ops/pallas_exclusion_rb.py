"""Pallas TPU kernel: replica-banked fused exclusion stepper.

The original fused exclusion kernel (ops/pallas_exclusion.py) lays state
out as ``(R, Kp, Lp)`` — each replica's Kp slot rows land on the SUBLANE
axis, and Mosaic pads them to 8 sublanes, idling 5/8 of every VPU op at
the K=3 flagship (docs/ROADMAP.md sublane write-off: 6.1e8 steps/s at
B=16 vs the XLA slot engine's 2.15e9).

This kernel transposes the layout to **(K, R, Lp)**: the slot axis moves
to the LEADING (untiled) dimension and the replica axis fills sublanes.
The consequences compound:

- every per-replica cross-slot reduction (occupancy, signed counts, the
  K admission rounds' min over 2K candidate rows, the 3K-row compaction
  cumsum) becomes a static Python loop over K leading slices — pure
  elementwise VPU ops on fully-occupied ``(R, Lp)`` tiles; no segmented
  cross-sublane reductions, no relayouts,
- sublane occupancy is 100% for ANY K whenever R is a multiple of 8
  (the caller pads replicas, not slot rows),
- the smoothing matmul packs all replicas into one
  ``(2R, Lp) @ (Lp, Lp)`` MXU call exactly as before (the (2, R, Lp) →
  (2R, Lp) reshape merges leading dims — free in tiled memory).

Generator, admission rule (pre-step capacity, random-priority rounds),
stable compaction order and payload semantics are IDENTICAL to
ops/pallas_exclusion.py / particles/lattice_gas_k.py — the interpret-mode
suite pins matched-draw equality with the XLA slot engine
(tests/test_kernel_logic_cpu.py).  Scope gates are the original kernel's
(exclusion, static K <= 8, no anchors/binding/crowding).

Reference behavior being accelerated: the exclusion hot loop of
PARTICLE_solver_BIOLOGY_EXCLUSION.py:55-94 (via SURVEY.md §2.5 row 5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hydrolim_tpu.ops.pallas_exclusion import (  # shared layout helpers
    LANE,
    _MASK_HI,
    _SENT,
    _narrow_conv,
    _pad_lanes,
    build_conv_matrix,  # noqa: F401  (re-exported: same conv matrix)
    build_narrow_smooth,  # noqa: F401  (re-exported: same packed operand)
    narrow_smooth_radius,  # noqa: F401
)


def _kernel(scal_ref, seed_ref, gid_ref, slots_ref, conv_ref, slots_out, *,
            L: int, Lp: int, K: int, R: int, k_steps: int, dt: float,
            periodic: bool, bidirectional: bool, use_local_m: bool,
            smooth_radius: int = 0, taps_ref=None, noise_ref=None):
    g = pl.program_id(0)
    # per-replica scalars live on the sublane axis: (R, 1) slices broadcast
    # against both (R, Lp) and (K, R, Lp) operands
    beta = scal_ref[:, 0:1]                       # (R, 1)
    p_dif = scal_ref[:, 1:2] * dt
    p_act = scal_ref[:, 2:3] * dt
    if noise_ref is None:
        pltpu.prng_seed(seed_ref[g], gid_ref[g])

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (R, Lp), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (K, R, Lp), 2)
    valid3 = lane3 < L
    wrap = Lp - L + 1

    def shift_right1(x, fill=0):
        """out[i] = x[i-1] on the L-site topology; pad lanes → fill."""
        lane = lane2 if x.ndim == 2 else lane3[: x.shape[0]]
        ax = x.ndim - 1
        plain = pltpu.roll(x, 1, axis=ax)
        if periodic:
            out = jnp.where(lane == 0, pltpu.roll(x, wrap, axis=ax), plain)
        else:
            out = jnp.where(lane == 0, fill, plain)
        return jnp.where(lane < L, out, fill)

    def shift_left1(x, fill=0):
        """out[i] = x[i+1] on the L-site topology; pad lanes → fill."""
        lane = lane2 if x.ndim == 2 else lane3[: x.shape[0]]
        ax = x.ndim - 1
        plain = pltpu.roll(x, Lp - 1, axis=ax)
        if periodic:
            out = jnp.where(lane == L - 1, pltpu.roll(x, L - 1, axis=ax),
                            plain)
        else:
            out = jnp.where(lane >= L - 1, fill, plain)
        return jnp.where(lane < L, out, fill)

    def body(step, slots):
        # signed payloads: sign = spin, magnitude = identity (see
        # pallas_exclusion.py) — physics reads the sign, moves carry
        # payloads intact
        occ_slot = slots != 0                           # (K, R, Lp)
        is_plus = slots > 0
        is_minus = slots < 0
        sgn_f = (is_plus.astype(jnp.float32) - is_minus.astype(jnp.float32))
        counts_s = jnp.sum(sgn_f, axis=0)               # (R, Lp)
        tot = jnp.sum(jnp.abs(sgn_f), axis=0)           # (R, Lp)
        occ_tot = tot.astype(jnp.int32)

        if use_local_m:
            pack = jnp.stack([counts_s, tot], axis=0)   # (2, R, Lp)
            if smooth_radius > 0:
                # narrow σ: rolled FMAs + exact corner matmul (see
                # pallas_exclusion._narrow_conv)
                conv = _narrow_conv(pack, conv_ref, taps_ref, Lp=Lp,
                                    rb=smooth_radius, rows2=2 * R)
            else:
                conv = jnp.dot(pack.reshape(2 * R, Lp), conv_ref[:],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32
                               ).reshape(2, R, Lp)
            m = jnp.where(conv[1] > 0.0,
                          conv[0] / jnp.where(conv[1] > 0.0, conv[1], 1.0),
                          0.0)
            m = jnp.clip(m, -1.0, 1.0)                  # (R, Lp)
        else:
            s_sum = jnp.sum(counts_s, axis=1, keepdims=True)   # (R, 1)
            n_alive = jnp.maximum(jnp.sum(tot, axis=1, keepdims=True), 1.0)
            m = jnp.broadcast_to(s_sum / n_alive, (R, Lp))

        c = jnp.where(occ_slot, jnp.exp(-beta * sgn_f * m), 0.0)

        right_free = shift_left1(occ_tot, fill=K) < K          # (R, Lp)
        left_free = shift_right1(occ_tot, fill=K) < K
        if not periodic:
            right_free = right_free & (lane2 < L - 1)
            left_free = left_free & (lane2 > 0)

        rate_left = p_dif * (occ_slot & left_free)
        rate_right = p_dif * (occ_slot & right_free)
        rate_right = rate_right + p_act * (is_plus & right_free)
        if bidirectional:
            rate_left = rate_left + p_act * (is_minus & left_free)

        t1 = rate_left
        t2 = t1 + rate_right
        t3 = t2 + c * dt
        if noise_ref is None:
            u_bits = pltpu.prng_random_bits((K, R, Lp))
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

        # unique non-negative priorities: 27 random high bits | candidate
        # row id (right movers 0..K-1, left movers K..2K-1)
        if noise_ref is None:
            bits = pltpu.prng_random_bits((K, R, Lp))
        else:
            bits = noise_ref[pl.ds(step, 1)][0, 1]
        rand_hi = jnp.right_shift(bits, 1).astype(jnp.int32) & _MASK_HI
        row_id = jax.lax.broadcasted_iota(jnp.int32, (K, R, Lp), 0)
        pr = rand_hi | row_id
        plf = rand_hi | (row_id + K)
        cand_r = shift_right1(jnp.where(ev_right, pr, _SENT), fill=_SENT)
        cand_l = shift_left1(jnp.where(ev_left, plf, _SENT), fill=_SENT)
        cand = jnp.concatenate([cand_r, cand_l], axis=0)   # (2K, R, Lp)

        free = K - occ_tot                                 # (R, Lp)
        accept = jnp.zeros((2 * K, R, Lp), bool)
        for r in range(K):
            cur_min = jnp.min(cand, axis=0, keepdims=True)
            win = (cand == cur_min) & (cand != _SENT) & (free > r)
            accept = accept | win
            cand = jnp.where(win, _SENT, cand)
        acc_right_in = accept[:K]
        acc_left_in = accept[K:]

        acc_right_src = shift_left1(acc_right_in.astype(jnp.int32)) > 0
        acc_left_src = shift_right1(acc_left_in.astype(jnp.int32)) > 0
        leaver = acc_right_src | acc_left_src
        stay = jnp.where(leaver, 0, slots)
        stay = jnp.where(ev_flip & ~leaver, -stay, stay)

        in_right = jnp.where(acc_right_in & valid3, shift_right1(slots), 0)
        in_left = jnp.where(acc_left_in & valid3, shift_left1(slots), 0)
        combined = jnp.concatenate([stay, in_right, in_left], axis=0)
        combined = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (3 * K, R, Lp), 2) < L,
            combined, 0)

        # stable front-pack of nonzero rows (same order as the XLA engine:
        # stayers, then admitted right-, then left-incomers)
        nz = (combined != 0).astype(jnp.int32)
        sel = []
        running = jnp.zeros((R, Lp), jnp.int32)
        for q in range(3 * K):
            sel.append((running, nz[q]))
            running = running + nz[q]
        rows = []
        for j in range(K):
            row = jnp.zeros((R, Lp), jnp.int32)
            for q in range(3 * K):
                nzb, nzq = sel[q]
                row = row + jnp.where((nzq > 0) & (nzb == j), combined[q], 0)
            rows.append(row)
        return jnp.stack(rows, axis=0)

    slots_out[:] = jax.lax.fori_loop(0, k_steps, body, slots_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("L", "K", "k_steps", "r_batch", "dt", "periodic",
                     "bidirectional", "use_local_m", "smooth_radius",
                     "interpret"))
def exclusion_multi_step_rb(scalars: jnp.ndarray, seeds: jnp.ndarray,
                            slots: jnp.ndarray, conv_mat: jnp.ndarray, *,
                            L: int, K: int, k_steps: int, dt: float,
                            periodic: bool, bidirectional: bool,
                            use_local_m: bool, r_batch: int = 8,
                            smooth_radius: int = 0,
                            prog_ids: jnp.ndarray = None,
                            interpret: bool = False,
                            noise=None):
    """Advance K_STEPS exclusion steps on-chip in the replica-banked layout.

    Args:
      scalars: (B, 3) float32 [beta, rate_diffusion, rate_active].
      seeds: (B,) int32; one per grid program (every r_batch-th) consumed.
      slots: (B, K, Lp) int32 signed slot payloads — NO slot-row padding
        (the leading axis is untiled); lane padding via ``pack_slots_rb``.
      conv_mat: (Lp, Lp) float32 smoothing matrix (use_local_m only).
      r_batch: replicas per grid program, ideally a multiple of 8 (the
        sublane tile); B must divide evenly — pad the batch with inert
        replicas otherwise.
      prog_ids: (G,) int32 global program ids for the PRNG second word
        (shard_map callers pass their global offset + arange).
      noise: optional (G, k_steps, 2, K, R, Lp) uint32 pre-drawn bits
        (slot 0 events, slot 1 priorities) — the interpret/CPU validation
        path.  None on the production TPU path.
    """
    B, Ks, Lp = slots.shape
    R = r_batch
    assert Ks == K and Lp == _pad_lanes(L), (slots.shape, K, L)
    assert 2 * K <= 16, 'row-id priority bits support K <= 8'
    assert B % R == 0, (B, R)
    if not use_local_m:
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
        raise ValueError(
            f"use_local_m=True requires a ({Lp}, {Lp}) smoothing matrix "
            f"(build_conv_matrix); got shape {tuple(conv_mat.shape)}")
    G = B // R
    kernel = functools.partial(
        _kernel, L=L, Lp=Lp, K=K, R=R, k_steps=k_steps, dt=dt,
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
        # corner block → VMEM; tap row → SMEM (see pallas_exclusion)
        conv_mat = jnp.asarray(conv_mat, jnp.float32)
        taps_arr = conv_mat[768:769, 0:LANE]
        conv_ship = conv_mat[0:768, :]
    else:
        taps_arr = None
        conv_ship = jnp.asarray(conv_mat, jnp.float32)
    # replica-banked packing: replica b = g*R + r lands at [g, :, r, :]
    slots_g = slots.reshape(G, R, K, Lp).transpose(0, 2, 1, 3)
    slot_spec = pl.BlockSpec((1, K, R, Lp), lambda g: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    scal_g = jnp.pad(jnp.asarray(scalars, jnp.float32),
                     ((0, 0), (0, LANE - 3))).reshape(G, R, LANE)
    seeds_g = jnp.asarray(seeds, jnp.int32)[::R]
    gids_g = (jnp.arange(G, dtype=jnp.int32) if prog_ids is None
              else jnp.asarray(prog_ids, jnp.int32))
    smem_vec = pl.BlockSpec((G,), lambda g: (0,), memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((1, R, LANE), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        smem_vec,
        smem_vec,
        slot_spec,
        pl.BlockSpec(conv_ship.shape, lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [scal_g, seeds_g, gids_g, slots_g, conv_ship]
    if narrow:
        in_specs.append(pl.BlockSpec((1, LANE), lambda g: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(taps_arr)
    if inject:
        in_specs.append(pl.BlockSpec(
            (1, k_steps, 2, K, R, Lp), lambda g: (g, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(noise, jnp.uint32))
    out = pl.pallas_call(
        squeeze,
        grid=(G,),
        in_specs=in_specs,
        out_specs=slot_spec,
        out_shape=jax.ShapeDtypeStruct((G, K, R, Lp), jnp.int32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(*inputs)
    return out.transpose(0, 2, 1, 3).reshape(B, K, Lp)


def pack_slots_rb(slots: np.ndarray) -> jnp.ndarray:
    """(B, K, L) → (B, K, Lp) lane-padded (no slot-row padding)."""
    B, K, L = slots.shape
    out = np.zeros((B, K, _pad_lanes(L)), np.int32)
    out[:, :, :L] = slots
    return jnp.asarray(out)


def unpack_slots_rb(slots, K: int, L: int) -> np.ndarray:
    return np.asarray(slots)[..., :K, :L]
