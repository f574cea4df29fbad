"""On-chip cycle attribution for the three batched-exclusion engines
(VERDICT r4 #1): XLA slot engine vs fused Pallas vs replica-banked fused,
at the reference flagship config (PARTICLE_solver_BIOLOGY_EXCLUSION.py:55-94
— K=3, L=1000, N=750, plus_forward, non-periodic, sigma_grid=2).

Rather than an xplane trace (no trace viewer in this image), this uses
component ablation, which answers the adjudication question directly:

- ``use_local_m`` on/off     → cost share of the per-step smoothing
                               ((2R, Lp)@(Lp, Lp) MXU matmul in the fused
                               kernels; 17-tap VALID conv in the XLA engine)
- ``k_steps`` 1k vs 10k      → launch/grid overhead vs steady-state
- ``R`` sweep at fixed B     → the sublane-occupancy thesis
                               (ops/pallas_exclusion_rb.py:9-22)

Writes one JSON dict per row to stdout; run on the real TPU:
    python experiments/profile_exclusion_kernels.py [--quick]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _flagship(periodic=False):
    from hydrolim_tpu.core.config import ParticleConfig

    return ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                          local_kernel_sigma=0.002, periodic=periodic,
                          site_capacity=3, active_model="plus_forward")


def _time_pipelined(run, state, reps, samples):
    """Chained reps (each consumes the previous state), best-of-samples
    sustained particle-steps/s denominator-free: returns median seconds
    per invocation."""
    state = run(0, state)
    jax.block_until_ready(state)
    vals, frame = [], 1
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(reps):
            state = run(frame, state)
            frame += 1
        jax.block_until_ready(state)
        vals.append((time.perf_counter() - t0) / reps)
    return float(np.median(vals)), float(np.ptp(vals))


def bench_fused(variant, nb, R, ksteps, smooth, reps, samples):
    """variant in {'plain', 'rb'}; smooth in {'dense', 'narrow', 'off'} —
    per-invocation seconds at the flagship config with the smoothing mode
    ablated (dense (Lp, Lp) matmul / rolled narrow taps / global m)."""
    config = _flagship()
    if variant == "plain":
        from hydrolim_tpu.ops.pallas_exclusion import (
            exclusion_multi_step,
            pack_slots,
        )
        step, pack = exclusion_multi_step, pack_slots
    else:
        from hydrolim_tpu.ops.pallas_exclusion_rb import (
            exclusion_multi_step_rb,
            pack_slots_rb,
        )
        step, pack = exclusion_multi_step_rb, pack_slots_rb
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        build_narrow_smooth,
        narrow_smooth_radius,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    if smooth == "narrow":
        sr = narrow_smooth_radius(config)
        assert sr > 0, "flagship config must qualify for the narrow path"
        conv = build_narrow_smooth(config, sr)
    else:
        sr = 0
        conv = build_conv_matrix(config)
    keys = jax.random.split(jax.random.PRNGKey(0), nb)
    sl = pack(np.stack([np.asarray(lgk_init(config, k)) for k in keys]))
    scal = np.zeros((nb, 3), np.float32)
    scal[:, 0], scal[:, 2] = 0.7, 5.0
    seeds = np.arange(nb, dtype=np.int32)
    run = lambda f, s: step(
        jnp.asarray(scal), seeds + f, s, conv, L=1000, K=3, k_steps=ksteps,
        dt=2e-3, periodic=False, bidirectional=False,
        use_local_m=smooth != "off", smooth_radius=sr, r_batch=R)
    sec, spread = _time_pipelined(run, sl, reps, samples)
    return dict(engine=f"fused_{variant}", B=nb, R=R, k_steps=ksteps,
                smooth=smooth, sec=sec, spread=spread,
                us_per_step=sec / ksteps * 1e6,
                psteps_per_s=nb * 750 * ksteps / sec)


def bench_slot(nb, ksteps, local_m, reps, samples):
    """XLA slot engine; local_m toggled via sigma (0 → global mean)."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.particles.lattice_gas_k import run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import broadcast_params

    config = ParticleConfig(
        L=1000, N=750, init="fixed", scale_rates=False,
        local_kernel_sigma=0.002 if local_m else 0.0, periodic=False,
        site_capacity=3, active_model="plus_forward", minus_anchor=True)
    dt = 2e-3
    T = ksteps * dt
    params = broadcast_params(config, beta=np.full(nb, 0.7),
                              rate_diffusion=0.0, rate_active=5.0)

    def run(f, _):
        _, slots = run_lattice_gas_k(config, params, jax.random.PRNGKey(f),
                                     T=T, obs_dt=T, dt=dt, n_tracers=0)
        return slots

    sec, spread = _time_pipelined(run, None, reps, samples)
    return dict(engine="xla_slot", B=nb, R=None, k_steps=ksteps,
                use_local_m=local_m, sec=sec, spread=spread,
                us_per_step=sec / ksteps * 1e6,
                psteps_per_s=nb * 750 * ksteps / sec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer samples (worker-flakiness smoke)")
    args = ap.parse_args()
    reps, samples = (2, 2) if args.quick else (2, 3)

    rows = []

    def rec(r):
        rows.append(r)
        print(json.dumps(r), flush=True)

    # --- steady state at the production operating point -------------------
    for lm in (True, False):
        rec(bench_slot(16, 10_000, lm, reps, samples))
    for variant in ("plain", "rb"):
        R16 = 16 if variant == "rb" else 8    # plain picks R from VMEM gate
        for smooth in ("dense", "narrow", "off"):
            rec(bench_fused(variant, 16, R16, 10_000, smooth, reps,
                            samples))

    # --- launch/grid overhead: short vs long unrolls ----------------------
    for variant in ("plain", "rb"):
        R16 = 16 if variant == "rb" else 8
        rec(bench_fused(variant, 16, R16, 1_000, "narrow", reps, samples))

    # --- sublane-occupancy thesis: R sweep at fixed B=32 ------------------
    for R in (8, 16, 32):
        rec(bench_fused("rb", 32, R, 10_000, "narrow", reps, samples))

    print("#", "-" * 68)
    for r in rows:
        lbl = r.get("smooth", "local" if r.get("use_local_m") else "off")
        print(f"# {r['engine']:12s} B={r['B']:<3d} R={str(r['R']):>4s} "
              f"k={r['k_steps']:<6d} smooth={lbl:6s} "
              f"{r['us_per_step']:8.2f} us/step  "
              f"{r['psteps_per_s']:.3e} psteps/s")


if __name__ == "__main__":
    main()
