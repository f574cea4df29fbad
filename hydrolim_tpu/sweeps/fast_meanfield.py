"""Production mean-field sweep runner on the fused Pallas stepper.

Advances the (β-grid × replicas) batch one obs_dt frame per kernel
invocation (state resident in VMEM across the Δt sub-steps), computing the
frame observables (densities, global m, spectra) between invocations — the
same recording granularity as `ParticleSystem.run` but at the fused-kernel
throughput (~6×10¹⁰ particle-steps/s/chip on TPU v5e).

Falls back to the XLA fast path automatically off-TPU (`engine='auto'`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import ParticleConfig, ParticleParams
from hydrolim_tpu.particles.run import substeps_for
from hydrolim_tpu.ops.segment import masked_bincount


class MeanfieldFrames(NamedTuple):
    times_obs: np.ndarray      # (M,)
    m_global: np.ndarray       # (M, B)
    rho_p: np.ndarray          # (M, B, L)
    rho_m: np.ndarray          # (M, B, L)
    var: np.ndarray            # (M, B)
    pos: Optional[np.ndarray]  # (M, B, n) unwrapped site positions


@functools.partial(jax.jit, static_argnames=("L", "n", "dx"))
def _frame_obs(pos_flat, sigma_flat, L: int, n: int, dx: float):
    """(B, n) state → densities, m, Var for one frame."""
    wp = (sigma_flat > 0).astype(jnp.float32)
    wm = (sigma_flat < 0).astype(jnp.float32)
    cp = masked_bincount(pos_flat % L, wp, L)
    cm = masked_bincount(pos_flat % L, wm, L)
    denom = float(n) * dx
    rho_p = cp / denom
    rho_m = cm / denom
    total = rho_p + rho_m
    m = jnp.sum(sigma_flat, axis=-1).astype(jnp.float32) / n
    var = jnp.var(total, axis=-1)
    return rho_p, rho_m, m, var


def resolve_meanfield_engine(engine: str, config: ParticleConfig) -> str:
    """'auto' picks the fused kernel only when the default device is a TPU
    (default-device check, not jax.devices(): the axon plugin lists the TPU
    even when jax_default_device pins CPU, and a Pallas call lowered for
    the CPU default device fails) AND the config is in the kernel's scope:
    init='fixed' (the kernel implements the uniform-site init only) and
    PERIODIC (the kernel hard-codes wrap+winding moves; the XLA fast path
    blocks boundary moves for non-periodic configs,
    particles/stepper._step_meanfield_global).  Explicit 'pallas' outside
    that scope raises instead of silently changing the law."""
    if engine == "auto":
        from hydrolim_tpu.sweeps.fast_exclusion import default_device_is_tpu

        engine = ("pallas" if default_device_is_tpu()
                  and config.init == "fixed" and config.periodic else "xla")
    if engine == "pallas" and config.init != "fixed":
        raise ValueError(
            "engine='pallas' implements the 'fixed' (uniform-site) init "
            f"only; got init={config.init!r} — use engine='xla' or 'auto'")
    if engine == "pallas" and not config.periodic:
        raise ValueError(
            "engine='pallas' implements the periodic lattice only (the "
            "kernel hard-codes wrap+winding moves); non-periodic configs "
            "block boundary moves — use engine='xla' or 'auto'")
    return engine


def run_meanfield_sweep(config: ParticleConfig, params_b: ParticleParams,
                        key: jnp.ndarray, *, T: float, obs_dt: float,
                        dt: float, engine: str = "auto",
                        record_pos: bool = True) -> MeanfieldFrames:
    """Fused-kernel sweep over the batch of ``params_b``.

    Requires the mean-field fast-path configuration (global m, no exclusion,
    no anchors — `particles.stepper._is_meanfield_fast_path`)."""
    from hydrolim_tpu.particles.stepper import _is_meanfield_fast_path

    assert _is_meanfield_fast_path(config), (
        "run_meanfield_sweep requires the mean-field configuration")
    B = params_b.beta.shape[0]
    # the TRUE particle count, not the padded buffer: the fused kernel pads
    # to full 128-lanes itself (sigma=0 inert lanes, m normalized by
    # n_active), so simulating/normalizing by n_buf would run N rounded up
    # to 8 — a ~1% systematic vs the XLA path for N % 8 != 0
    n = config.N
    L = config.L
    times = np.arange(0.0, T, obs_dt)
    M = len(times)
    n_sub = substeps_for(obs_dt, dt)
    dt_eff = obs_dt / n_sub

    engine = resolve_meanfield_engine(engine, config)

    # initial state
    k_pos, k_sig, k_seed = jax.random.split(key, 3)
    pos0 = jax.random.randint(k_pos, (B, n), 0, L, dtype=jnp.int32)
    sigma0 = jnp.where(jax.random.bernoulli(k_sig, 0.5, (B, n)), 1,
                       -1).astype(jnp.int32)
    wind0 = jnp.zeros((B, n), jnp.int32)

    frames = dict(m=[], rho_p=[], rho_m=[], var=[], pos=[])

    def record(pos, sigma, wind):
        # per-frame host transfer, deliberately: deferring all frames on
        # device and stacking once measured 2x SLOWER on the tunneled axon
        # backend (300-operand stack + bulk copy vs pipelined small copies)
        rho_p, rho_m, m, var = _frame_obs(pos, sigma, L, n, config.dx)
        frames["m"].append(np.asarray(m))
        frames["rho_p"].append(np.asarray(rho_p))
        frames["rho_m"].append(np.asarray(rho_m))
        frames["var"].append(np.asarray(var))
        if record_pos:
            frames["pos"].append(np.asarray(pos + wind * L))

    if engine == "pallas":
        from hydrolim_tpu.ops.pallas_stepper import (
            meanfield_multi_step,
            pack_particles,
            unpack_particles,
        )

        scal = np.zeros((B, 3), np.float32)
        scal[:, 0] = np.asarray(params_b.beta)
        scal[:, 1] = np.asarray(params_b.rate_diffusion)
        scal[:, 2] = np.asarray(params_b.rate_active)
        scal = jnp.asarray(scal)
        # int32 base seeds, advanced by the frame index per invocation so
        # every obs_dt frame draws an independent random stream (a float32
        # seed column cannot represent increments above 2^24)
        seeds0 = jax.random.randint(k_seed, (B,), 0, 2 ** 31 - 1 - M,
                                    dtype=jnp.int32)
        p, s, w = pack_particles(np.asarray(pos0), np.asarray(sigma0),
                                 np.asarray(wind0))
        bidi = config.active_model == "bidirectional"

        def unpack(p, s, w):
            B_ = p.shape[0]
            flat = lambda a: jnp.asarray(a).reshape(B_, -1)[:, :n]
            return flat(p), flat(s), flat(w)

        record(*unpack(p, s, w))
        for f in range(1, M):
            p, s, w = meanfield_multi_step(
                scal, seeds0 + f, p, s, w, L=L, k_steps=n_sub, dt=dt_eff,
                bidirectional=bidi, n_active=n)
            record(*unpack(p, s, w))
    else:
        from hydrolim_tpu.sweeps.ensemble import run_particle_ensemble

        res = jax.device_get(run_particle_ensemble(
            config, params_b, key, T=T, obs_dt=obs_dt, dt=dt,
            record_pos=record_pos))
        f = res.frames
        return MeanfieldFrames(
            times_obs=times,
            m_global=np.asarray(f.m_global).T,
            rho_p=np.moveaxis(np.asarray(f.rho_p), 0, 1),
            rho_m=np.moveaxis(np.asarray(f.rho_m), 0, 1),
            var=np.asarray(f.var).T,
            pos=np.moveaxis(np.asarray(f.pos), 0, 1) if record_pos else None)

    return MeanfieldFrames(
        times_obs=times,
        m_global=np.stack(frames["m"]),
        rho_p=np.stack(frames["rho_p"]),
        rho_m=np.stack(frames["rho_m"]),
        var=np.stack(frames["var"]),
        pos=np.stack(frames["pos"]) if record_pos else None)
