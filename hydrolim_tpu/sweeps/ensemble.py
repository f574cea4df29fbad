"""Vmapped replica/parameter ensembles.

The reference executes its ensemble and sweep axes as nested Python loops
(`..._sweep_beta.py:75,895`; SURVEY.md §2.5).  Here the (β-grid × replicas)
batch is a single vmapped program: β enters only through the flip rate, so it
batches as a leading axis of ``ParticleParams``; replicas differ only by PRNG
key.  One compiled step advances every (β, replica) pair — this is the
framework's replica/sweep parallelism, shardable over a device mesh
(hydrolim_tpu.parallel).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import (
    ParticleConfig,
    ParticleParams,
    auto_dt,
    make_particle_params,
)
from hydrolim_tpu.ops import dft
from hydrolim_tpu.particles.init import init_particles
from hydrolim_tpu.particles.run import ParticleRunResult, run_particles


def broadcast_params(config: ParticleConfig, *, beta, rate_diffusion,
                     rate_active, k_on=0.0, k_off=0.0, k_exit=0.0,
                     n_runs: int = 1) -> ParticleParams:
    """Params pytree with leading axis (n_beta·n_runs,): β varies across the
    grid, the other rates are broadcast."""
    beta = np.atleast_1d(np.asarray(beta, dtype=np.float32))
    flat = np.repeat(beta, n_runs)
    B = flat.shape[0]
    mk = lambda b: make_particle_params(
        config, beta=float(b), rate_diffusion=rate_diffusion,
        rate_active=rate_active, k_on=k_on, k_off=k_off, k_exit=k_exit)
    ref = mk(0.0)
    return ParticleParams(
        beta=jnp.asarray(flat),
        rate_diffusion=jnp.broadcast_to(ref.rate_diffusion, (B,)),
        rate_active=jnp.broadcast_to(ref.rate_active, (B,)),
        k_on=jnp.broadcast_to(ref.k_on, (B,)),
        k_off=jnp.broadcast_to(ref.k_off, (B,)),
        k_exit=jnp.broadcast_to(ref.k_exit, (B,)),
    )


def run_particle_ensemble(config: ParticleConfig, params_b: ParticleParams,
                          key: jnp.ndarray, *, T: float, obs_dt: float,
                          dt: float,
                          rho0_plus: Optional[np.ndarray] = None,
                          rho0_minus: Optional[np.ndarray] = None,
                          record_pos: bool = True,
                          record_fft: bool = True) -> ParticleRunResult:
    """Initialize and run B replicas in one vmapped program.

    Returns a ``ParticleRunResult`` whose leaves carry a leading batch axis.
    """
    B = params_b.beta.shape[0]
    keys = jax.random.split(key, B)
    if rho0_plus is not None and np.ndim(rho0_plus) == 2:
        # per-replica profiles (e.g. the (N, β) double sweep: N varies only
        # through the Poisson intensities, so the whole grid shares shapes
        # and compiles once)
        init_fn = lambda k, rp, rm: init_particles(config, k, rp, rm)
        states = jax.vmap(init_fn)(keys, jnp.asarray(rho0_plus),
                                   jnp.asarray(rho0_minus))
    else:
        init_fn = lambda k: init_particles(config, k, rho0_plus, rho0_minus)
        states = jax.vmap(init_fn)(keys)
    run_fn = functools.partial(run_particles, config, T=T, obs_dt=obs_dt,
                               dt=dt, record_pos=record_pos,
                               record_fft=record_fft)
    return jax.vmap(lambda p, s: run_fn(p, s))(params_b, states)


def ensemble_dt(config: ParticleConfig, *, beta_max: float, rate_diffusion,
                rate_active, k_on=0.0, k_off=0.0, k_exit=0.0) -> float:
    """Static Δt for a sweep: bound the per-particle rate at the largest β."""
    p = make_particle_params(config, beta=beta_max,
                             rate_diffusion=rate_diffusion,
                             rate_active=rate_active, k_on=k_on, k_off=k_off,
                             k_exit=k_exit)
    return auto_dt(config, p, beta_max=beta_max)


def frames_to_out(frames, rep_idx: int, config: ParticleConfig, T: float,
                  obs_dt: float, record_pos: bool = True,
                  final_state=None) -> Dict:
    """Slice one replica out of a batched ``ParticleRunResult.frames`` into a
    reference-schema ``out`` dict (host-side).  Pass the batched
    ``final_state`` to include the exit-event log
    (exit_times/exit_positions, PARTICLE_solver_CLASS.py:555-556)."""
    g = lambda a: np.asarray(a[rep_idx])
    f = frames
    L = config.L
    out = {
        "times_obs": np.arange(0.0, T, obs_dt),
        "rho_p_list": g(f.rho_p),
        "rho_m_list": g(f.rho_m),
        "total_list": g(f.total),
        "m_local_list": g(f.m_local),
        "m_global": g(f.m_global),
        "particle_count_list": list(g(f.particle_count)),
        "rho_hat_complex": (dft.ri_to_complex(g(f.rho_hat_ri))
                            if f.rho_hat_ri.shape[-2] > 0 else None),
        "fft_amp_list": (g(f.fft_amp) if f.fft_amp.shape[-1] > 0 else None),
        "var_list": g(f.var),
    }
    if record_pos and f.pos.shape[-1] > 0:
        pos = g(f.pos)
        alive = g(f.alive)
        out["pos_frames"] = pos
        out["alive_frames"] = alive
        out["bound_frames"] = g(f.bound)
        out["pos_list"] = [
            (pos[k][alive[k]] % L).astype(np.int64)
            for k in range(pos.shape[0])]
        out["bound_list"] = [g(f.bound)[k][alive[k]]
                             for k in range(pos.shape[0])]
    else:
        out["pos_frames"] = None
        out["alive_frames"] = None
        out["pos_list"] = None
    if final_state is not None:
        ec = min(int(np.asarray(final_state.exit_count[rep_idx])),
                 config.n_exit_buf)
        out["exit_times"] = list(np.asarray(
            final_state.exit_times[rep_idx][:ec]))
        out["exit_positions"] = list(np.asarray(
            final_state.exit_pos[rep_idx][:ec]))
        out["exit_init_bin"] = list(np.asarray(
            final_state.exit_init_bin[rep_idx][:ec]))
    else:
        out["exit_times"] = []
        out["exit_positions"] = []
    return out
