"""PDE initial conditions as a pure function (vmappable for sweeps).

Factored from ``IMEXPDE.initialize`` (IMEX_PDE_solver_class.py:96-131);
the facade and the vmapped PDE sweeps share this.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hydrolim_tpu.core.config import PDEConfig
from hydrolim_tpu.pde.stepper import TracerState


def pde_initialize(config: PDEConfig, key: jnp.ndarray, *,
                   mode: str = "poisson", rho0: float = 1.0,
                   noise: float = 0.2, n_tracers: int = 1000
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, TracerState]:
    """(ρ₊, ρ₋, tracers).  ``mode='poisson'`` reproduces the reference
    quirk: a centered exponential bump, not Poisson noise (SURVEY.md §2.4).
    """
    L = config.L
    k_p, k_m, k_tr, k_spin = jax.random.split(key, 4)
    x = jnp.arange(L, dtype=jnp.float32) * (config.xlim / L)
    if mode == "homogeneous":
        rho_p = rho0 + noise * jax.random.normal(k_p, (L,))
        rho_m = rho0 + noise * jax.random.normal(k_m, (L,))
    elif mode == "poisson":
        bump = jnp.exp(-jnp.abs(x - 0.5) / 0.05)
        rho_p = bump + noise * jax.random.normal(k_p, (L,))
        rho_m = bump + noise * jax.random.normal(k_m, (L,))
    else:
        raise ValueError("Unknown init mode.")
    rho_p = jnp.clip(rho_p, 0.0, None)
    rho_m = jnp.clip(rho_m, 0.0, None)
    tot = jnp.sum(rho_p + rho_m)
    rho_p = rho_p / tot
    rho_m = rho_m / tot

    pos = jax.random.randint(k_tr, (n_tracers,), 0, L).astype(
        jnp.float32) * config.dx
    spin = jnp.where(jax.random.bernoulli(k_spin, 0.5, (n_tracers,)),
                     1, -1).astype(jnp.int32)
    tracers = TracerState(
        pos=pos, unwrapped=pos, spin=spin,
        hist=jnp.zeros((config.tracer_window, n_tracers), jnp.float32))
    return rho_p, rho_m, tracers
