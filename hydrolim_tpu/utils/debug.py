"""Debug / sanitizer checks (SURVEY.md §5 "race detection" row).

On-device data races don't exist in the XLA programming model; the analogous
hazard in this framework is a *conflict-resolution violation* — two
simultaneous hops exceeding site capacity — plus the usual NaN/bounds
hazards.  These helpers are assertion passes enabled behind a debug flag
(they add host syncs and should stay out of production steps):

- :func:`check_particle_invariants` — capacity ≤ K, positions in range,
  alive-count consistency, |m| ≤ 1,
- :func:`check_density_invariants` — non-negative densities, finite mass,
- :func:`nan_guard` — jax.debug.callback NaN check usable inside jit.
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.ops.segment import occupancy


def debug_enabled() -> bool:
    return os.environ.get("HYDROLIM_DEBUG", "0") not in ("0", "", "false")


def check_particle_invariants(config: ParticleConfig, state) -> None:
    """Host-side assertion pass over a ParticleState (or batched state)."""
    pos = np.asarray(state.pos)
    alive = np.asarray(state.alive)
    assert np.all((pos >= 0) & (pos < config.L)), "position out of range"
    if config.exclusion:
        occ, _, _ = occupancy(jnp.asarray(pos), jnp.asarray(state.sigma),
                              jnp.asarray(alive), config.L)
        occ = np.asarray(occ)
        assert occ.max() <= config.K, (
            f"exclusion violated: occupancy {occ.max()} > K={config.K}")
    sigma = np.asarray(state.sigma)
    assert np.all(np.isin(sigma[alive], (-1, 1))), "bad spin value"
    ec = int(np.max(np.asarray(state.exit_count)))
    assert ec >= 0


def check_density_invariants(rho_p, rho_m) -> None:
    rho_p = np.asarray(rho_p)
    rho_m = np.asarray(rho_m)
    assert np.all(np.isfinite(rho_p)) and np.all(np.isfinite(rho_m)), \
        "non-finite density"
    assert rho_p.min() >= 0 and rho_m.min() >= 0, "negative density"


def nan_guard(x: jnp.ndarray, name: str = "array") -> jnp.ndarray:
    """Inside-jit NaN check (no-op unless HYDROLIM_DEBUG is set)."""
    if not debug_enabled():
        return x

    def _cb(v):
        if not np.all(np.isfinite(v)):
            raise FloatingPointError(f"NaN/Inf detected in {name}")

    jax.debug.callback(_cb, x)
    return x
