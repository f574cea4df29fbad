"""Device-mesh parallelism for sweeps and large ensembles.

The reference has no distributed execution at all (SURVEY.md §2.5); its
embarrassingly-parallel sweep axes (β, σ, N × replicas) become here a batch
axis sharded over a ``jax.sharding.Mesh``:

- axis ``'sweep'``: the flattened (β-grid × replicas) batch — pure data
  parallelism, zero communication during stepping,
- axis ``'part'``: the particle buffer axis — the global-magnetization
  reduction ``Σσ/N`` becomes an XLA ``psum`` over ICI, inserted automatically
  from the sharding annotations (the framework's particle-axis parallelism),
- axis ``'space'`` (PDE): the lattice axis of ρ± — the dense
  circulant/diffusion matmuls and ±1-site rolls induce collectives
  automatically.

All sharding is declarative ``NamedSharding`` + ``jit``; there is no
hand-written communication.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into the most-square (a, b) with a·b = n."""
    best = (n, 1)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (n // a, a)
    return best


def select_devices(n_devices: Optional[int] = None):
    """Default-platform devices, falling back to the (virtual multi-device)
    CPU platform only when the default backend is unavailable or has fewer
    than ``n_devices`` — so real accelerators are never silently bypassed,
    and single-chip machines can still validate multi-chip shardings.
    (Callers that must never touch a possibly-broken default backend — the
    driver dryrun — pass explicit ``devices`` instead.)"""
    try:
        devices = jax.devices()
    except RuntimeError:
        devices = []
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= n_devices:
            devices = cpus
    return devices


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("sweep", "part"),
              devices=None) -> Mesh:
    """2-D mesh over the available devices (most-square factorization);
    device selection per :func:`select_devices`."""
    if devices is None:
        devices = select_devices(n_devices)
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    a, b = _factor2(len(devices))
    dev_array = np.asarray(devices).reshape(a, b)
    return Mesh(dev_array, axis_names)


def sweep_sharding(mesh: Mesh, *more_axes) -> NamedSharding:
    """Sharding for a batch-leading array: batch on 'sweep', then the given
    trailing axes (None for replicated)."""
    return NamedSharding(mesh, P(mesh.axis_names[0], *more_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_particle_state(mesh: Mesh, state, batched: bool = True):
    """Place a (batched) ParticleState on the mesh: batch axis on 'sweep',
    particle buffer axis on 'part'; scalars/exit logs replicated per shard
    row."""
    part = mesh.axis_names[1]
    sweep = mesh.axis_names[0]

    def spec_for(leaf):
        if not batched:
            if leaf.ndim >= 1 and leaf.shape[0] > 16:
                return NamedSharding(mesh, P(part))
            return NamedSharding(mesh, P())
        if leaf.ndim >= 2 and leaf.shape[1] > 16:   # (B, n_buf, ...)
            return NamedSharding(mesh, P(sweep, part))
        if leaf.ndim >= 1:                           # (B, ...) scalars/logs
            return NamedSharding(mesh, P(sweep))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), state)


def shard_params(mesh: Mesh, params):
    """ParticleParams with leading (B,) axis → shard on 'sweep'."""
    sh = sweep_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
