"""hydrolim_tpu — TPU-native framework for hydrodynamic limits of active
particle systems with mean-field (Curie–Weiss) interactions.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`StandeHaas/Hydrodynamic-Limits-of-Active-Particle-Systems-with-Mean-Field-
Interactions` (see SURVEY.md):

- ``particles``: microscopic stochastic engine — N active particles on a 1-D
  lattice with symmetric diffusion, sigma-directed active hops, Curie–Weiss
  spin flips against a local/global magnetization field, site exclusion
  (capacity K), anchor binding/unbinding and absorbing exits.  The reference's
  event-serial Gillespie loop (PARTICLE_solver_CLASS.py:450-558) is
  re-architected as a fixed-Δt synchronous stepper: every particle samples an
  event each step, exclusion conflicts are resolved by a random-priority
  scatter, and the whole step is one jitted/vmapped XLA program.
- ``pde``: macroscopic IMEX finite-difference solver for the coupled
  hydrodynamic densities rho_plus/rho_minus (IMEX_PDE_solver_class.py), with
  implicit diffusion via FFT/DCT diagonalization or a dense precomputed
  inverse (an MXU matmul), explicit upwind transport, Curie–Weiss reaction,
  and an embedded Euler–Maruyama tracer ensemble.
- ``observables``: on-device recorder + estimator suite (v_eff, D_eff,
  magnetization, blocking probability, structure factors).
- ``sweeps``: vmapped replica/β/σ/N ensembles, shardable over a device mesh.
- ``theory`` / ``fit``: tanh fixed point, exclusion-corrected v/D prediction
  family, curve-fit drivers, kinesin-II real-data validation.
- ``viz``: matplotlib re-creation of the reference figure inventory.
"""

__version__ = "0.4.0"

import os as _os

if (_os.environ.get("HYDROLIM_NO_COMPILATION_CACHE", "") != "1"
        and "JAX_COMPILATION_CACHE_DIR" not in _os.environ
        # the cache exists for minutes-long Mosaic/TPU tunnel compiles;
        # CPU-only sessions get no benefit and on some hosts the XLA:CPU
        # executable SERIALIZATION for the cache write segfaults
        # intermittently (round-4 host, put_executable_and_time) — so a
        # cpu-pinned session never engages the cache
        and _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu"):
    # Mosaic compiles of the fused multi-step kernels take minutes through
    # a remote-TPU tunnel (up to ~16 min for the scanned R-batched PDE
    # program); the persistent cache makes every repeat shape instant.
    # A user-set JAX_COMPILATION_CACHE_DIR is respected (we only install a
    # default); opt out entirely with HYDROLIM_NO_COMPILATION_CACHE=1.
    # The default is PER-USER (not a world-shared /tmp path) so multi-user
    # machines can't collide on — or poison — each other's AOT artifacts.
    def _default_cache_dir():
        base = _os.environ.get("XDG_CACHE_HOME",
                               _os.path.expanduser("~/.cache"))
        if not base.startswith("~"):          # expanduser resolved a home
            return _os.path.join(base, "hydrolim_tpu", "jax_comp_cache")
        import tempfile

        uid = _os.getuid() if hasattr(_os, "getuid") else 0
        return _os.path.join(tempfile.gettempdir(),
                             f"hydrolim_tpu_cache_{uid}")

    def _host_fingerprint():
        # XLA:CPU AOT executables are compiled for the build host's exact
        # CPU feature set; loading them on a host that lacks a feature
        # (cache dir on shared/persistent storage, machine changed
        # underneath) SIGILLs/segfaults mid-suite.  JAX's cache key does
        # not cover host CPU features, so we key the cache DIRECTORY by a
        # fingerprint of them — a moved home directory then simply starts
        # a fresh cache instead of loading incompatible machine code.
        import hashlib
        import platform

        sig = platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        sig += " " + " ".join(sorted(line.split()[2:]))
                        break
        except OSError:  # pragma: no cover — non-Linux
            sig += " " + platform.processor()
        return hashlib.sha1(sig.encode()).hexdigest()[:12]

    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(
                _os.environ.get("HYDROLIM_CACHE_DIR", _default_cache_dir()),
                f"host_{_host_fingerprint()}"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the knobs
        pass

from hydrolim_tpu.core.config import ParticleConfig, ParticleParams, PDEConfig, PDEParams  # noqa: F401
from hydrolim_tpu.particles.system import ParticleSystem  # noqa: F401

try:  # pde facade lands after the particle engine in the build order
    from hydrolim_tpu.pde.system import IMEXPDE  # noqa: F401
except ImportError:  # pragma: no cover
    pass
