"""Throughput benchmark (BASELINE.json target).

Headline metric: particle-steps/sec/chip at N=1e5 with a 64-point β-sweep
resident on one chip (mean-field bench config: global magnetization,
bidirectional active hops, no exclusion — BASELINE.json configs 1/4).
North star: ≥ 1e9; ``vs_baseline`` reports value / 1e9.

Secondary metrics (stderr): IMEX PDE steps/sec (L=1000, reference single-run
shape) and β-sweep replicas/sec.
"""
import json
import os
import subprocess
import sys
import time


def _wait_for_backend(max_wait_s: float = 540.0) -> bool:
    """Block (boundedly) until JAX backend init succeeds in a PROBE
    subprocess.  The axon worker faults after sustained sessions and takes
    ~5-20 min to return; while it is down, ANY backend init — even
    jax.devices('cpu') — blocks forever, which would hang this benchmark
    (and the driver waiting on it) indefinitely.  Probing in a subprocess
    keeps this process unblocked; on success the real init below hits a
    live worker.  Returns False after max_wait_s — the budget is kept WELL
    under the driver's ~1800 s timeout so an outage degrades to a parseable
    JSON error record (main()) instead of an rc=124 null (BENCH_r03)."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=60, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"# backend probe: worker back after {attempt} "
                          f"attempts ({time.time() - t0:.0f} s)",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            print(f"# backend init still blocking after {waited:.0f} s "
                  f"(axon worker down?) — emitting error record instead of "
                  f"hanging", file=sys.stderr)
            return False
        print(f"# backend probe attempt {attempt}: init blocked/failing; "
              f"retrying ({waited:.0f}/{max_wait_s:.0f} s)", file=sys.stderr)
        time.sleep(45)


import jax

# Persistent compilation cache: repeat bench runs skip the recompile.  The
# package install below (import hydrolim_tpu...) configures the per-user,
# host-fingerprinted cache dir with the same policy as every other entry
# point: OFF for cpu-pinned sessions and under HYDROLIM_NO_COMPILATION_CACHE
# (XLA:CPU executable serialization for cache writes segfaults
# intermittently on some hosts — this module is also exec'd in-process by
# the test suite's importability check, which must not re-enable the cache
# for the rest of the suite).
import hydrolim_tpu  # noqa: F401  (side effect: cache config)
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.particles.init import init_particles
from hydrolim_tpu.particles.stepper import build_static_arrays, step
from hydrolim_tpu.sweeps.ensemble import broadcast_params, ensemble_dt


#: timing windows per bench row (VERDICT r4 #6): every row is measured as
#: ``_SAMPLES`` independent pipelined windows (each window = ``reps`` chained
#: dispatches, one sync), so the emitted record carries a spread and
#: round-over-round diffs can tell a regression from axon session variance.
_SAMPLES = int(os.environ.get("HYDROLIM_BENCH_SAMPLES", 3))


def bench_particle_steps_pallas(B=64, N=100_000, L=1000, K_steps=1000,
                                reps=3):
    """Fused multi-step Pallas kernel (state resident in VMEM across steps).

    Timed with a forced device→host copy per rep — async dispatch of the
    aliased-buffer kernel makes bare block_until_ready unreliable."""
    from hydrolim_tpu.ops.pallas_stepper import meanfield_multi_step, pack_particles

    rng = np.random.default_rng(0)
    pos = rng.integers(0, L, (B, N))
    sigma = rng.choice([-1, 1], (B, N))
    wind = np.zeros((B, N), int)
    p, s, w = pack_particles(pos, sigma, wind)
    scal = np.zeros((B, 3), np.float32)
    scal[:, 0] = np.linspace(0.0, 3.0, B)
    scal[:, 1] = 0.5
    scal[:, 2] = 2.0
    scal = jnp.asarray(scal)
    seeds0 = jnp.asarray(rng.integers(0, 2 ** 30, B), jnp.int32)

    run = lambda f, a, b, c: meanfield_multi_step(
        scal, seeds0 + f, a, b, c, L=L, k_steps=K_steps, dt=0.002,
        bidirectional=True, n_active=N)
    p, s, w = run(0, p, s, w)
    np.asarray(p[0, 0])          # force completion
    # pipelined: chain reps invocations, one device→host sync at the end
    # (the final copy serializes behind the whole chain)
    vals, walls, frame = [], [], 1
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        for _ in range(reps):
            p, s, w = run(frame, p, s, w)
            frame += 1
        np.asarray(p[0, 0])      # device→host sync
        wall = (time.perf_counter() - t0) / reps
        vals.append(B * N * K_steps / wall)
        walls.append(wall)
    return vals, float(np.mean(walls))


def bench_particle_steps(B=64, N=100_000, L=1000, K_steps=100, reps=5):
    config = ParticleConfig(
        L=L, N=N, n_pad=N, init="fixed", scale_rates=False,
        local_kernel_sigma=0.0, periodic=True, site_capacity=None,
        active_model="bidirectional")
    params = broadcast_params(config, beta=np.linspace(0.0, 3.0, B),
                              rate_diffusion=0.5, rate_active=2.0)
    dt = ensemble_dt(config, beta_max=3.0, rate_diffusion=0.5,
                     rate_active=2.0)
    statics = build_static_arrays(config)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(lambda k: init_particles(config, k)))(keys)
    jax.block_until_ready(states.pos)

    @jax.jit
    def advance(params, states):
        def body(st, _):
            st = jax.vmap(
                lambda p, s: step(config, p, statics, s, dt,
                                  jnp.float32(0.0)))(params, st)
            return st, ()
        states, _ = jax.lax.scan(body, states, None, length=K_steps)
        return states

    states = advance(params, states)          # compile + warm
    jax.block_until_ready(states.pos)
    # pipelined sustained-throughput timing (see bench_k3_flagship)
    vals, walls = [], []
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        for _ in range(reps):
            states = advance(params, states)
        jax.block_until_ready(states.pos)
        wall = (time.perf_counter() - t0) / reps
        vals.append(B * N * K_steps / wall)
        walls.append(wall)
    return vals, float(np.mean(walls))


def bench_pde_steps(L=1000, nsteps=2000, reps=3, B=1):
    """IMEX steps/sec; with B > 1 the batch advances together, so the
    aggregate replica-steps/sec shows the sweep-mode throughput."""
    from hydrolim_tpu.core.config import PDEConfig, make_pde_params
    from hydrolim_tpu.pde.stepper import build_pde_ops, pde_step

    config = PDEConfig(L=L, T=nsteps * 5e-4, dt=5e-4, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=0.005)
    params = make_pde_params(gamma=0.2, lam=0.6, beta=2.0)
    ops = build_pde_ops(config, params)
    rng = np.random.default_rng(0)
    shape = (L,) if B == 1 else (B, L)
    p = jnp.asarray(rng.random(shape) / L, jnp.float32)
    m = jnp.asarray(rng.random(shape) / L, jnp.float32)

    @jax.jit
    def advance(p, m):
        def body(c, _):
            return pde_step(config, params, ops, c[0], c[1]), ()
        (p, m), _ = jax.lax.scan(body, (p, m), None, length=nsteps)
        return p, m

    p1, m1 = advance(p, m)
    jax.block_until_ready(p1)
    # pipelined sustained-throughput timing (see bench_k3_flagship)
    vals = []
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        for _ in range(reps):
            p1, m1 = advance(p1, m1)
        jax.block_until_ready(p1)
        vals.append(nsteps / ((time.perf_counter() - t0) / reps))
    return vals


def bench_lattice_gas(B=64, L=1000, K_steps=500, reps=3):
    """Site-centric K=1 exclusion engine with full local-kernel smoothing."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.fields.magnetization import build_mfield_op
    from hydrolim_tpu.particles.lattice_gas import lg_init, lg_step
    from hydrolim_tpu.sweeps.ensemble import broadcast_params

    config = ParticleConfig(L=L, N=L // 2, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.005, periodic=True,
                            site_capacity=1, active_model="plus_forward")
    params = broadcast_params(config, beta=np.linspace(0, 3, B),
                              rate_diffusion=0.02, rate_active=5.0)
    mf = build_mfield_op(L, config.dx, 0.005, True)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    occ = jax.jit(jax.vmap(lambda k: lg_init(config, k)))(keys)

    @jax.jit
    def advance(occ, key):
        def body(c, _):
            o, k = c
            k, sub = jax.random.split(k)
            subs = jax.random.split(sub, B)
            o, _aux = jax.vmap(
                lambda p, oo, kk: lg_step(config, p, mf, oo, kk, 4e-3))(
                    params, o, subs)
            return (o, k), ()
        (occ, key), _ = jax.lax.scan(body, (occ, key), None, length=K_steps)
        return occ, key

    key = jax.random.PRNGKey(1)
    occ, key = advance(occ, key)
    jax.block_until_ready(occ)
    # pipelined sustained-throughput timing (see bench_k3_flagship)
    vals = []
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        for _ in range(reps):
            occ, key = advance(occ, key)
        jax.block_until_ready(occ)
        vals.append(B * (L // 2) * K_steps / ((time.perf_counter() - t0)
                                              / reps))
    return vals


def bench_k3_flagship(B=16, reps=2):
    """Reference flagship exclusion config (K=3, plus_forward, non-periodic,
    local kernel — PARTICLE_solver_BIOLOGY_EXCLUSION.py:55-94) on the
    site-centric slot engine.  Returns (single-replica, B-replica)
    particle-steps/sec."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.particles.lattice_gas_k import run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import broadcast_params

    config = ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.002, periodic=False,
                            site_capacity=3, active_model="plus_forward",
                            minus_anchor=True)
    dt, T, obs_dt = 2e-3, 20.0, 0.5
    nsteps = int(T / dt)

    def run_once(nb):
        params = broadcast_params(config, beta=np.full(nb, 0.7),
                                  rate_diffusion=0.0, rate_active=5.0)
        f = lambda s: run_lattice_gas_k(config, params,
                                        jax.random.PRNGKey(s), T=T,
                                        obs_dt=obs_dt, dt=dt, n_tracers=64)
        _, slots = f(0)
        jax.block_until_ready(slots)
        # pipelined sustained-throughput timing: issue all reps without
        # intermediate blocking so the tunnel's per-dispatch round-trip
        # (degrades to ~300 ms under sustained load — ROADMAP.md) overlaps
        # with device compute instead of being charged to every rep
        vals, seed = [], 1
        for _ in range(_SAMPLES):
            t0 = time.perf_counter()
            outs = [f(seed + r) for r in range(reps)]
            seed += reps
            for _, slots in outs:
                jax.block_until_ready(slots)
            vals.append(nb * 750 * nsteps / ((time.perf_counter() - t0)
                                             / reps))
        return vals

    return run_once(1), run_once(B)


def bench_k3_pallas(B=16, reps=2):
    """Fused Pallas exclusion kernel at the flagship config (10k steps
    resident in VMEM per invocation)."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        build_narrow_smooth,
        exclusion_multi_step,
        narrow_smooth_radius,
        pack_slots,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    config = ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.002, periodic=False,
                            site_capacity=3, active_model="plus_forward")
    # production smoothing route (sweeps/fast_exclusion.py): the flagship's
    # σ_grid=2 takes the narrow rolled path, not the dense (Lp, Lp) matmul
    sr = narrow_smooth_radius(config)
    conv = build_narrow_smooth(config, sr) if sr else build_conv_matrix(
        config)
    ksteps = 10_000

    def run_once(nb):
        from hydrolim_tpu.sweeps.fast_exclusion import _pick_r_batch

        R = _pick_r_batch(config, nb)
        if nb % R:
            R = 1
        keys = jax.random.split(jax.random.PRNGKey(0), nb)
        slots0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
        sl = pack_slots(slots0)
        scal = np.zeros((nb, 3), np.float32)
        scal[:, 0], scal[:, 2] = 0.7, 5.0
        seeds = np.arange(nb, dtype=np.int32)
        run = lambda f, s: exclusion_multi_step(
            jnp.asarray(scal), seeds + f, s, conv, L=1000, K=3,
            k_steps=ksteps, dt=2e-3, periodic=False, bidirectional=False,
            use_local_m=True, smooth_radius=sr, r_batch=R)
        sl = run(0, sl)
        jax.block_until_ready(sl)
        # pipelined: chain reps invocations (each consumes the previous
        # slots), block once — sustained throughput, dispatch overlapped
        vals, frame = [], 1
        for _ in range(_SAMPLES):
            t0 = time.perf_counter()
            for _ in range(reps):
                sl = run(frame, sl)
                frame += 1
            jax.block_until_ready(sl)
            vals.append(nb * 750 * ksteps / ((time.perf_counter() - t0)
                                             / reps))
        return vals

    return run_once(1), run_once(B)


def bench_k3_rb(B=16, reps=2):
    """Replica-banked fused exclusion kernel (ops/pallas_exclusion_rb.py):
    (K, R, Lp) layout with replicas on the sublane axis — 100% sublane
    occupancy at any K.  Same flagship config as bench_k3_pallas."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.ops.pallas_exclusion_rb import (
        build_conv_matrix,
        build_narrow_smooth,
        exclusion_multi_step_rb,
        narrow_smooth_radius,
        pack_slots_rb,
    )
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init

    config = ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.002, periodic=False,
                            site_capacity=3, active_model="plus_forward")
    sr = narrow_smooth_radius(config)    # production smoothing route
    conv = build_narrow_smooth(config, sr) if sr else build_conv_matrix(
        config)
    ksteps = 10_000

    def run_once(nb):
        R = nb if nb <= 32 else 32          # one grid program up to R=32
        keys = jax.random.split(jax.random.PRNGKey(0), nb)
        slots0 = np.stack([np.asarray(lgk_init(config, k)) for k in keys])
        sl = pack_slots_rb(slots0)
        scal = np.zeros((nb, 3), np.float32)
        scal[:, 0], scal[:, 2] = 0.7, 5.0
        seeds = np.arange(nb, dtype=np.int32)
        run = lambda f, s: exclusion_multi_step_rb(
            jnp.asarray(scal), seeds + f, s, conv, L=1000, K=3,
            k_steps=ksteps, dt=2e-3, periodic=False, bidirectional=False,
            use_local_m=True, smooth_radius=sr, r_batch=R)
        sl = run(0, sl)
        jax.block_until_ready(sl)
        vals, frame = [], 1
        for _ in range(_SAMPLES):
            t0 = time.perf_counter()
            for _ in range(reps):
                sl = run(frame, sl)
                frame += 1
            jax.block_until_ready(sl)
            vals.append(nb * 750 * ksteps / ((time.perf_counter() - t0)
                                             / reps))
        return vals

    return run_once(1), run_once(B)


def bench_pde_sweep_fused(T=10.0, n_runs=3, reps=2):
    """Reference β-sweep scale (11 β × n_runs, L=1000, dt=5e-4, 1000
    tracers, near-global kernel — IMEX_PDE_solver_run_sweep.py:26-40) on the
    fused Pallas PDE kernel (ops/pallas_pde.py).  Returns (aggregate
    replica-steps/s, warm wall seconds)."""
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    beta_values = np.linspace(0, 3, 11).astype(np.float32)
    # fft_kmax=8 is the sweep drivers' production value (sweeps/pde_sweeps.py)
    # and keeps the per-step spectra inside the fused kernel's record rows;
    # without it the kernel runs in its warned degraded mode (kmax=501 >
    # 62: chunk-start-cadence spectra only) and the benched path is not the
    # production one (VERDICT r4 #3/#4).
    config = PDEConfig(L=1000, T=T, dt=5e-4, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=1e5 - 10,
                       snapshot_interval=1000, n_tracers=1000,
                       tracer_window_time=0.25, fft_kmax=8)
    flat_beta = np.repeat(beta_values, n_runs)
    B = flat_beta.shape[0]
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.full(B, 0.6),
                         beta=jnp.asarray(flat_beta))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=1000))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(7)
    run = lambda: pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                                  engine="pallas")
    jax.block_until_ready(run().rho_p)        # compile + warm
    # pipelined sustained-throughput timing (see bench_k3_flagship)
    vals, walls = [], []
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        for o in outs:
            jax.block_until_ready(o.rho_p)
        wall = (time.perf_counter() - t0) / reps
        vals.append(B * config.nsteps / wall)
        walls.append(wall)
    return vals, float(np.mean(walls))


def bench_pde_fused_bigbatch(B=512, T=2.0, reps=1):
    """Fused PDE engine at chip-filling batch (VERDICT r4 #3): B replicas
    (e.g. a 32 β × 16 λ phase-diagram grid) in ONE fused-kernel program —
    the regime where the launch-bound small-batch overhead (~4% MXU at
    B=33) amortizes.  Reference per-replica physics scale (L=1000,
    dt=5e-4, near-global kernel); shorter horizon + trimmed tracer ring so
    the per-step record block (B × nsteps × 128 lanes) stays in HBM.
    At this shape the R heuristic banks 32 replicas per program (64 MXU
    rows on the solve matmul — measured 1.16e6 → 2.59e6 replica-steps/s
    over the r4 R=8 layout; XLA at the same B does 2.2e6 WITHOUT records
    or tracers).  Returns (samples list, mean warm wall)."""
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    config = PDEConfig(L=1000, T=T, dt=5e-4, bc="periodic",
                       gaussian_kernel=True, kernel_sigma=1e5 - 10,
                       snapshot_interval=1000, n_tracers=256,
                       tracer_window_time=0.05, fft_kmax=8)
    beta = np.repeat(np.linspace(0.0, 3.0, 32), B // 32).astype(np.float32)
    lam = np.tile(np.linspace(0.1, 1.2, B // 32), 32).astype(np.float32)
    params_b = PDEParams(gamma=jnp.full(B, 0.2), lam=jnp.asarray(lam),
                         beta=jnp.asarray(beta))
    ops = build_pde_ops(config, make_pde_params(gamma=0.2, lam=0.6, beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=256))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(7)
    run = lambda: pde_solve_fused(config, params_b, ops, rp, rm, tr, key,
                                  engine="pallas", keep_snapshots=False)
    jax.block_until_ready(run().rho_p)        # compile + warm
    vals, walls = [], []
    for _ in range(_SAMPLES):
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        for o in outs:
            jax.block_until_ready(o.rho_p)
        wall = (time.perf_counter() - t0) / reps
        vals.append(B * config.nsteps / wall)
        walls.append(wall)
    return vals, float(np.mean(walls))


def bench_pde_banded_large_L(L=8192, nsteps=2000, B=4, reps=2):
    """Large-L fused scope (VERDICT r2 #7 bench row): the banded in-kernel
    solve at L=8192 (γ·dt/dx² O(1), dt scaled with dx) vs the XLA banded
    batch solve.  Returns (fused aggregate replica-steps/s, xla ditto)."""
    from hydrolim_tpu.core.config import PDEConfig, PDEParams, make_pde_params
    from hydrolim_tpu.pde.fast_solve import _solve_mode_of, pde_solve_fused
    from hydrolim_tpu.pde.init import pde_initialize
    from hydrolim_tpu.pde.stepper import build_pde_ops

    gamma, dt = 0.2, 2e-7
    config = PDEConfig(L=L, T=dt * nsteps, dt=dt, bc="periodic",
                       gaussian_kernel=False, snapshot_interval=nsteps // 4,
                       n_tracers=64, tracer_window_time=20 * dt, fft_kmax=8,
                       diffusion_solver="banded")
    assert _solve_mode_of(config, gamma)[0] == "banded"
    params_b = PDEParams(gamma=jnp.full(B, gamma), lam=jnp.full(B, 0.6),
                         beta=jnp.linspace(0.5, 2.5, B))
    ops = build_pde_ops(config, make_pde_params(gamma=gamma, lam=0.6,
                                                beta=0.0))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    init = jax.vmap(lambda k: pde_initialize(config, k, mode="homogeneous",
                                             noise=0.3, n_tracers=64))
    rp, rm, tr = init(keys)
    key = jax.random.PRNGKey(3)

    def timed(engine, samples):
        run = lambda: pde_solve_fused(config, params_b, ops, rp, rm, tr,
                                      key, engine=engine,
                                      keep_snapshots=False)
        jax.block_until_ready(run().rho_p)
        vals = []
        for _ in range(samples):
            t0 = time.perf_counter()
            outs = [run() for _ in range(reps)]
            for o in outs:
                jax.block_until_ready(o.rho_p)
            vals.append(B * config.nsteps / ((time.perf_counter() - t0)
                                             / reps))
        return vals

    # the XLA banded batch is ~16 s per rep — cap its windows so the
    # comparison row doesn't eat the watchdog deadline
    return timed("pallas", _SAMPLES), timed("xla", min(2, _SAMPLES))


def bench_pde_solve_full():
    """Full PDE solve at the reference single-run scale (L=1000, T=20,
    dt=5e-4, 1000 tracers, kernel σ=0.005 — IMEX_PDE_solver_run.py:7-34),
    including per-step records + tracer SDE.  Returns warm steps/sec."""
    from hydrolim_tpu import IMEXPDE

    pde = IMEXPDE(L=1000, T=20.0, dt=5e-4, gamma=0.0, lam=0.6, beta=2.0,
                  bc="periodic", gaussian_kernel=True, kernel_sigma=0.005,
                  seed=58, outdir="/tmp/bench_pde")
    pde.initialize("poisson", noise=0.05, n_tracers=1000)
    pde.solve()                       # compile + warm
    vals, walls = [], []
    for _ in range(max(2, _SAMPLES - 1)):    # ~9.5 s per solve
        pde.initialize("poisson", noise=0.05, n_tracers=1000)
        t0 = time.perf_counter()
        pde.solve()
        dt_wall = time.perf_counter() - t0
        vals.append(pde.config.nsteps / dt_wall)
        walls.append(dt_wall)
    return vals, float(np.mean(walls))


# per-particle-step VPU lane-op estimate for the fused Pallas kernel body
# (ops/pallas_stepper.py:_kernel): ~8 for exp, ~12 compare/select for the
# event thresholds, ~10 int update/wrap, ~8 PRNG+scale, ~5 reduction share.
_PALLAS_OPS_PER_STEP = 43
_V5E_VPU_PEAK = 3.8e12  # lane-ops/s: 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz
_V5E_MXU_F32 = 4.9e13   # FLOPs/s: 197 TF bf16 / 4 for full-f32 (HIGHEST)


def _exclusion_ops_per_lane(K: int) -> int:
    """VPU lane-op estimate per (slot-row, lane) element per step of the
    fused exclusion kernel body (ops/pallas_exclusion.py:_kernel): ~10
    occupancy/sign/shift, ~14 rate assembly + event thresholds, ~8 PRNG +
    mask/scale, ~6·K admission min-rounds over 2Kp rows, ~9·Kp compaction
    running-count selects (the 3Kp→Kp front-pack dominates)."""
    Kp = -(-K // 4) * 4
    return 32 + 6 * K + 9 * Kp


def bench_multichip_sweep_virtual(n_devices=8, timeout=900):
    """Multi-device sweep path, recorded (VERDICT r2 #9): the flagship
    β-sweep driver through the public ``n_devices=`` API on a virtual
    n-device CPU mesh, vs the same run unsharded.  Runs in a subprocess
    (the virtual devices need XLA_FLAGS before backend init).  Wall ratios
    on one host share physical cores — this records that the sharded path
    executes end-to-end with bit-equal observables, not an ICI speedup."""
    import os
    import subprocess

    code = r"""
import json, time
import jax
import numpy as np
# belt-and-braces CPU pin: the axon TPU plugin ignores JAX_PLATFORMS=cpu
# in some invocations (CLAUDE.md); without this the unsharded baseline
# could run on the TPU while the sharded run uses the virtual CPU mesh —
# different backends, meaningless comparison
jax.config.update("jax_default_device", jax.devices("cpu")[0])
from hydrolim_tpu.sweeps.beta_sweep import sweep_over_betas, make_exp_gradient
g = make_exp_gradient(L=200, N=120, frac_plus=0.75, decay_length=0.35,
                      anchor_positions=None)
ps = dict(L=200, xlim=1, rate_diffusion=0.02, rate_active=5, N=120,
          init="poisson", scale_rates=False, local_kernel_sigma=0.005,
          periodic=False, site_capacity=1, k_on=0, k_off=0, k_exit=0)
kw = dict(n_runs_per_beta=2, ps_kwargs=ps,
          init_kwargs=dict(rho0_plus=g[0], rho0_minus=g[1]),
          run_kwargs=dict(T=4.0, obs_dt=0.2), outdir="/tmp/bench_mc",
          seed=3, do_fit=False, plot_result=False, engine="lattice_gas")
betas = np.linspace(0, 3, 8)
# time the SECOND call of each variant — the first pays jit compiles and
# would make the comparison cold-vs-warm
sweep_over_betas(betas, npz_path="/tmp/bench_mc/a.npz", **kw)
t0 = time.time()
a = sweep_over_betas(betas, npz_path="/tmp/bench_mc/a.npz", **kw)
w1 = time.time() - t0
sweep_over_betas(betas, npz_path="/tmp/bench_mc/b.npz", n_devices=%d, **kw)
t0 = time.time()
b = sweep_over_betas(betas, npz_path="/tmp/bench_mc/b.npz",
                     n_devices=%d, **kw)
wn = time.time() - t0
ma, mb = np.asarray(a["means"]), np.asarray(b["means"])
# trajectories are bit-identical under sweep-DP; the local-m smoothing /
# DFT record matmuls may reassociate at different shard-local shapes, so
# float observables agree to ~1 ulp rather than bitwise (global-m configs
# are exactly bitwise — tests/test_parallel.py)
rel = float(np.max(np.abs(ma - mb) / (np.abs(ma) + 1e-12)))
print(json.dumps({"wall_1": w1, "wall_n": wn,
                  "equal": bool(np.array_equal(ma, mb)),
                  "max_rel_diff": rel,
                  "close": bool(np.allclose(ma, mb, rtol=1e-4))}))
""" % (n_devices, n_devices)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{n_devices}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=timeout,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def _emit(record):
    """The bench contract: exactly ONE JSON line on stdout, always."""
    print(json.dumps(record))


def _row(vals):
    """Engine record row (VERDICT r4 #6): mean over the independent timing
    windows plus the relative peak-to-peak spread, so round-over-round
    diffs can tell a real regression from axon session variance (k1
    lattice-gas measured 4.0e8-6.5e8 across sessions at identical code)."""
    vals = [float(v) for v in vals]
    v = float(np.mean(vals))
    spread = float((max(vals) - min(vals)) / v) if len(vals) > 1 and v else 0.0
    return {"value": v, "spread": round(spread, 4), "samples": len(vals)}


def _dispatch_latency_ms(n=5):
    """Round-trip latency of a trivial dispatch — the worker-freshness
    probe: a fresh axon worker answers in ~1-10 ms, a degraded session in
    ~300 ms (ROADMAP).  Recorded at bench start and end so the engines'
    spread has an environment covariate."""
    jax.block_until_ready(jnp.zeros(()) + 1)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.zeros(()) + 1)
    return round((time.perf_counter() - t0) / n * 1e3, 3)


def main():
    # probe in main(), NOT at import: tests exec the module to check the
    # entry points exist, and an import-time probe would block them for
    # the whole retry budget while the worker is down
    if os.environ.get("HYDROLIM_BENCH_NO_PROBE", "") != "1":
        budget = float(os.environ.get("HYDROLIM_BENCH_PROBE_BUDGET", 540.0))
        if not _wait_for_backend(budget):
            _emit({"error": "backend down",
                   "detail": "axon worker: jax.devices() blocked for the "
                             f"whole probe budget ({budget:.0f} s)",
                   "metric": "particle-steps/sec/chip "
                             "(N=1e5, 64-point beta sweep)",
                   "value": None, "unit": "particle-steps/s",
                   "vs_baseline": None,
                   # keep the record schema uniform with success records
                   # so round-over-round diff tools never KeyError
                   "timing": "pipelined-mean", "engines": {}})
            return
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    # per-engine record (VERDICT r3 #1): machine-diffable round-over-round;
    # None = that engine's bench failed/unavailable (reason on stderr).
    # Timing methodology for every number: pipelined mean (one sync after
    # `reps` chained dispatches), NOT min-of-reps — see README/VALIDATION.
    # Each numeric row is {value, spread, samples} over _SAMPLES independent
    # timing windows (VERDICT r4 #6).
    engines = {}
    worker = {"dispatch_ms_start": _dispatch_latency_ms()}
    print(f"# worker freshness: {worker['dispatch_ms_start']} ms/dispatch "
          f"at bench start", file=sys.stderr)

    # Ordering: once any LARGE program has run, this remote worker's eager
    # dispatches degrade to ~300 ms synchronous round-trips (bisected: the
    # K=3 run_lattice_gas_k wrapper's few eager init dispatches go from
    # pipelined-free to dominating a 50 ms run — a 36x metric distortion,
    # same compiled code).  So the K=3 flagship pair runs FIRST, before the
    # 64x1e5 particle benches; the headline JSON (particle XLA/Pallas max)
    # is printed at the end regardless of ordering.
    try:
        k3_1, k3_b = bench_k3_flagship()
        engines["k3_slot_single"] = _row(k3_1)
        engines["k3_slot_b16"] = _row(k3_b)
        print(f"# K=3 flagship (site-centric slot engine): "
              f"{np.mean(k3_1):.3e} particle-steps/sec single replica, "
              f"{np.mean(k3_b):.3e} at B=16", file=sys.stderr)
    except Exception as e:
        engines["k3_slot_single"] = engines["k3_slot_b16"] = None
        print(f"# K=3 flagship bench failed: {e}", file=sys.stderr)
    try:
        k3p_1, k3p_b = bench_k3_pallas()
        engines["k3_fused_single"] = _row(k3p_1)
        engines["k3_fused_b16"] = _row(k3p_b)
        # roofline: lane-elements/s = replica-steps/s x Kp x Lp (slot tiles)
        ops = _exclusion_ops_per_lane(3)
        vpu_frac = (np.mean(k3p_b) / 750) * 4 * 1024 * ops / _V5E_VPU_PEAK
        print(f"# K=3 flagship (fused Pallas exclusion kernel): "
              f"{np.mean(k3p_1):.3e} single replica, {np.mean(k3p_b):.3e} "
              f"at B=16 (R-batched grid; ~{100 * vpu_frac:.0f}% of v5e VPU "
              f"roofline at {ops} lane-ops/slot-element est.)",
              file=sys.stderr)
    except Exception as e:
        engines["k3_fused_single"] = engines["k3_fused_b16"] = None
        print(f"# K=3 pallas bench unavailable: {e}", file=sys.stderr)
    try:
        k3r_1, k3r_b = bench_k3_rb()
        engines["k3_rb_single"] = _row(k3r_1)
        engines["k3_rb_b16"] = _row(k3r_b)
        print(f"# K=3 flagship (replica-banked fused kernel): "
              f"{np.mean(k3r_1):.3e} single replica, {np.mean(k3r_b):.3e} "
              f"at B=16 ((K, R, Lp) sublane-packed layout)", file=sys.stderr)
    except Exception as e:
        engines["k3_rb_single"] = engines["k3_rb_b16"] = None
        print(f"# K=3 replica-banked bench unavailable: {e}", file=sys.stderr)
    pps_v, step_time = bench_particle_steps()
    engines["meanfield_xla"] = _row(pps_v)
    pps = float(np.mean(pps_v))
    print(f"# particle bench (XLA path): {pps:.3e} particle-steps/sec/chip "
          f"(64x1e5 batch, {step_time * 1e3:.1f} ms / 100 steps)",
          file=sys.stderr)
    try:
        pps_pl_v, t_pl = bench_particle_steps_pallas()
        engines["meanfield_pallas"] = _row(pps_pl_v)
        pps_pl = float(np.mean(pps_pl_v))
        vpu_frac = pps_pl * _PALLAS_OPS_PER_STEP / _V5E_VPU_PEAK
        print(f"# particle bench (Pallas fused): {pps_pl:.3e} "
              f"particle-steps/sec/chip ({t_pl * 1e3:.1f} ms / 1000 steps); "
              f"~{pps_pl * _PALLAS_OPS_PER_STEP:.2e} VPU lane-ops/s "
              f"≈ {100 * vpu_frac:.0f}% of v5e VPU roofline "
              f"({_PALLAS_OPS_PER_STEP} ops/step est.)", file=sys.stderr)
        pps = max(pps, pps_pl)
    except Exception as e:  # Mosaic unavailable off-TPU
        engines["meanfield_pallas"] = None
        print(f"# pallas bench unavailable: {e}", file=sys.stderr)
    try:
        lg = bench_lattice_gas()
        engines["lattice_gas_k1"] = _row(lg)
        print(f"# lattice-gas bench (K=1 exclusion, local kernel): "
              f"{np.mean(lg):.3e} particle-equivalent steps/sec",
              file=sys.stderr)
    except Exception as e:
        engines["lattice_gas_k1"] = None
        print(f"# lattice-gas bench failed: {e}", file=sys.stderr)
    try:
        pde_sps = bench_pde_steps()
        engines["pde_imex_single"] = _row(pde_sps)
        print(f"# pde bench: {np.mean(pde_sps):.3e} IMEX steps/sec (L=1000)",
              file=sys.stderr)
        pde_sps_b = bench_pde_steps(B=32)
        engines["pde_imex_b32_aggregate"] = _row([32 * v for v in pde_sps_b])
        print(f"# pde bench (batched B=32): {32 * np.mean(pde_sps_b):.3e} "
              f"aggregate replica-steps/sec", file=sys.stderr)
    except Exception as e:  # secondary metric must not kill the headline
        engines.setdefault("pde_imex_single", None)
        engines.setdefault("pde_imex_b32_aggregate", None)
        print(f"# pde bench failed: {e}", file=sys.stderr)
    try:
        fsw_v, fsw_wall = bench_pde_sweep_fused()
        engines["pde_fused_sweep_aggregate"] = _row(fsw_v)
        fsw_sps = float(np.mean(fsw_v))
        # roofline: the dense implicit solve is the FLOPs hog — one
        # (2, Lp)@(Lp, Lp) f32-HIGHEST matmul per replica-step (global-m
        # route: no smoothing matmul); everything else is ~60 VPU
        # lane-ops/site
        Lp = 1024
        mxu_frac = fsw_sps * 2 * 2 * Lp * Lp / _V5E_MXU_F32
        vpu_frac = fsw_sps * 60 * Lp / _V5E_VPU_PEAK
        print(f"# pde fused sweep (11 beta x 3 runs, 20k steps, 1000 "
              f"tracers, per-step kmax=8 spectra, Pallas kernel): "
              f"{fsw_sps:.3e} aggregate "
              f"replica-steps/sec, {fsw_wall:.1f} s warm wall "
              f"(~{100 * mxu_frac:.0f}% of f32 MXU roofline on the solve "
              f"matmul + ~{100 * vpu_frac:.0f}% VPU on the step body; "
              f"XLA batch path: ~7.6 s at the same scale, round-4 "
              f"measurement)", file=sys.stderr)
    except Exception as e:
        engines["pde_fused_sweep_aggregate"] = None
        print(f"# pde fused-sweep bench unavailable: {e}", file=sys.stderr)
    try:
        big_v, big_wall = bench_pde_fused_bigbatch()
        engines["pde_fused_b512_aggregate"] = _row(big_v)
        big = float(np.mean(big_v))
        Lp = 1024
        mxu_frac = big * 2 * 2 * Lp * Lp / _V5E_MXU_F32
        print(f"# pde fused big-batch (B=512: 32 beta x 16 lambda grid, "
              f"4k steps, one program): {big:.3e} aggregate "
              f"replica-steps/sec, {big_wall:.1f} s warm wall "
              f"(~{100 * mxu_frac:.0f}% of f32 MXU roofline on the solve "
              f"matmul)", file=sys.stderr)
    except Exception as e:
        engines["pde_fused_b512_aggregate"] = None
        print(f"# pde fused big-batch bench unavailable: {e}",
              file=sys.stderr)
    try:
        full_v, full_wall = bench_pde_solve_full()
        engines["pde_full_solve"] = _row(full_v)
        print(f"# pde full solve (reference single-run scale, records + "
              f"1000 tracers): {np.mean(full_v):.3e} steps/sec, "
              f"{full_wall:.1f} s wall for 40k steps", file=sys.stderr)
    except Exception as e:
        engines["pde_full_solve"] = None
        print(f"# pde full-solve bench failed: {e}", file=sys.stderr)
    try:
        bl_p, bl_x = bench_pde_banded_large_L()
        engines["pde_banded_l8192_fused"] = _row(bl_p)
        engines["pde_banded_l8192_xla"] = _row(bl_x)
        print(f"# pde banded large-L (L=8192, in-kernel rolled solve): "
              f"{np.mean(bl_p):.3e} aggregate replica-steps/sec fused vs "
              f"{np.mean(bl_x):.3e} XLA banded batch", file=sys.stderr)
    except Exception as e:
        engines["pde_banded_l8192_fused"] = None
        engines["pde_banded_l8192_xla"] = None
        print(f"# pde banded large-L bench unavailable: {e}",
              file=sys.stderr)
    try:
        mc = bench_multichip_sweep_virtual()
        engines["multichip_sweep_ok"] = bool(mc["close"])
        print(f"# multi-device sweep (8-way virtual CPU mesh, public "
              f"n_devices= API): {mc['wall_n']:.1f} s sharded vs "
              f"{mc['wall_1']:.1f} s unsharded on one host; observables "
              f"bit-equal: {mc['equal']}, within 1e-4: {mc['close']} "
              f"(max rel diff {mc['max_rel_diff']:.1e} — record-matmul "
              f"reduction order; trajectories are bit-identical, and "
              f"global-m configs are exactly bitwise; real ICI scaling "
              f"needs a pod)", file=sys.stderr)
    except Exception as e:
        engines["multichip_sweep_ok"] = None
        print(f"# multi-device sweep bench unavailable: {e}", file=sys.stderr)

    worker["dispatch_ms_end"] = _dispatch_latency_ms()
    print(f"# worker freshness: {worker['dispatch_ms_end']} ms/dispatch "
          f"at bench end", file=sys.stderr)
    _emit({
        "metric": "particle-steps/sec/chip (N=1e5, 64-point beta sweep)",
        "value": pps,
        "unit": "particle-steps/s",
        "vs_baseline": pps / 1e9,
        "timing": "pipelined-mean",
        "samples_per_row": _SAMPLES,
        "worker": worker,
        "engines": engines,
    })


def _error_record(error: str, **extra):
    rec = {"error": error,
           "metric": "particle-steps/sec/chip (N=1e5, 64-point beta sweep)",
           "value": None, "unit": "particle-steps/s", "vs_baseline": None,
           "timing": "pipelined-mean", "engines": {}}
    rec.update(extra)
    return rec


def _watchdog() -> None:
    """Run the bench body in a CHILD process under a hard deadline.

    The probe (_wait_for_backend) only covers a worker that is down at
    START; the axon worker also faults MID-session, and a jax call that
    blocks inside backend C++ holds the GIL, so no in-process signal or
    timer can recover — the driver then kills the whole bench at its
    ~1800 s budget and records an unparseable rc=124 null (BENCH_r03).
    The parent therefore does no jax work at all: it re-execs this script
    with HYDROLIM_BENCH_CHILD=1, relays the child's one JSON line, and on
    a blown deadline kills the child and emits the error record itself."""
    deadline = float(os.environ.get("HYDROLIM_BENCH_DEADLINE", 1680.0))
    t0 = time.time()
    attempts = 0
    while True:
        attempts += 1
        env = dict(os.environ, HYDROLIM_BENCH_CHILD="1")
        if attempts > 1:
            # a signal death (SIGSEGV/SIGILL) is the persistent-cache
            # serialization fault seen on the round-4 host — retry once
            # with the cache disabled before giving up
            env["HYDROLIM_NO_COMPILATION_CACHE"] = "1"
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            stdout=subprocess.PIPE, text=True, env=env)  # stderr: inherited
        timed_out = False
        try:
            out, _ = proc.communicate(timeout=deadline - (time.time() - t0))
        except subprocess.TimeoutExpired:
            timed_out = True
            proc.kill()
            out = proc.communicate()[0] or ""
        for line in reversed([l for l in out.splitlines() if l.strip()]):
            try:
                json.loads(line)
            except ValueError:
                continue
            print(line)
            return
        died_on_signal = (not timed_out and proc.returncode is not None
                          and proc.returncode < 0)
        if (died_on_signal and attempts == 1
                and time.time() - t0 < 0.5 * deadline):
            print(f"# bench child died on signal {-proc.returncode}; "
                  "retrying once with the compilation cache disabled",
                  file=sys.stderr)
            continue
        break
    if timed_out:
        _emit(_error_record(
            "bench timed out mid-run",
            detail=f"child still running at the {deadline:.0f} s deadline "
                   "(axon worker faulted mid-bench?) — killed by the "
                   "bench watchdog, not the driver"))
    else:
        _emit(_error_record(
            "bench child died without a record",
            detail=f"child exited rc={proc.returncode} with no parseable "
                   f"JSON line on stdout (attempts={attempts})"))


if __name__ == "__main__":
    if (os.environ.get("HYDROLIM_BENCH_CHILD", "") != "1"
            and os.environ.get("HYDROLIM_BENCH_NO_WATCHDOG", "") != "1"):
        _watchdog()
        sys.exit(0)
    if (os.environ.get("HYDROLIM_BENCH_TEST_SIGNAL", "")
            and os.environ.get("HYDROLIM_NO_COMPILATION_CACHE", "") != "1"):
        # test hook for the watchdog's signal-death retry: the first child
        # (cache on) kills itself; the retry (cache off) proceeds normally
        import signal as _signal

        os.kill(os.getpid(),
                int(os.environ["HYDROLIM_BENCH_TEST_SIGNAL"]))
    try:
        main()
    except Exception as exc:  # one parseable line, no matter what broke
        import traceback
        traceback.print_exc(file=sys.stderr)
        _emit(_error_record(f"{type(exc).__name__}: {exc}"))
        sys.exit(0)
