"""Config-space fuzz: seeded random draws over the 24-kwarg surface, short
runs, engine invariants asserted on every draw.

The unit suites pin each feature at hand-picked configs; this lane sweeps
the CROSS-PRODUCT corners (exclusion × anchors × BCs × kernels × rate
scaling × init × active model) that nobody wrote a bespoke test for.  The
draws are deterministic (fixed rng seed), so a failure is reproducible by
its index.

Invariants (each must hold for ANY valid config):
- particle number: constant without exits, non-increasing with exits, and
  exits are accounted one-for-one in the exit log;
- exclusion: per-site occupancy from the recorded positions never exceeds
  the site capacity K in any frame;
- densities: non-negative, total = rho_p + rho_m exactly;
- magnetization: |m_global| <= 1;
- schema: the reference `out` keys exist with consistent frame shapes.
"""
import numpy as np
import pytest

from hydrolim_tpu import ParticleSystem

N_DRAWS = 12


def _draw_config(rng: np.random.Generator):
    """One random-but-valid ParticleSystem kwargs dict + run kwargs."""
    L = int(rng.choice([32, 48, 64]))
    periodic = bool(rng.random() < 0.5)
    site_capacity = rng.choice([None, 1, 2, 3])
    site_capacity = None if site_capacity is None else int(site_capacity)
    cap = (site_capacity or 4) * L
    N = int(rng.integers(12, min(cap, 96) + 1))
    init = str(rng.choice(["fixed", "poisson"]))
    anchors = bool(rng.random() < 0.35) and site_capacity not in (None, 1)
    # K=1 anchored binding is structurally impossible (reference quirk:
    # the bind gate counts the particle itself) — skip that corner.
    kw = dict(
        L=L, xlim=1.0,
        rate_diffusion=float(rng.uniform(0.005, 0.05)),
        rate_active=float(rng.uniform(0.5, 6.0)),
        beta=float(rng.uniform(0.0, 2.5)),
        init=init, N=N,
        scale_rates=bool(rng.random() < 0.3),
        local_kernel_sigma=float(rng.choice([0.0, 0.01, 0.05])),
        periodic=periodic,
        site_capacity=site_capacity,
        crowding_suppresses_rates=bool(rng.random() < 0.3),
        active_model=str(rng.choice(["plus_forward", "bidirectional"])),
        k_on=0.0, k_off=0.0, k_exit=0.0, anchor_positions=None,
        rng=int(rng.integers(0, 2 ** 31)),
    )
    if anchors:
        n_anchor = int(rng.integers(1, 4))
        kw.update(
            anchor_positions=list(np.sort(rng.uniform(0.1, 0.9, n_anchor))),
            anchor_radius=float(rng.uniform(0.01, 0.05)),
            k_on=float(rng.uniform(0.5, 4.0)),
            k_off=float(rng.uniform(0.0, 1.0)),
            k_exit=float(rng.choice([0.0, 2.0])),
            immobilize_when_anchored=bool(rng.random() < 0.7),
            suppress_flip_when_bound=bool(rng.random() < 0.7),
        )
    if init == "poisson":
        lam_p = N * 0.6 / L
        lam_m = N * 0.4 / L
        kw.update(rho0_plus=lambda x: lam_p, rho0_minus=lambda x: lam_m)
    return kw


def _check_invariants(out, kw, T):
    M = len(out["times_obs"])
    L = kw["L"]
    counts = np.asarray(out["particle_count_list"])
    assert counts.shape == (M,)
    # --- schema / shapes ---
    for key in ("rho_p_list", "rho_m_list", "total_list", "m_local_list"):
        assert np.asarray(out[key]).shape == (M, L), key
    assert np.asarray(out["m_global"]).shape == (M,)
    # --- densities ---
    rho_p = np.asarray(out["rho_p_list"])
    rho_m = np.asarray(out["rho_m_list"])
    assert (rho_p >= 0).all() and (rho_m >= 0).all()
    # total is computed on-device in a fused order — equal to 1 ulp
    np.testing.assert_allclose(rho_p + rho_m,
                               np.asarray(out["total_list"]), rtol=1e-6)
    # --- magnetization ---
    assert np.all(np.abs(np.asarray(out["m_global"])) <= 1.0 + 1e-6)
    # --- particle accounting ---
    if kw["k_exit"] == 0.0:
        assert (counts == counts[0]).all(), "conservation without exits"
        assert len(out["exit_times"]) == 0
    else:
        assert (np.diff(counts) <= 0).all(), "exit counts must not grow"
        # the exit log accounts for every lost particle (log entries are
        # appended at exit time; the final frame may precede late exits,
        # so the log is >= the frame-observed loss)
        assert len(out["exit_times"]) >= counts[0] - counts[-1]
        ets = np.asarray(out["exit_times"], float)
        assert ((ets >= 0) & (ets <= T + 1e-6)).all()
    # --- exclusion ---
    if kw["site_capacity"] is not None:
        for pos in out["pos_list"]:
            occ = np.bincount(np.asarray(pos), minlength=L)
            assert occ.max(initial=0) <= kw["site_capacity"], (
                "site capacity violated", occ.max())


N_PDE_DRAWS = 8


def _draw_pde_config(rng: np.random.Generator):
    gaussian = bool(rng.random() < 0.6)
    kernel_sigma = float(rng.choice([0.005, 0.02, 2e5])) if gaussian else 0.02
    return dict(
        L=int(rng.choice([64, 96, 128])),
        T=0.02, dt=1e-3,
        gamma=float(rng.choice([0.0, 0.05, 0.2])),
        lam=float(rng.uniform(0.2, 1.0)),
        beta=float(rng.uniform(0.0, 2.5)),
        bc=str(rng.choice(["periodic", "neumann"])),
        active_model=str(rng.choice(["bidirectional", "anchored_minus"])),
        gaussian_kernel=gaussian,
        kernel_sigma=kernel_sigma,
        diffusion_solver=str(rng.choice(["auto", "auto", "dense", "banded"])),
        n_tracers=int(rng.choice([0, 16])),
        snapshot_interval=5,
        seed=int(rng.integers(0, 2 ** 31)),
    ), str(rng.choice(["homogeneous", "poisson"])), float(rng.uniform(0, 0.3))


@pytest.mark.parametrize("idx", range(N_PDE_DRAWS))
def test_fuzzed_pde_config_invariants(idx):
    """PDE-side fuzz: random valid IMEXPDE configs, one short solve each;
    mass renormalization, boundedness and schema invariants asserted."""
    from hydrolim_tpu import IMEXPDE

    rng = np.random.default_rng(24680 + idx)
    kw, init_mode, noise = _draw_pde_config(rng)
    if kw["diffusion_solver"] == "banded" and (
            kw["bc"] != "periodic" or kw["gamma"] == 0.0):
        kw["diffusion_solver"] = "auto"   # banded is the periodic γ>0 path
    n_tracers = kw.pop("n_tracers")       # initialize()'s kwarg, not ctor's
    pde = IMEXPDE(**kw)
    pde.initialize(init_mode, noise=noise, n_tracers=n_tracers)
    mass0 = float(np.sum(pde.rho_p + pde.rho_m))
    pde.solve()
    out = pde.get_output()

    mass1 = float(np.sum(out["rho_p"] + out["rho_m"]))
    # periodic: the spectral/banded solves preserve the k=0 mode and the
    # per-step renormalization pins everything else — roundoff only.
    # neumann: NOT mass-conserving by reference semantics — the ghost-point
    # Neumann Laplacian (IMEX_PDE_solver_class.py:76-78) has nonzero column
    # sums, so the implicit solve drifts ~5e-5/step and the renormalization
    # deliberately rescales to the POST-diffusion mass (stepper :229-233).
    tol = 1e-5 if kw["bc"] == "periodic" else 2e-4 * (kw["T"] / kw["dt"])
    assert abs(mass1 - mass0) / mass0 < tol, ("mass drift", mass0, mass1)
    for key in ("rho_p", "rho_m", "m_series", "var_series", "fft_amp"):
        assert np.isfinite(np.asarray(out[key])).all(), key
    # v/D series are NaN until the tracer window fills (T here is shorter
    # than the default 0.05 window) — just require no spurious inf/garbage
    for key in ("v_eff_series", "D_eff_series"):
        arr = np.asarray(out[key])
        assert not np.isinf(arr).any(), key
    assert np.all(np.abs(out["m_series"]) <= 1.0 + 1e-3)
    assert np.all(np.asarray(out["var_series"]) >= 0.0)
    n_snap = len(out["times"])
    assert out["snapshots"].shape == (n_snap, kw["L"])
    assert out["m_snapshots"].shape == (n_snap, kw["L"])


@pytest.mark.parametrize("idx", range(N_DRAWS))
def test_fuzzed_config_invariants(idx):
    rng = np.random.default_rng(987654321 + idx)
    kw = _draw_config(rng)
    T, obs_dt = 0.06, 0.02
    ps = ParticleSystem(**kw)
    out = ps.run(T=T, obs_dt=obs_dt, record_fft=False, record_var=True)
    _check_invariants(out, kw, T)

    # eligible configs must satisfy the same invariants on the slot engine
    if (kw["site_capacity"] is not None and kw["anchor_positions"] is None
            and kw["init"] == "fixed"):
        out_lg = ps.run(T=T, obs_dt=obs_dt, record_fft=False,
                        record_var=True, engine="lattice_gas")
        _check_invariants(out_lg, kw, T)


@pytest.mark.parametrize("idx", [2, 7])
def test_fuzz_checkpointed_run_matches_straight(idx, tmp_path):
    """Chunked checkpoint/resume must be bit-identical to the unsplit scan
    for arbitrary config-space draws, not just the hand-picked checkpoint
    suite configs (utils/checkpoint.py)."""
    import jax
    from test_checkpoint_run import _assert_results_equal

    from hydrolim_tpu.particles.run import run_particles
    from hydrolim_tpu.utils.checkpoint import run_particles_checkpointed

    rng = np.random.default_rng(2_000 + idx)
    kw = _draw_config(rng)
    ps = ParticleSystem(**kw)
    T, obs_dt = 0.5, 0.1
    state0 = ps.init_particles()
    straight = jax.device_get(run_particles(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        record_pos=True, record_fft=True))
    chunked = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=tmp_path / f"ck{idx}", chunk_frames=2, record_pos=True,
        record_fft=True)
    _assert_results_equal(chunked, straight)
