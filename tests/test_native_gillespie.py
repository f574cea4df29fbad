"""τ-leap stepper vs the exact native CTMC oracle (SURVEY.md §7.1
equivalence validation): the synchronous fixed-Δt engine must converge to
the same law as the event-driven Gillespie sampler.
"""
import shutil

import numpy as np
import jax
import pytest

from hydrolim_tpu.core.config import ParticleConfig, make_particle_params
from hydrolim_tpu.particles.init import init_particles
from hydrolim_tpu.particles.run import run_particles
from hydrolim_tpu.sweeps.ensemble import broadcast_params, run_particle_ensemble

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _mean_m_trajectory_tauleap(config, params, n_runs, T, obs_dt, dt, seed):
    params_b = broadcast_params(
        config, beta=[float(np.asarray(params.beta))] ,
        rate_diffusion=float(np.asarray(params.rate_diffusion)),
        rate_active=float(np.asarray(params.rate_active)), n_runs=n_runs)
    # rates already resolved: config built with scale_rates=False here
    res = run_particle_ensemble(config, params_b, jax.random.PRNGKey(seed),
                                T=T, obs_dt=obs_dt, dt=dt, record_pos=False)
    return np.asarray(res.frames.m_global)  # (n_runs, M)


def test_tauleap_matches_exact_ctmc_meanfield():
    """Global-m bidirectional mean-field: ⟨|m(t)|⟩ trajectories of the
    τ-leap engine agree with the exact CTMC within ensemble error."""
    from hydrolim_tpu.runtime.native import run_exact_gillespie

    L, N, T, obs_dt = 64, 256, 4.0, 0.5
    beta = 2.0
    config = ParticleConfig(L=L, N=N, n_pad=N, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    params = make_particle_params(config, beta=beta, rate_diffusion=0.5,
                                  rate_active=1.0, k_on=0, k_off=0, k_exit=0)

    n_runs = 24
    # exact oracle ensemble
    m_exact = []
    for r in range(n_runs):
        st = init_particles(config, jax.random.PRNGKey(100 + r))
        out = run_exact_gillespie(config, params,
                                  np.asarray(st.pos), np.asarray(st.sigma),
                                  T=T, obs_dt=obs_dt, seed=1234 + r)
        m_exact.append(out["m_global"])
        assert out["n_events"] > 0
    m_exact = np.abs(np.asarray(m_exact))

    # τ-leap ensemble at small dt
    m_tau = np.abs(_mean_m_trajectory_tauleap(
        config, params, n_runs, T, obs_dt, dt=2e-3, seed=7))

    # compare ensemble-mean |m|(t): both relax from ~0 to m_beta=0.9575
    me, mt = m_exact.mean(axis=0), m_tau.mean(axis=0)
    se = (m_exact.std(axis=0, ddof=1) + m_tau.std(axis=0, ddof=1)) \
        / np.sqrt(n_runs)
    assert np.all(np.abs(me - mt) < 4 * se + 0.05), (me, mt, se)
    # both end near the CW fixed point
    assert abs(me[-1] - 0.9575) < 0.08
    assert abs(mt[-1] - 0.9575) < 0.08


def test_exact_ctmc_exclusion_occupancy_invariant():
    """Exclusion: the oracle respects capacity K and conserves N without
    exits; its final density profile is statistically uniform (periodic)."""
    from hydrolim_tpu.runtime.native import run_exact_gillespie

    L, N, K = 32, 48, 2
    config = ParticleConfig(L=L, N=N, n_pad=N, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K)
    params = make_particle_params(config, beta=0.5, rate_diffusion=2.0,
                                  rate_active=1.0, k_on=0, k_off=0, k_exit=0)
    st = init_particles(config, jax.random.PRNGKey(0))
    out = run_exact_gillespie(config, params, np.asarray(st.pos),
                              np.asarray(st.sigma), T=2.0, obs_dt=0.25,
                              seed=5)
    occ = out["counts_p"] + out["counts_m"]
    assert occ.max() <= K
    np.testing.assert_array_equal(occ.sum(axis=1), N)


def test_exact_ctmc_local_kernel_runs():
    from hydrolim_tpu.runtime.native import run_exact_gillespie

    config = ParticleConfig(L=48, N=64, n_pad=64, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.05,
                            periodic=False, site_capacity=None)
    params = make_particle_params(config, beta=1.0, rate_diffusion=0.5,
                                  rate_active=1.0)
    st = init_particles(config, jax.random.PRNGKey(1))
    out = run_exact_gillespie(config, params, np.asarray(st.pos),
                              np.asarray(st.sigma), T=1.0, obs_dt=0.25,
                              seed=2)
    assert out["n_events"] > 0
    assert np.all(np.isfinite(out["m_global"]))


def test_tauleap_matches_exact_ctmc_exclusion():
    """With site exclusion active (K=1), the τ-leap conflict resolution must
    reproduce the exact CTMC's magnetization relaxation."""
    from hydrolim_tpu.runtime.native import run_exact_gillespie

    L, N, T, obs_dt, beta = 64, 40, 3.0, 0.5, 1.5
    config = ParticleConfig(L=L, N=N, n_pad=N, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=1,
                            active_model="plus_forward")
    params = make_particle_params(config, beta=beta, rate_diffusion=1.0,
                                  rate_active=2.0, k_on=0, k_off=0, k_exit=0)
    n_runs = 20

    m_exact = []
    for r in range(n_runs):
        st = init_particles(config, jax.random.PRNGKey(200 + r))
        out = run_exact_gillespie(config, params, np.asarray(st.pos),
                                  np.asarray(st.sigma), T=T, obs_dt=obs_dt,
                                  seed=77 + r)
        m_exact.append(out["m_global"])
    m_exact = np.abs(np.asarray(m_exact))

    params_b = broadcast_params(config, beta=[beta], rate_diffusion=1.0,
                                rate_active=2.0, n_runs=n_runs)
    res = jax.device_get(run_particle_ensemble(
        config, params_b, jax.random.PRNGKey(3), T=T, obs_dt=obs_dt,
        dt=2e-3, record_pos=False))
    m_tau = np.abs(np.asarray(res.frames.m_global))

    me, mt = m_exact.mean(axis=0), m_tau.mean(axis=0)
    se = (m_exact.std(axis=0, ddof=1) + m_tau.std(axis=0, ddof=1)) \
        / np.sqrt(n_runs)
    assert np.all(np.abs(me - mt) < 4 * se + 0.06), (me, mt, se)


def _exact_pi_and_empirical(L, K, active_model, rd, ra, beta, T, obs_dt,
                            pos0, sigma0, seed, crowding=False):
    """Exact stationary law of the 2-particle generator vs the oracle.

    Enumerates the ORDERED 2-particle state space ((x1,s1),(x2,s2)),
    builds the CTMC generator Q with exactly the oracle's channel rules
    (periodic ±1 diffusion at rate rd per free direction, σ-directed
    active hops at ra — plus_forward gates on σ=+1 — K-capacity blocking,
    CW flips exp(−βσm) with global m), solves πQ = 0, and projects both
    π and the oracle's frame-sampled empirical occupancy onto the
    observable (counts_p, counts_m) key."""
    import itertools

    excl = K is not None
    singles = [(x, s) for x in range(L) for s in (-1, 1)]
    states = [p for p in itertools.product(singles, singles)
              if not (excl and K < 2 and p[0][0] == p[1][0])]
    index = {st: i for i, st in enumerate(states)}
    n = len(states)
    Q = np.zeros((n, n))

    def occupied(st, x):
        return sum(1 for (xx, _) in st if xx == x)

    def hop_rate(base, st, t):
        """Capacity gate + optional crowding suppression ×(1−occ(t)/K)
        (stepper.py:129-136, gillespie.cpp crowding block)."""
        if not excl:
            return base
        occ = occupied(st, t)
        if occ >= K:
            return 0.0
        return base * (1.0 - occ / K) if crowding else base

    for st, i in index.items():
        for pi_ in (0, 1):
            (x, s) = st[pi_]
            other = st[1 - pi_]
            m = (st[0][1] + st[1][1]) / 2.0
            moves = []
            # diffusion ±1
            for d in (-1, +1):
                t = (x + d) % L
                r = hop_rate(rd, st, t)
                if r > 0:
                    moves.append(((t, s), r))
            # active hop
            fstep = s if active_model == "bidirectional" else (1 if s == 1 else None)
            if fstep is not None:
                t = (x + fstep) % L
                r = hop_rate(ra, st, t)
                if r > 0:
                    moves.append(((t, s), r))
            # CW flip
            moves.append(((x, -s), np.exp(-beta * s * m)))
            for new_single, rate in moves:
                new = (new_single, other) if pi_ == 0 else (other, new_single)
                j = index[new]
                Q[i, j] += rate
                Q[i, i] -= rate

    # stationary law: left null vector of Q (pi @ Q = 0), normalized
    w, v = np.linalg.eig(Q.T)
    k = int(np.argmin(np.abs(w)))
    pi_vec = np.real(v[:, k])
    pi_vec = np.abs(pi_vec) / np.abs(pi_vec).sum()

    def counts_key(st):
        cp = [0] * L
        cm = [0] * L
        for (x, s) in st:
            (cp if s == 1 else cm)[x] += 1
        return tuple(cp) + tuple(cm)

    pi_obs = {}
    for st, i in index.items():
        pi_obs[counts_key(st)] = pi_obs.get(counts_key(st), 0.0) + pi_vec[i]

    from hydrolim_tpu.core.config import ParticleConfig, make_particle_params
    from hydrolim_tpu.runtime.native import run_exact_gillespie

    config = ParticleConfig(L=L, N=2, n_pad=2, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K,
                            active_model=active_model,
                            crowding_suppresses_rates=crowding)
    params = make_particle_params(config, beta=beta, rate_diffusion=rd,
                                  rate_active=ra, k_on=0, k_off=0, k_exit=0)
    out = run_exact_gillespie(config, params, np.asarray(pos0, np.int64),
                              np.asarray(sigma0, np.int8), T=T,
                              obs_dt=obs_dt, seed=seed)
    cp, cm = out["counts_p"], out["counts_m"]
    burn = cp.shape[0] // 10
    emp = {}
    M = cp.shape[0] - burn
    for k_ in range(burn, cp.shape[0]):
        key = tuple(int(c) for c in cp[k_]) + tuple(int(c) for c in cm[k_])
        emp[key] = emp.get(key, 0.0) + 1.0 / M
    return pi_obs, emp


@pytest.mark.parametrize("case", ["exclusion_bidir", "open_plusforward",
                                  "crowding_k2"])
def test_oracle_matches_exact_stationary_distribution(case):
    """Closes the validation chain τ-leap ≈ oracle ≈ EXACT LAW: on a
    2-particle state space small enough to solve πQ = 0 directly, the
    oracle's frame-sampled state distribution must match the exact
    stationary law of the intended generator.  A wrong blocking rule,
    flip normalization or hop direction shifts π by O(10%) here; the
    sampling noise at 21.6k frames is ~0.3%."""
    crowding = False
    if case == "exclusion_bidir":
        L, K, am = 4, 1, "bidirectional"
        pos0, sigma0 = [0, 2], [1, -1]
    elif case == "crowding_k2":
        # K=2 so both particles can share a site; crowding then HALVES the
        # hop rate into the partner's site (frac = 1 − 1/2), depressing
        # together-states in π — a law shift pure blocking cannot produce.
        L, K, am, crowding = 4, 2, "bidirectional", True
        pos0, sigma0 = [0, 2], [1, -1]
    else:
        L, K, am = 3, None, "plus_forward"
        pos0, sigma0 = [0, 1], [1, -1]
    pi_obs, emp = _exact_pi_and_empirical(
        L, K, am, rd=0.3, ra=0.7, beta=1.2, T=48000.0, obs_dt=2.0,
        pos0=pos0, sigma0=sigma0, seed=42, crowding=crowding)
    keys = sorted(pi_obs)
    p = np.array([pi_obs[k] for k in keys])
    q = np.array([emp.get(k, 0.0) for k in keys])
    assert abs(q.sum() - 1.0) < 1e-9      # no unexpected states observed
    tv = 0.5 * np.abs(p - q).sum()
    assert tv < 0.02, (case, tv)
    assert np.max(np.abs(p - q)) < 0.01, (case, np.max(np.abs(p - q)))


@pytest.mark.parametrize("engine", ["tau_leap", "lattice_gas",
                                    "lattice_gas_k"])
def test_every_engine_matches_exact_stationary_distribution(engine):
    """Every production engine against the exact stationary law (the same
    πQ = 0 solve as the oracle test): TV distance at dt=0.01 must sit at
    the sampling-noise floor (~0.02 at 8k correlated frames; measured
    0.016-0.018 for all three engines, dt-insensitive over dt ∈
    {0.005, 0.02} — the O(dt) stationary bias is unresolvable here).
    A complement to the trajectory-law agreement tests above."""
    import jax

    from hydrolim_tpu.particles.lattice_gas import run_lattice_gas
    from hydrolim_tpu.particles.lattice_gas_k import run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import (
        broadcast_params,
        run_particle_ensemble,
    )

    L, K, am, rd, ra, beta = 4, 1, "bidirectional", 0.3, 0.7, 1.2
    pi_obs, _ = _exact_pi_and_empirical(L, K, am, rd, ra, beta, 4.0, 2.0,
                                        [0, 2], [1, -1], 1)
    config = ParticleConfig(L=L, N=2, n_pad=8, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K, active_model=am)
    B = 64
    params = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                              rate_active=ra, n_runs=B)
    kw = dict(T=320.0, obs_dt=2.0, dt=0.01)
    if engine == "tau_leap":
        f = jax.device_get(run_particle_ensemble(
            config, params, jax.random.PRNGKey(0), record_pos=False,
            **kw)).frames
    elif engine == "lattice_gas":
        f, _ = jax.device_get(run_lattice_gas(
            config, params, jax.random.PRNGKey(1), record_fft=False, **kw))
    else:
        f, _ = jax.device_get(run_lattice_gas_k(
            config, params, jax.random.PRNGKey(1), record_fft=False, **kw))
    # rho = counts / (n_alive * dx) with n_alive=2, dx=1/L -> counts = 2ρ/L
    cp = np.rint(np.asarray(f.rho_p) * 2 / L).astype(int)
    cm = np.rint(np.asarray(f.rho_m) * 2 / L).astype(int)
    M = cp.shape[1]
    burn = M // 5
    emp, n = {}, 0
    for b in range(B):
        for k in range(burn, M):
            key = tuple(cp[b, k]) + tuple(cm[b, k])
            emp[key] = emp.get(key, 0) + 1
            n += 1
    keys = sorted(pi_obs)
    p = np.array([pi_obs[k] for k in keys])
    q = np.array([emp.get(k, 0) / n for k in keys])
    unseen = 1.0 - q.sum()           # mass on states outside the exact space
    tv = 0.5 * np.abs(p - q).sum() + 0.5 * unseen
    assert unseen < 1e-12, (engine, unseen)  # no invalid states recorded
    assert tv < 0.035, (engine, tv)


@pytest.mark.parametrize("engine", ["tau_leap", "lattice_gas_k"])
def test_crowding_engines_match_exact_stationary_distribution(engine):
    """crowding_suppresses_rates=True exact-law pin for the two engines
    that implement it (τ-leap stepper.py:129-136, lattice_gas_k): K=2,
    hop rates ×(1−occ(target)/K).  The exact crowding law differs from
    the plain-K2 law by TV ≈ 0.1 (asserted), so an ignored flag or a
    wrong occupancy in the suppression factor fails loudly."""
    import jax

    from hydrolim_tpu.particles.lattice_gas_k import run_lattice_gas_k
    from hydrolim_tpu.sweeps.ensemble import (
        broadcast_params,
        run_particle_ensemble,
    )

    L, K, am, rd, ra, beta = 4, 2, "bidirectional", 0.3, 0.7, 1.2
    pi_obs, _ = _exact_pi_and_empirical(L, K, am, rd, ra, beta, 4.0, 2.0,
                                        [0, 2], [1, -1], 1, crowding=True)
    pi_plain, _ = _exact_pi_and_empirical(L, K, am, rd, ra, beta, 4.0, 2.0,
                                          [0, 2], [1, -1], 1, crowding=False)
    keys = sorted(set(pi_obs) | set(pi_plain))
    gap = 0.5 * sum(abs(pi_obs.get(k, 0.0) - pi_plain.get(k, 0.0))
                    for k in keys)
    assert gap > 0.05, gap               # the pin has discriminating power

    config = ParticleConfig(L=L, N=2, n_pad=8, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K, active_model=am,
                            crowding_suppresses_rates=True)
    B = 64
    params = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                              rate_active=ra, n_runs=B)
    kw = dict(T=320.0, obs_dt=2.0, dt=0.01)
    if engine == "tau_leap":
        f = jax.device_get(run_particle_ensemble(
            config, params, jax.random.PRNGKey(0), record_pos=False,
            **kw)).frames
    else:
        f, _ = jax.device_get(run_lattice_gas_k(
            config, params, jax.random.PRNGKey(1), record_fft=False, **kw))
    cp = np.rint(np.asarray(f.rho_p) * 2 / L).astype(int)
    cm = np.rint(np.asarray(f.rho_m) * 2 / L).astype(int)
    M = cp.shape[1]
    emp, n = {}, 0
    for b in range(B):
        for k in range(M // 5, M):
            key = tuple(cp[b, k]) + tuple(cm[b, k])
            emp[key] = emp.get(key, 0) + 1
            n += 1
    keys = sorted(pi_obs)
    p = np.array([pi_obs[k] for k in keys])
    q = np.array([emp.get(k, 0) / n for k in keys])
    unseen = 1.0 - q.sum()
    tv = 0.5 * np.abs(p - q).sum() + 0.5 * unseen
    assert unseen < 1e-12, (engine, unseen)
    assert tv < 0.035, (engine, tv)


def _exact_pi_anchored(L, K, rd, ra, beta, k_on, k_off, anchor):
    """πQ = 0 for the ANCHORED 2-particle generator (bidirectional active,
    suppress_flip_when_bound, immobilize_when_anchored, k_exit = 0).
    Single-particle states are (x, s, b); binding requires σ = −1, an
    anchor site and the reference's SELF-INCLUDING capacity gate
    occ[x] < K (stepper.py:141-153 quirk).  Returns the stationary law
    projected onto the (counts_p, counts_m) observable."""
    import itertools

    singles = [(x, s, 0) for x in range(L) for s in (-1, 1)]
    singles += [(x, -1, 1) for x in range(L) if anchor[x]]
    states = []
    for p in itertools.product(singles, singles):
        occ = [0] * L
        for (x, _, _) in p:
            occ[x] += 1
        if max(occ) <= K:
            states.append(p)
    index = {st: i for i, st in enumerate(states)}
    Q = np.zeros((len(states), len(states)))

    for st, i in index.items():
        occ = [0] * L
        for (x, _, _) in st:
            occ[x] += 1
        m = (st[0][1] + st[1][1]) / 2.0
        for pi_ in (0, 1):
            (x, s, b) = st[pi_]
            other = st[1 - pi_]
            moves = []
            if b:
                moves.append(((x, s, 0), k_off))        # unbind only
            else:
                moves.append(((x, -s, 0), np.exp(-beta * s * m)))   # flip
                for d in (-1, +1):                      # diffusion
                    t = (x + d) % L
                    if occ[t] < K:
                        moves.append(((t, s, 0), rd))
                t = (x + s) % L                         # active (bidir)
                if occ[t] < K:
                    moves.append(((t, s, 0), ra))
                if s == -1 and anchor[x] and occ[x] < K:   # self-including!
                    moves.append(((x, s, 1), k_on))
            for new_single, rate in moves:
                new = (new_single, other) if pi_ == 0 else (other, new_single)
                j = index[new]
                Q[i, j] += rate
                Q[i, i] -= rate

    w, v = np.linalg.eig(Q.T)
    k = int(np.argmin(np.abs(w)))
    pi_vec = np.real(v[:, k])
    pi_vec = np.abs(pi_vec) / np.abs(pi_vec).sum()
    pi_obs = {}
    for st, i in index.items():
        cp = [0] * L
        cm = [0] * L
        for (x, s, _) in st:
            (cp if s == 1 else cm)[x] += 1
        key = tuple(cp) + tuple(cm)
        pi_obs[key] = pi_obs.get(key, 0.0) + pi_vec[i]
    return pi_obs


def test_anchored_channels_match_exact_stationary_distribution():
    """Exact-law pin of the bind/unbind channels (oracle + τ-leap engine):
    K = 2, two anchor sites, k_exit = 0 so the chain is ergodic.  The
    self-including bind gate occ[x] < K is part of the exact model — a
    self-EXCLUDING gate (occ−1 < K) shifts the shared-anchor-site weights
    by O(10%), so this discriminates the reference quirk exactly."""
    import jax

    from hydrolim_tpu.runtime.native import run_exact_gillespie
    from hydrolim_tpu.sweeps.ensemble import (
        broadcast_params,
        run_particle_ensemble,
    )

    L, K, rd, ra, beta = 4, 2, 0.3, 0.5, 0.9
    k_on, k_off = 1.5, 0.7
    config = ParticleConfig(L=L, N=2, n_pad=8, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K,
                            active_model="bidirectional",
                            anchor_positions=(0.0,), anchor_radius=0.005)
    anchor = config.anchor_mask()
    assert anchor.sum() == 2                 # sites {0, 1} (radius ceil)
    pi_obs = _exact_pi_anchored(L, K, rd, ra, beta, k_on, k_off, anchor)

    params = make_particle_params(config, beta=beta, rate_diffusion=rd,
                                  rate_active=ra, k_on=k_on, k_off=k_off,
                                  k_exit=0.0)
    out = run_exact_gillespie(config, params, np.array([0, 2]),
                              np.array([1, -1], np.int8), T=44000.0,
                              obs_dt=2.0, seed=11)
    cp, cm = out["counts_p"], out["counts_m"]
    burn = cp.shape[0] // 10
    emp, n = {}, 0
    for k_ in range(burn, cp.shape[0]):
        key = tuple(int(c) for c in cp[k_]) + tuple(int(c) for c in cm[k_])
        emp[key] = emp.get(key, 0) + 1
        n += 1
    keys = sorted(pi_obs)
    p = np.array([pi_obs[k] for k in keys])
    q = np.array([emp.get(k, 0) / n for k in keys])
    assert abs(q.sum() - 1.0) < 1e-9
    tv = 0.5 * np.abs(p - q).sum()
    assert tv < 0.02, ("oracle", tv)

    params_b = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                                rate_active=ra, k_on=k_on, k_off=k_off,
                                k_exit=0.0, n_runs=48)
    f = jax.device_get(run_particle_ensemble(
        config, params_b, jax.random.PRNGKey(0), T=320.0, obs_dt=2.0,
        dt=0.01, record_pos=False)).frames
    cp = np.rint(np.asarray(f.rho_p) * 2 / L).astype(int)
    cm = np.rint(np.asarray(f.rho_m) * 2 / L).astype(int)
    M = cp.shape[1]
    emp, n = {}, 0
    for b in range(48):
        for k_ in range(M // 5, M):
            key = tuple(cp[b, k_]) + tuple(cm[b, k_])
            emp[key] = emp.get(key, 0) + 1
            n += 1
    q = np.array([emp.get(k, 0) / n for k in keys])
    unseen = 1.0 - q.sum()
    tv = 0.5 * np.abs(p - q).sum() + 0.5 * unseen
    assert unseen < 1e-12, unseen
    assert tv < 0.04, ("tau_leap", tv)

def _exact_absorption_law(L, K, rd, ra, beta, k_on, k_off, k_exit, anchor,
                          obs_dt, n_frames):
    """Exact absorption law of the SINGLE-particle anchored chain with
    k_exit > 0: transient generator over (x, σ, b) states (exit fires only
    from bound states, stepper.py:122-127), uniform (x, σ, b=0) initial law
    matching ``init='fixed'`` at N=1.  Returns (survival S(t_k) at the
    frame grid, per-site exit-location law, E[τ])."""
    from scipy.linalg import expm

    states = [(x, s, 0) for x in range(L) for s in (-1, 1)]
    states += [(x, -1, 1) for x in range(L) if anchor[x]]
    idx = {st: i for i, st in enumerate(states)}
    n = len(states)
    Q = np.zeros((n, n))
    R = np.zeros((n, L))
    for st, i in idx.items():
        x, s, b = st
        if b:
            Q[i, idx[(x, s, 0)]] += k_off
            Q[i, i] -= k_off
            R[i, x] += k_exit                    # absorb at the anchor site
            Q[i, i] -= k_exit
        else:
            m = s                                # N=1 ⇒ m_global = own spin
            Q[i, idx[(x, -s, 0)]] += np.exp(-beta * s * m)
            Q[i, i] -= np.exp(-beta * s * m)
            for d in (-1, 1):
                t = (x + d) % L
                Q[i, idx[(t, s, 0)]] += rd
                Q[i, i] -= rd
            t = (x + s) % L                      # bidirectional active hop
            Q[i, idx[(t, s, 0)]] += ra
            Q[i, i] -= ra
            if s == -1 and anchor[x]:            # self-including occ<K gate
                Q[i, idx[(x, s, 1)]] += k_on
                Q[i, i] -= k_on
    pi0 = np.zeros(n)
    for x in range(L):
        for s in (-1, 1):
            pi0[idx[(x, s, 0)]] = 1.0 / (2 * L)
    step = expm(Q.T * obs_dt)
    v = pi0.copy()
    S = np.empty(n_frames)
    for k in range(n_frames):
        S[k] = v.sum()
        v = step @ v
    fund = np.linalg.inv(-Q)
    site_law = pi0 @ fund @ R                    # unconditional exit sites
    e_tau = float((pi0 @ fund).sum())
    return S, site_law, e_tau


def test_exit_channel_matches_exact_absorption_law():
    """Exact pin of the EXIT channel (the one channel the stationary-law
    tests cannot reach — it kills ergodicity): survival curve, mean exit
    time and the exit-SITE law from the transient generator, vs the C++
    oracle (survival via per-frame n_alive) and the τ-leap engine (exact
    exit_times/exit_pos log).  The 0.471/0.529 site asymmetry (active
    drift toward the downstream anchor) discriminates directional bugs."""
    import jax

    from hydrolim_tpu.runtime.native import run_exact_gillespie
    from hydrolim_tpu.sweeps.ensemble import (
        broadcast_params,
        run_particle_ensemble,
    )

    L, K, rd, ra, beta = 4, 2, 0.4, 0.6, 1.0
    k_on, k_off, k_exit = 2.0, 1.0, 0.8
    T, obs_dt = 60.0, 1.0
    config = ParticleConfig(L=L, N=1, n_pad=8, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=K,
                            active_model="bidirectional",
                            anchor_positions=(0.0,), anchor_radius=0.005)
    anchor = config.anchor_mask()
    M = int(T / obs_dt)
    S, site_law, e_tau = _exact_absorption_law(
        L, K, rd, ra, beta, k_on, k_off, k_exit, anchor, obs_dt, M)
    assert S[-1] < 2e-3          # censoring at T is negligible vs tolerances
    assert abs(site_law.sum() - 1.0) < 1e-9

    # --- oracle: empirical survival from per-frame n_alive --------------
    params = make_particle_params(config, beta=beta, rate_diffusion=rd,
                                  rate_active=ra, k_on=k_on, k_off=k_off,
                                  k_exit=k_exit)
    n_runs = 1500
    rng = np.random.default_rng(7)
    alive_acc = np.zeros(M)
    for r in range(n_runs):
        pos0 = rng.integers(0, L, size=1)
        sig0 = np.where(rng.random(1) < 0.5, 1, -1).astype(np.int8)
        out = run_exact_gillespie(config, params, pos0, sig0, T=T,
                                  obs_dt=obs_dt, seed=1000 + r)
        alive_acc += out["n_alive"][:M]
    S_oracle = alive_acc / n_runs
    # ~100 correlated points from the same runs; max binomial SE ≈ 0.0129
    assert np.max(np.abs(S_oracle - S)) < 0.05, np.max(np.abs(S_oracle - S))
    # E[min(τ, T)] ≈ obs_dt · Σ_k 1[alive at t_k] has expectation
    # obs_dt · Σ_k S(t_k) exactly — compare at frame resolution
    assert abs(obs_dt * S_oracle.sum() - obs_dt * S.sum()) < 0.8

    # --- τ-leap: exact exit log ------------------------------------------
    B = 4096
    params_b = broadcast_params(config, beta=[beta], rate_diffusion=rd,
                                rate_active=ra, k_on=k_on, k_off=k_off,
                                k_exit=k_exit, n_runs=B)
    res = jax.device_get(run_particle_ensemble(
        config, params_b, jax.random.PRNGKey(3), T=T, obs_dt=obs_dt,
        dt=0.01, record_pos=False))
    n_exit = np.asarray(res.final_state.exit_count)
    assert np.all(n_exit <= 1)                    # single particle
    exited = n_exit == 1
    assert exited.mean() > 1.0 - 5e-3             # S(60) ≈ 5e-4 + binomial
    t_exit = np.asarray(res.final_state.exit_times)[exited, 0]
    x_exit = np.asarray(res.final_state.exit_pos)[exited, 0]
    # survival curve from the exit-time log (non-exited runs censor at T)
    tgrid = np.arange(M) * obs_dt
    S_tau = 1.0 - (np.searchsorted(np.sort(t_exit), tgrid, side="right")
                   / B)
    # max SE ≈ 0.0078; τ-leap holding-time bias O(r·dt) ≈ 2% of slope
    assert np.max(np.abs(S_tau - S)) < 0.035, np.max(np.abs(S_tau - S))
    assert abs(t_exit.mean() - e_tau) < 0.6, (t_exit.mean(), e_tau)
    # exit-site law (anchor sites only, drift-asymmetric)
    for a in range(L):
        frac = (x_exit == a).mean()
        assert abs(frac - site_law[a]) < 0.03, (a, frac, site_law[a])
