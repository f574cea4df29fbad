"""sweeps.fast_exclusion — the user-facing fused-exclusion sweep runner.

CPU-testable surface: config gating, tracer-id selection, periodic unwrap,
and the XLA fallback's frames/tracer contract (the Pallas engine itself is
covered by tests/test_pallas_tpu.py on the TPU lane)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.sweeps.ensemble import broadcast_params
from hydrolim_tpu.sweeps.fast_exclusion import (
    _init_tags,
    is_pallas_exclusion_path,
    run_exclusion_sweep,
    unwrap_tracer_sites,
)


def _cfg(**kw):
    base = dict(L=64, N=48, init="fixed", scale_rates=False,
                local_kernel_sigma=0.01, periodic=True, site_capacity=2,
                active_model="plus_forward")
    base.update(kw)
    return ParticleConfig(**base)


def test_path_gating():
    assert is_pallas_exclusion_path(_cfg())
    assert is_pallas_exclusion_path(_cfg(site_capacity=8))
    assert not is_pallas_exclusion_path(_cfg(site_capacity=9))
    assert not is_pallas_exclusion_path(_cfg(site_capacity=None))
    assert not is_pallas_exclusion_path(_cfg(anchor_positions=(0.5,)))
    assert not is_pallas_exclusion_path(_cfg(crowding_suppresses_rates=True))
    assert not is_pallas_exclusion_path(
        _cfg(flip_rate_fn=lambda s, m, b: jnp.ones_like(m)))


def test_init_tags_picks_occupied_ids():
    K, L = 2, 32
    spins = np.zeros((3, K, L), np.int32)
    spins[:, 0, :10] = 1
    spins[:, 1, 5:8] = -1
    ids = (np.arange(K * L, dtype=np.int32) + 1).reshape(K, L)
    slots = spins * ids[None]
    tags, valid = _init_tags(slots, jax.random.PRNGKey(0), 8)
    tags, valid = np.asarray(tags), np.asarray(valid)
    assert valid.all()          # 13 occupied >= 8 requested
    occupied_ids = set(np.abs(slots[0])[spins[0] != 0])
    for b in range(3):
        assert len(set(tags[b])) == 8          # distinct
        assert set(tags[b]) <= occupied_ids


def test_init_tags_marks_surplus_invalid():
    spins = np.zeros((1, 1, 16), np.int32)
    spins[0, 0, 3] = 1
    spins[0, 0, 7] = -1
    ids = np.arange(1, 17, dtype=np.int32).reshape(1, 16)
    tags, valid = _init_tags(spins * ids[None], jax.random.PRNGKey(1), 5)
    assert int(np.asarray(valid).sum()) == 2


def test_unwrap_minimal_image():
    L = 100
    # one tracer walking right across the periodic seam
    raw = np.array([[[97]], [[99]], [[1]], [[3]]])      # (M, B=1, n_t=1)
    un = unwrap_tracer_sites(raw, L, periodic=True)
    np.testing.assert_array_equal(un[:, 0, 0], [97, 99, 101, 103])
    # leftward across the seam
    raw = np.array([[[2]], [[0]], [[98]]])
    un = unwrap_tracer_sites(raw, L, periodic=True)
    np.testing.assert_array_equal(un[:, 0, 0], [2, 0, -2])
    # invalid tags map to the out-of-range sentinel (NOT -1: a valid
    # net-leftward walker legitimately reaches negative unwrapped positions,
    # see the [2, 0, -2] case above)
    from hydrolim_tpu.particles.lattice_gas import TRACER_INVALID

    raw = np.array([[[5, -1]], [[6, -1]]])
    un = unwrap_tracer_sites(raw, L, periodic=True)
    np.testing.assert_array_equal(un[:, 0, 1], [TRACER_INVALID] * 2)
    # non-periodic: identity
    raw = np.array([[[5]], [[90]]])
    np.testing.assert_array_equal(
        unwrap_tracer_sites(raw, L, periodic=False)[:, 0, 0], [5, 90])


def test_xla_fallback_contract():
    config = _cfg()
    params = broadcast_params(config, beta=[0.5, 2.0], rate_diffusion=0.5,
                              rate_active=2.0, n_runs=2)
    frames, spins = run_exclusion_sweep(
        config, params, jax.random.PRNGKey(0), T=2.0, obs_dt=0.5, dt=0.01,
        engine="xla", n_tracers=16)
    B, M, L = 4, 4, config.L
    assert frames.rho_p.shape == (B, M, L)
    assert frames.m_global.shape == (B, M)
    assert frames.tracer_pos.shape == (B, M, 16)
    assert spins.shape == (B, config.K, L)
    # mass conserved (no exits in this class)
    assert np.abs(spins).sum() == B * config.N
    # occupancy never exceeds K
    assert np.abs(spins).sum(axis=1).max() <= config.K


def test_sweep_over_betas_engine_pallas_falls_back_on_cpu():
    from hydrolim_tpu.sweeps.beta_sweep import sweep_over_betas

    res = sweep_over_betas(
        np.array([0.0, 2.0]), 2, engine="pallas",
        ps_kwargs=dict(L=64, N=40, site_capacity=3, periodic=False),
        run_kwargs=dict(T=2.0, obs_dt=0.5),
        npz_path="/tmp/test_fx_sweep.npz", do_fit=False, plot_result=False)
    assert res["means"].shape == (2,)
    assert np.isfinite(res["means"]).all()
    assert np.isfinite(res["m_means"]).all()


def test_run_exclusion_sweep_engine_rb_falls_back_on_cpu():
    """engine='pallas_rb' (the replica-banked kernel) must degrade to the
    XLA slot engine when the default device is CPU, exactly like 'pallas'
    — same return contract, finite observables, engine recorded."""
    import jax

    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.ensemble import broadcast_params
    from hydrolim_tpu.sweeps.fast_exclusion import (
        last_run_info,
        run_exclusion_sweep,
    )

    config = ParticleConfig(L=64, N=40, init="fixed", scale_rates=False,
                            local_kernel_sigma=0.01, periodic=False,
                            site_capacity=3, active_model="plus_forward")
    params = broadcast_params(config, beta=[1.0], rate_diffusion=0.5,
                              rate_active=3.0, n_runs=2)
    frames, spins = run_exclusion_sweep(
        config, params, jax.random.PRNGKey(0), T=1.0, obs_dt=0.25,
        dt=2e-3, engine="pallas_rb", n_tracers=8)
    assert last_run_info["engine"] == "xla"
    assert np.isfinite(np.asarray(frames.m_global)).all()
    assert np.abs(spins).sum() == 2 * config.N


def test_pick_r_batch_rb_prefers_divisors():
    from hydrolim_tpu.sweeps.fast_exclusion import _pick_r_batch_rb

    assert _pick_r_batch_rb(16) == 16
    assert _pick_r_batch_rb(64) == 32
    assert _pick_r_batch_rb(24) == 8
    assert _pick_r_batch_rb(10) == 16   # pads 10 -> 16
    assert _pick_r_batch_rb(4) == 8     # pads 4 -> 8 (fills one tile)


def test_pick_r_batch_rb_vmem_gate():
    """K=8 large-L configs must shrink R to stay inside the VMEM budget;
    the K=3 flagship keeps R=16 at B=16."""
    from hydrolim_tpu.core.config import ParticleConfig
    from hydrolim_tpu.sweeps.fast_exclusion import _pick_r_batch_rb

    flag = ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                          local_kernel_sigma=0.002, periodic=False,
                          site_capacity=3, active_model="plus_forward")
    assert _pick_r_batch_rb(16, flag) == 16
    big = ParticleConfig(L=1000, N=750, init="fixed", scale_rates=False,
                         local_kernel_sigma=0.002, periodic=False,
                         site_capacity=8, active_model="plus_forward")
    assert _pick_r_batch_rb(32, big) <= 8


# ---------------------------------------------------------------------------
# shard_map'd fused path at n>1 (VERDICT r4 #5): the one multi-device
# configuration that previously had no correctness pin.  The kernel runs
# under interpret=True with injected noise whose program axis shards with
# the replicas; per-replica trajectories must match the mesh-of-1 run.
# ---------------------------------------------------------------------------

def _mesh_noise_setup(n_betas=4, M=6, n_sub=2):
    config = _cfg(L=32, N=20, local_kernel_sigma=0.0)
    params = broadcast_params(
        config, beta=np.linspace(0.6, 2.2, n_betas),
        rate_diffusion=0.5, rate_active=2.0)
    Kp = -(-config.K // 4) * 4
    Lp = -(-config.L // 128) * 128
    rng = np.random.default_rng(13)
    noise = rng.integers(0, 2 ** 32,
                         (M - 1, n_betas, n_sub, 2, 1, Kp, Lp),
                         dtype=np.uint32)
    kw = dict(T=0.6, obs_dt=0.1, dt=0.05, engine="pallas", r_batch=1,
              n_tracers=4, _interpret=True, _noise=noise)
    return config, params, kw


def _assert_frames_equal(frames, ref_frames, slots, ref_slots):
    for field in ref_frames._fields:
        a = np.asarray(getattr(frames, field))
        b = np.asarray(getattr(ref_frames, field))
        if field in ("fft_amp", "m_local"):
            # matmul-derived records reassociate at different shard-local
            # batch shapes (~1 ulp; documented run_exclusion_sweep caveat)
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-5,
                                       err_msg=field)
        else:
            np.testing.assert_array_equal(a, b, err_msg=field)
    np.testing.assert_array_equal(np.asarray(slots), np.asarray(ref_slots))


def test_fused_shardmap_n4_interpret_matches_mesh1():
    """run_exclusion_sweep(mesh=4-device CPU mesh) under interpret+noise
    is bit-identical (up to the documented matmul-record ulp caveat) to
    the unsharded run: global prog_ids and the sharded noise program axis
    give every replica the same draws either way."""
    from hydrolim_tpu.parallel.mesh import sweep_mesh

    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    config, params, kw = _mesh_noise_setup()
    key = jax.random.PRNGKey(21)
    ref_frames, ref_slots = run_exclusion_sweep(config, params, key, **kw)
    frames, slots = run_exclusion_sweep(
        config, params, key, mesh=sweep_mesh(4), **kw)
    _assert_frames_equal(frames, ref_frames, slots, ref_slots)


def test_fused_shardmap_ckpt_mesh_resumes_bit_identical(tmp_path):
    """ckpt_dir= × mesh= on the fused route (VERDICT r4 #2+#5 composed):
    a preempted sharded chunked run resumes on the mesh (the restored
    host carry is re-placed by the shard_map in_specs) and stitches to
    the unsharded straight run's trajectory."""
    from hydrolim_tpu.parallel.mesh import sweep_mesh

    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    config, params, kw = _mesh_noise_setup()
    key = jax.random.PRNGKey(22)
    ref_frames, ref_slots = run_exclusion_sweep(config, params, key, **kw)
    ck = tmp_path / "ck"
    mesh = sweep_mesh(4)
    partial = run_exclusion_sweep(config, params, key, mesh=mesh,
                                  ckpt_dir=ck, chunk_frames=2,
                                  stop_after_chunks=1, **kw)
    assert partial is None and (ck / "chunk_00000.npz").exists()
    frames, slots = run_exclusion_sweep(config, params, key, mesh=mesh,
                                        ckpt_dir=ck, chunk_frames=2, **kw)
    _assert_frames_equal(frames, ref_frames, slots, ref_slots)
