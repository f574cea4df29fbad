"""Mid-run checkpoint/resume (utils/checkpoint.py): a chunked run must be
bit-identical to the unsplit scan, survive a simulated preemption, and
refuse to stitch incompatible physics."""
import numpy as np
import jax
import pytest

from hydrolim_tpu import ParticleSystem
from hydrolim_tpu.particles.run import run_particles
from hydrolim_tpu.utils.checkpoint import run_particles_checkpointed


def _sys(**over):
    kw = dict(L=64, xlim=1.0, rate_diffusion=0.5, rate_active=2.0, beta=1.2,
              init="fixed", N=48, scale_rates=False, local_kernel_sigma=0.0,
              periodic=True, site_capacity=1, k_on=0, k_off=0, k_exit=0,
              rng=11)
    kw.update(over)
    return ParticleSystem(**kw)


def _straight_and_state0(ps, T, obs_dt):
    state0 = ps.init_particles()
    straight = jax.device_get(run_particles(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        record_pos=True, record_fft=True))
    return straight, state0


def _assert_results_equal(a, b):
    for field in a.frames._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.frames, field)),
            np.asarray(getattr(b.frames, field)), err_msg=field)
    for field in a.final_state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a.final_state, field)),
            np.asarray(getattr(b.final_state, field)),
            err_msg=f"final_state.{field}")


def test_chunked_bit_identical_to_straight(tmp_path):
    ps = _sys()
    T, obs_dt = 1.2, 0.1  # 12 frames, 3 chunks of 5/5/2
    straight, state0 = _straight_and_state0(ps, T, obs_dt)
    chunked = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=tmp_path / "ck", chunk_frames=5, record_pos=True,
        record_fft=True)
    _assert_results_equal(chunked, straight)


def test_resume_after_simulated_preemption(tmp_path):
    ps = _sys()
    T, obs_dt = 1.2, 0.1
    straight, state0 = _straight_and_state0(ps, T, obs_dt)
    ck = tmp_path / "ck"
    # preempted after 1 of 3 chunks
    partial = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=ck, chunk_frames=5, record_pos=True, record_fft=True,
        stop_after_chunks=1)
    assert partial is None
    assert (ck / "chunk_00000.npz").exists()
    assert not (ck / "chunk_00001.npz").exists()
    # resume runs only the missing chunks and stitches the full result
    resumed = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=ck, chunk_frames=5, record_pos=True, record_fft=True)
    _assert_results_equal(resumed, straight)


def test_resume_ignores_state0_and_reloads_carry(tmp_path):
    """Once every chunk exists, a resume call must not re-run anything —
    even a different state0 yields the stored trajectory (the carry on
    disk is authoritative)."""
    ps = _sys()
    T, obs_dt = 0.6, 0.1
    straight, state0 = _straight_and_state0(ps, T, obs_dt)
    ck = tmp_path / "ck"
    first = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=ck, chunk_frames=2, record_pos=True, record_fft=True)
    other_state = ps.init_particles()  # different key split
    second = run_particles_checkpointed(
        ps.config, ps.params, other_state, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=ck, chunk_frames=2, record_pos=True, record_fft=True,
        stop_after_chunks=0)  # would return None if any chunk had to run
    assert second is not None
    _assert_results_equal(second, first)


def test_mismatched_run_raises(tmp_path):
    ps = _sys()
    state0 = ps.init_particles()
    ck = tmp_path / "ck"
    run_particles_checkpointed(
        ps.config, ps.params, state0, T=0.3, obs_dt=0.1, dt=ps.dt,
        ckpt_dir=ck, chunk_frames=2, record_pos=True, record_fft=True)
    ps2 = _sys(beta=2.5)
    with pytest.raises(ValueError, match="different run"):
        run_particles_checkpointed(
            ps2.config, ps2.params, state0, T=0.3, obs_dt=0.1, dt=ps2.dt,
            ckpt_dir=ck, chunk_frames=2, record_pos=True, record_fft=True)
    # resume=False overwrites instead
    res = run_particles_checkpointed(
        ps2.config, ps2.params, state0, T=0.3, obs_dt=0.1, dt=ps2.dt,
        ckpt_dir=ck, chunk_frames=2, record_pos=True, record_fft=True,
        resume=False)
    assert res is not None


def test_single_chunk_and_facade_out_schema(tmp_path):
    """chunk_frames >= n_frames degenerates to one checkpointed chunk, and
    the facade method returns the reference out-dict schema matching
    ps.run."""
    ps = _sys(rng=21)
    out_ck = ps.run_checkpointed(T=0.5, obs_dt=0.1, ckpt_dir=tmp_path / "ck",
                                 chunk_frames=100, record_fft=True,
                                 record_var=True)
    ps2 = _sys(rng=21)
    out = ps2.run(T=0.5, obs_dt=0.1, record_fft=True, record_var=True)
    np.testing.assert_array_equal(out_ck["total_list"], out["total_list"])
    np.testing.assert_array_equal(out_ck["m_global"], out["m_global"])
    np.testing.assert_array_equal(out_ck["pos_frames"], out["pos_frames"])
    assert out_ck["particle_count_list"] == out["particle_count_list"]
    np.testing.assert_array_equal(out_ck["var_list"], out["var_list"])


def test_checkpoint_with_anchors_and_exits(tmp_path):
    """The exit log and bind state live in the carry; a chunked anchored
    run must reproduce the unsplit exit records exactly."""
    ps = _sys(anchor_positions=[0.25, 0.75], k_on=5.0, k_off=0.5,
              k_exit=2.0, N=32, rng=5)
    T, obs_dt = 1.0, 0.1
    straight, state0 = _straight_and_state0(ps, T, obs_dt)
    chunked = run_particles_checkpointed(
        ps.config, ps.params, state0, T=T, obs_dt=obs_dt, dt=ps.dt,
        ckpt_dir=tmp_path / "ck", chunk_frames=3, record_pos=True,
        record_fft=True)
    _assert_results_equal(chunked, straight)
