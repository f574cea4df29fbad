"""Figure-inventory smoke tests: every viz entry point renders PNGs from a
small run (the drives cover visual correctness; this pins the API)."""
import numpy as np
import pytest

from hydrolim_tpu import ParticleSystem


@pytest.fixture(scope="module")
def small_out():
    ps = ParticleSystem(L=64, xlim=1.0, rate_diffusion=0.5, rate_active=2.0,
                        beta=1.5, init="fixed", N=30, scale_rates=False,
                        local_kernel_sigma=0.02, periodic=False,
                        site_capacity=3, anchor_positions=[0.4, 0.8],
                        anchor_radius=0.05, k_on=5.0, k_off=1.0, k_exit=2.0,
                        rng=1)
    out = ps.run(T=1.5, obs_dt=0.25, record_fft=True, record_var=True)
    return ps, out


def test_visualize_all_and_individuals(small_out, tmp_path, monkeypatch):
    ps, out = small_out
    ps.visualize_all(out, save_path=str(tmp_path / "overview.png"))
    assert (tmp_path / "overview.png").exists()
    v = ps.plot_individuals(out, outdir=str(tmp_path))
    assert np.isfinite(v)
    produced = {p.name for p in tmp_path.glob("*.png")}
    expected = {"plot_t_m.png", "plot_t_A_K.png", "plot_t_Var.png",
                "2D_plot_t_x_mlocal.png", "2D_plot_t_x_total.png",
                "cluster_size_histogram.png", "flux_profile.png",
                "FPT_survival_curve.png", "FPT_flux_based.png",
                "Effective_drift_velocity.png",
                "cumulative_exits_by_anchor.png"}
    assert expected <= produced, expected - produced


def test_animation_writer(small_out, tmp_path):
    ps, out = small_out
    path = ps.animate_profiles(out, stride=2, outdir=str(tmp_path))
    # pillow gif fallback in this image
    assert path is None or path.endswith((".mp4", ".gif"))
    if path:
        import os
        assert os.path.getsize(path) > 0


def test_plot_cluster_distribution(small_out, tmp_path):
    from hydrolim_tpu.viz.structure_plots import plot_cluster_distribution
    ps, out = small_out
    plot_cluster_distribution(out, threshold=1.0, label="smoke",
                              outdir=str(tmp_path))
    assert (tmp_path / "cluster_distribution.png").stat().st_size > 0


def test_realtime_viewer_headless_loop(small_out):
    from hydrolim_tpu.viz.realtime import RealtimeProfileViewer
    ps, out = small_out
    v = RealtimeProfileViewer(out, backend="headless", smoothing_sigma=1.0)
    n = v.n_frames
    assert n == len(out["times_obs"]) and v.L == ps.L
    # one full pass + one extra step: index wraps, loop counter ticks
    shown = [v.step() for _ in range(n + 1)]
    assert shown == list(range(n)) + [0]
    assert v.loops_completed == 1 and v.index == 1
    # the drawn line reflects the smoothed current frame
    lp = v._lines[0]
    np.testing.assert_allclose(lp.get_ydata(), v.rho_p[0])


def test_realtime_viewer_smoothing_and_guards(small_out):
    from hydrolim_tpu.viz.realtime import RealtimeProfileViewer
    ps, out = small_out
    # sigma=0 is the identity (reference special-case), m_local never smoothed
    v0 = RealtimeProfileViewer(out, backend="headless", smoothing_sigma=0)
    np.testing.assert_array_equal(v0.rho_p, np.asarray(out["rho_p_list"]))
    v1 = RealtimeProfileViewer(out, backend="headless", smoothing_sigma=2.0)
    assert not np.allclose(v1.rho_p, v0.rho_p)
    np.testing.assert_array_equal(v1.m_local, np.asarray(out["m_local_list"]))
    # interactive backends refuse politely without a display
    import os
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
        with pytest.raises(RuntimeError, match="display"):
            RealtimeProfileViewer(out, backend="mpl")
    # batched series must be indexed down to one replica first
    bad = dict(out, rho_p_list=np.asarray(out["rho_p_list"])[None])
    with pytest.raises(ValueError, match="replica"):
        RealtimeProfileViewer(bad, backend="headless")


def test_realtime_viewer_movie_capture(small_out, tmp_path):
    ps, out = small_out
    path = ps.show_realtime(out, backend="headless", fps=10,
                            save_path=str(tmp_path / "rt.gif"))
    import os
    assert path is not None and path.endswith(".gif")
    assert os.path.getsize(path) > 0
