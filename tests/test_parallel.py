"""Mesh-sharding correctness (SURVEY.md §4: 1-device vs n-device results).

Runs on the 8 virtual CPU devices from conftest's
``--xla_force_host_platform_device_count=8``.
"""
import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hydrolim_tpu.core.config import ParticleConfig
from hydrolim_tpu.parallel.mesh import make_mesh, shard_params, sweep_sharding
from hydrolim_tpu.sweeps.ensemble import broadcast_params, ensemble_dt, run_particle_ensemble


def _cpu_count():
    try:
        return len(jax.devices("cpu"))
    except RuntimeError:
        return 0


pytestmark = pytest.mark.skipif(_cpu_count() < 8,
                                reason="needs 8 virtual CPU devices")


def _ensemble(config, params, key, **kw):
    return jax.device_get(run_particle_ensemble(config, params, key, **kw))


def test_sharded_ensemble_matches_unsharded():
    config = ParticleConfig(L=64, N=128, n_pad=128, init="fixed",
                            scale_rates=False, local_kernel_sigma=0.0,
                            periodic=True, site_capacity=None,
                            active_model="bidirectional")
    betas = np.linspace(0.0, 3.0, 8)
    params = broadcast_params(config, beta=betas, rate_diffusion=0.5,
                              rate_active=2.0)
    dt = ensemble_dt(config, beta_max=3.0, rate_diffusion=0.5,
                     rate_active=2.0)
    key = jax.random.PRNGKey(0)
    kw = dict(T=1.0, obs_dt=0.25, dt=dt, record_pos=False)

    base = _ensemble(config, params, key, **kw)

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    params_sh = shard_params(mesh, params)
    sharded = _ensemble(config, params_sh, key, **kw)

    np.testing.assert_array_equal(np.asarray(base.frames.m_global),
                                  np.asarray(sharded.frames.m_global))
    np.testing.assert_array_equal(np.asarray(base.frames.total),
                                  np.asarray(sharded.frames.total))


def test_mesh_factorization_and_fallback():
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    assert mesh.devices.size == 8
    assert mesh.devices.shape in ((4, 2), (2, 4))
    mesh2 = make_mesh(6, devices=jax.devices("cpu"))
    assert mesh2.devices.shape in ((3, 2), (2, 3))


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_dryrun_multichip_driver_env():
    """Round-1 regression (MULTICHIP_r01.json rc=1): the dryrun must pass in
    a fresh interpreter with NO XLA_FLAGS / JAX_PLATFORMS set — it has to
    provision its own virtual CPU devices and never execute on the default
    (possibly broken-TPU) backend."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys; sys.path.insert(0, %r); "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
            "print('DRYRUN_OK')" % repo)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DRYRUN_OK" in out.stdout
