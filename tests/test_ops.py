"""Unit tests for the kernel-layer ops (SURVEY.md §4: per-kernel unit tests).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from scipy.ndimage import gaussian_filter1d
from scipy.sparse import diags
from scipy.sparse.linalg import spsolve

from hydrolim_tpu.ops.convolve import (
    periodic_conv,
    periodic_gaussian_kernel,
    reflect_gaussian_filter,
)
from hydrolim_tpu.ops.diffusion import build_diffusion_op, diffusion_solve
from hydrolim_tpu.ops.segment import masked_bincount, occupancy


def _ref_diffusion_matrix(L, dx, dt, gamma, bc):
    D = diags([1.0, -2.0, 1.0], [-1, 0, 1], shape=(L, L)).tolil()
    if bc == "periodic":
        D[0, -1] = D[-1, 0] = 1.0
    else:
        D[0, 1] = 2.0
        D[-1, -2] = 2.0
    return (diags(np.ones(L), 0) - gamma * dt * D / dx ** 2).tocsr()


@pytest.mark.parametrize("sigma_grid", [1.5, 5.0, 40.0])
def test_reflect_gaussian_matches_scipy(sigma_grid):
    rng = np.random.default_rng(0)
    x = rng.normal(size=200).astype(np.float32)
    ours = np.asarray(reflect_gaussian_filter(jnp.asarray(x), sigma_grid))
    ref = gaussian_filter1d(x.astype(np.float64), sigma_grid, mode="reflect")
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_reflect_gaussian_pad_exceeds_length():
    rng = np.random.default_rng(1)
    x = rng.normal(size=50).astype(np.float32)
    sigma = 30.0  # radius 120 > len 50
    ours = np.asarray(reflect_gaussian_filter(jnp.asarray(x), sigma))
    ref = gaussian_filter1d(x.astype(np.float64), sigma, mode="reflect")
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-5)


def test_periodic_conv_matches_direct():
    rng = np.random.default_rng(2)
    L = 128
    x = rng.normal(size=L)
    k = periodic_gaussian_kernel(L, 1.0 / L, 0.02)
    ours = np.asarray(periodic_conv(jnp.asarray(x, jnp.float32),
                                    jnp.asarray(np.fft.rfft(k))))
    ref = np.real(np.fft.ifft(np.fft.fft(x) * np.fft.fft(k)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bc,kind", [("periodic", "fft"), ("neumann", "dct"),
                                     ("periodic", "dense"), ("neumann", "dense")])
def test_diffusion_solve_matches_spsolve(bc, kind):
    L, dx, dt, gamma = 64, 1.0 / 64, 5e-4, 0.2
    rng = np.random.default_rng(3)
    rho = rng.random(L)
    op = build_diffusion_op(L, dx, dt, gamma, bc, kind)
    ours = np.asarray(diffusion_solve(op, jnp.asarray(rho, jnp.float32), kind))
    A = _ref_diffusion_matrix(L, dx, dt, gamma, bc)
    ref = spsolve(A, rho)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_masked_bincount_and_occupancy():
    pos = jnp.asarray([0, 1, 1, 3, 3, 3], jnp.int32)
    sigma = jnp.asarray([1, -1, 1, 1, 1, -1], jnp.int32)
    alive = jnp.asarray([True, True, True, True, False, True])
    occ, cp, cm = occupancy(pos, sigma, alive, 5)
    np.testing.assert_array_equal(np.asarray(occ), [1, 2, 0, 2, 0])
    np.testing.assert_array_equal(np.asarray(cp), [1, 1, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(cm), [0, 1, 0, 1, 0])
    # batched path
    posb = jnp.stack([pos, pos[::-1]])
    w = jnp.ones_like(posb, jnp.float32)
    out = np.asarray(masked_bincount(posb, w, 5))
    assert out.shape == (2, 5)
    np.testing.assert_array_equal(out[0], [1, 2, 0, 3, 0])


def test_reflect_gaussian_wide_kernel_ring_matmul():
    """Wide kernels (radius > L/4) take the 2L-ring matmul path — must stay
    exactly equivalent to scipy's reflect filtering."""
    rng = np.random.default_rng(7)
    for L, sg in ((100, 40.0), (64, 300.0)):
        x = rng.normal(size=L).astype(np.float32)
        ours = np.asarray(reflect_gaussian_filter(jnp.asarray(x), sg))
        ref = gaussian_filter1d(x.astype(np.float64), sg, mode="reflect")
        np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-5)


def test_smooth_op_narrow_conv_large_L():
    """Above the narrow-conv threshold the smoothing operator switches from
    the L×L circulant matmul to a banded wrap convolution; results match the
    exact numpy circular convolution, and a huge-L build stays O(L·W)."""
    import jax.numpy as jnp

    from hydrolim_tpu.fields.magnetization import apply_smooth, build_smooth_op
    from hydrolim_tpu.ops.convolve import periodic_gaussian_kernel

    L, dx, sigma = 8192, 1.0 / 8192, 0.002
    k = periodic_gaussian_kernel(L, dx, sigma)
    op = build_smooth_op(k)
    assert op.conv_kernel.shape[0] > 0          # narrow-conv mode engaged
    rng = np.random.default_rng(7)
    x = rng.random(L)
    got = np.asarray(apply_smooth(op, jnp.asarray(x, jnp.float32)))
    want = np.real(np.fft.ifft(np.fft.fft(x) * np.fft.fft(k)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    # wide kernels (e.g. the 1e5-10 near-global sentinel) keep the exact path
    k_wide = periodic_gaussian_kernel(L, dx, 10.0)
    op_wide = build_smooth_op(k_wide)
    assert op_wide.conv_kernel.shape[0] == 0


def test_masked_bincount_batched_drops_out_of_range():
    """Batched branch must DROP out-of-range indices like the unbatched
    mode='drop' path: the flattened index pos + b*L would otherwise land in
    the NEXT batch row's bin 0 (regression, round-3 review)."""
    L = 4
    pos = jnp.asarray([[0, L, -1], [1, 1, L + 7]], jnp.int32)  # L, -1 invalid
    w = jnp.ones_like(pos, jnp.float32)
    out = np.asarray(masked_bincount(pos, w, L))
    np.testing.assert_array_equal(out[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(out[1], [0, 2, 0, 0])
    # unbatched agrees
    one = np.asarray(masked_bincount(pos[0], w[0], L))
    np.testing.assert_array_equal(one, out[0])
