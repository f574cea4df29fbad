"""Smoothing convolutions for the magnetization field.

TPU-native replacements for the reference's two smoothing paths
(PARTICLE_solver_CLASS.py:223-238):

- periodic: FFT convolution with a cached torus Gaussian kernel,
- non-periodic: ``scipy.ndimage.gaussian_filter1d(mode='reflect')``
  re-implemented as a reflect-padded direct convolution (half-sample
  symmetric extension, identical weights: radius = int(4·σ + 0.5)).

All functions operate on the trailing axis and broadcast over leading batch
dims so that vmapped replica/β sweeps go through a single compiled program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def periodic_gaussian_kernel(L: int, dx: float, sigma: float) -> np.ndarray:
    """Normalized Gaussian on the torus, centered at site 0
    (PARTICLE_solver_CLASS.py:108-122, IMEX_PDE_solver_class.py:84-93)."""
    j = np.arange(L)
    dist = np.minimum(j, L - j) * dx
    kernel = np.exp(-0.5 * (dist / sigma) ** 2)
    return (kernel / kernel.sum()).astype(np.float32)


def periodic_conv(x: jnp.ndarray, kernel_rfft: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution via rFFT; ``kernel_rfft = rfft(kernel)``."""
    L = x.shape[-1]
    return jnp.fft.irfft(jnp.fft.rfft(x) * kernel_rfft, n=L)


def gaussian_filter_weights(sigma_grid: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d weights (normalized, radius=4σ)."""
    radius = int(truncate * sigma_grid + 0.5)
    xs = np.arange(-radius, radius + 1)
    w = np.exp(-0.5 * (xs / sigma_grid) ** 2)
    return (w / w.sum()).astype(np.float32)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Half-sample symmetric padding (scipy mode='reflect') of the trailing
    axis, supporting pad widths larger than the axis length."""
    L = x.shape[-1]
    while pad > 0:
        p = min(pad, L)
        left = jnp.flip(x[..., :p], axis=-1)
        right = jnp.flip(x[..., -p:], axis=-1)
        x = jnp.concatenate([left, x, right], axis=-1)
        pad -= p
        L = x.shape[-1]
    return x


@functools.partial(jax.jit, static_argnames=("sigma_grid", "truncate"))
def reflect_gaussian_filter(x: jnp.ndarray, sigma_grid: float,
                            truncate: float = 4.0) -> jnp.ndarray:
    """Drop-in for ``gaussian_filter1d(x, sigma_grid, mode='reflect')`` on the
    trailing axis (batched over leading dims)."""
    w = jnp.asarray(gaussian_filter_weights(sigma_grid, truncate))
    radius = (w.shape[0] - 1) // 2
    xp = reflect_pad(x.astype(jnp.float32), radius)
    batch_shape = xp.shape[:-1]
    flat = xp.reshape((-1, 1, xp.shape[-1]))
    out = jax.lax.conv_general_dilated(
        flat,
        w.reshape((1, 1, -1)),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(batch_shape + (out.shape[-1],))
