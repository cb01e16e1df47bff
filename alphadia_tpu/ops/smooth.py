"""Gaussian smoothing of XIC profiles.

(reference: alphadia/search/selection/kernel.py — GaussianKernel with
sigma_scaled = (fwhm/2.3548) * sigma_scale / resolution, density formula
using sigma as covariance; alphadia/search/selection/fft.py — FFT
convolution with center alignment at kernel_size // 2)

On TPU a direct depthwise convolution beats FFT for kernel_size ~30; we use
`lax.conv_general_dilated` with asymmetric padding reproducing the
reference's center alignment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    """1D analogue of the reference kernel (sigma acts as covariance):
    w(x) = (2 pi)^(-1/2) sigma^(-1/2) exp(-x^2 / (2 sigma)), x in
    [-size//2, size//2).
    """
    x = np.arange(-size // 2, size // 2, dtype=np.float64)
    b = (2 * np.pi) ** (-0.5) * max(sigma, 1e-12) ** (-0.5)
    return (b * np.exp(-(x**2) / (2.0 * max(sigma, 1e-12)))).astype(np.float32)


def rt_kernel_sigma(fwhm_rt: float, sigma_scale_rt: float, cycle_time: float) -> float:
    """(reference: kernel.py `determine_rt_sigma`)"""
    return (fwhm_rt / 2.3548) * sigma_scale_rt / max(cycle_time, 1e-9)


@partial(jax.jit, static_argnames=("kernel_size",))
def convolve_profiles(profiles: jax.Array, kernel: jax.Array, *, kernel_size: int):
    """Convolve [..., W] profiles with a 1D kernel, center-aligned at
    kernel_size // 2 (reference fft.convolve_fourier alignment).

    Implemented as a banded-Toeplitz matmul: a single-channel conv lowers
    to a degenerate TPU convolution, while [N, W] @ [W, W] rides the MXU.
    out[i] = sum_t kernel[t] * x[i + t - kernel_size // 2]
    """
    shape = profiles.shape
    W = shape[-1]
    x = profiles.reshape(-1, W)
    center = kernel_size // 2
    # band[j, i] = kernel[j - i + center]  (correlation, zero outside band)
    i = jnp.arange(W)[None, :]
    j = jnp.arange(W)[:, None]
    t = j - i + center
    band = jnp.where(
        (t >= 0) & (t < kernel_size),
        kernel[jnp.clip(t, 0, kernel_size - 1)],
        0.0,
    )  # [W(j: source), W(i: output)]... indices: rows j source, cols i out
    out = jnp.dot(x, band, preferred_element_type=jnp.float32)
    return out.reshape(shape)
