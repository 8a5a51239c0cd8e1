"""PSNR / SSIM / MS-SSIM in pure JAX (NHWC, data range [0, 1]).

Capability parity with the reference's metric suite entries piq.psnr,
piq.ssim, piq.multi_scale_ssim (reference models/srmodel.py:47-54). All three
run fully on device inside the jitted eval step — no host round-trip — and
accept an optional validity mask so padded (bucketed) eval images score
identically to their unpadded originals (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _masked_mean(x: jax.Array, mask: jax.Array | None, axis) -> jax.Array:
    if mask is None:
        return jnp.mean(x, axis=axis)
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(
        jnp.sum(mask, axis=axis), 1.0)


def psnr(sr: jax.Array, hr: jax.Array, data_range: float = 1.0,
         mask: jax.Array | None = None) -> jax.Array:
    """Batch-mean PSNR (dB). ``mask`` is NHW1 validity for padded eval."""
    sr = sr.astype(jnp.float32)
    hr = hr.astype(jnp.float32)
    mse = _masked_mean(jnp.square(sr - hr), mask, axis=(1, 2, 3))
    mse = jnp.maximum(mse, 1e-12)
    return jnp.mean(10.0 * jnp.log10(data_range ** 2 / mse))


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter1d(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """1D valid correlation along ``axis`` as k shifted multiply-adds.

    Grouped depthwise convs lower to scalar-ish code on TPU (measured
    25.4 ms for one full-image SSIM at 2048x1408 — ~25x over its
    bandwidth bound); k slice-scale-adds are pure VPU elementwise that
    XLA fuses into one pass over the array."""
    k = kernel.shape[0]
    n = x.shape[axis] - k + 1
    terms = [float(kernel[i])
             * jax.lax.slice_in_dim(x, i, i + n, axis=axis)
             for i in range(k)]
    # pairwise (tree) accumulation: the sigma terms of SSIM cancel
    # filter(x*x) against filter(x)^2 — a sequential f32 sum loses the
    # ~1e-4 constant-image identity the golden tests pin
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1]
                 for i in range(0, len(terms) - 1, 2)] \
            + ([terms[-1]] if len(terms) % 2 else [])
    return terms[0]


def _filter2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise valid gaussian blur of NHWC, SEPARABLE: two 1D passes
    (11+11 MACs/px) instead of one 2D conv (121 MACs/px) — the gaussian
    window factors exactly, and on full eval images (2048x1408) the five
    blurs per SSIM dominated the whole eval step (PERF.md r5)."""
    return _filter1d(_filter1d(x, kernel, 1), kernel, 2)


def _ssim_per_channel(sr, hr, kernel, k1=0.01, k2=0.03, data_range=1.0):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2(sr, kernel)
    mu_y = _filter2(hr, kernel)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _filter2(sr * sr, kernel) - mu_xx
    sigma_y = _filter2(hr * hr, kernel) - mu_yy
    sigma_xy = _filter2(sr * hr, kernel) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


def _window_valid(mask: jax.Array, kernel_size: int) -> jax.Array:
    """A window is valid iff every covered pixel is valid (min-pool).
    Separable (min over rows then cols — exact for min) as two 1D
    reduce_windows: 11+11 compares/px instead of 121."""
    k = kernel_size
    m = jax.lax.reduce_window(mask, jnp.inf, jax.lax.min,
                              (1, k, 1, 1), (1, 1, 1, 1), 'VALID')
    return jax.lax.reduce_window(m, jnp.inf, jax.lax.min,
                                 (1, 1, k, 1), (1, 1, 1, 1), 'VALID')


def ssim(sr: jax.Array, hr: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, kernel_sigma: float = 1.5,
         mask: jax.Array | None = None) -> jax.Array:
    """Batch-mean SSIM (gaussian window, valid padding — piq semantics)."""
    sr = sr.astype(jnp.float32)
    hr = hr.astype(jnp.float32)
    # kept as a numpy constant: _filter1d bakes the taps as python
    # scalars into the fused slice-add graph
    kernel = _gaussian_kernel(kernel_size, kernel_sigma)
    ssim_map, _ = _ssim_per_channel(sr, hr, kernel, data_range=data_range)
    if mask is not None:
        m = _window_valid(mask, kernel_size)
        return jnp.mean(_masked_mean(ssim_map, m, axis=(1, 2, 3)))
    return jnp.mean(ssim_map)


def ms_ssim(sr: jax.Array, hr: jax.Array, data_range: float = 1.0,
            kernel_size: int = 11, kernel_sigma: float = 1.5,
            weights=MS_SSIM_WEIGHTS,
            mask: jax.Array | None = None) -> jax.Array:
    """Multi-scale SSIM (Wang et al.), 5 scales, 2x avg-pool between scales.

    Requires min(H, W) > (kernel_size-1) * 2**(len(weights)-1); the eval
    bucketing in srtpu.data guarantees this for full validation images.
    ``mask`` restricts scoring to unpadded pixels at every scale.
    """
    sr = sr.astype(jnp.float32)
    hr = hr.astype(jnp.float32)
    # kept as a numpy constant: _filter1d bakes the taps as python
    # scalars into the fused slice-add graph
    kernel = _gaussian_kernel(kernel_size, kernel_sigma)
    weights = jnp.asarray(weights, jnp.float32)

    def pool(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID') / 4.0

    vals = []
    m = mask
    for i in range(len(weights)):
        ssim_map, cs = _ssim_per_channel(sr, hr, kernel,
                                         data_range=data_range)
        mc = None
        if m is not None:
            mc = _window_valid(m, kernel_size)
        if i == len(weights) - 1:
            vals.append(jnp.mean(_masked_mean(ssim_map, mc, axis=(1, 2, 3))))
        else:
            vals.append(jnp.mean(_masked_mean(cs, mc, axis=(1, 2, 3))))
            sr, hr = pool(sr), pool(hr)
            if m is not None:
                m = (pool(m) >= 0.999).astype(jnp.float32)

    vals = jnp.stack(vals)
    vals = jnp.maximum(vals, 1e-6)  # relu'd like piq to keep pow stable
    return jnp.prod(vals ** weights)
