"""Pencil-sketch loss: 100 - PSNR between sketch transforms.

Parity: reference losses/pencil_sketch.py:9-35 — grayscale -> invert ->
gaussian blur (kernel = W//10 rounded odd, sigma 1, reflect border) ->
invert -> divide, NaNs zeroed, clamped to [0,1]; loss = 100 - psnr(sketches).
The reference computes PSNR with piq.psnr (RGB mean over batch); sketches
are single channel so plain PSNR applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srtpu.metrics.psnr_ssim import psnr
from srtpu.utils.imgops import gaussian_blur2d, invert, rgb_to_grayscale


def pencil_sketch(x: jax.Array, kernel_size: int = -1, sigma: float = 1.0,
                  border_type: str = 'reflect') -> jax.Array:
    if kernel_size == -1:
        kernel_size = x.shape[-2] // 10
        if kernel_size % 2 == 0:
            kernel_size += 1
        kernel_size = max(kernel_size, 3)

    gray = rgb_to_grayscale(x)
    blurred = invert(gaussian_blur2d(invert(gray),
                                     (kernel_size, kernel_size),
                                     (sigma, sigma), border_type))
    sketch = gray / blurred
    sketch = jnp.nan_to_num(sketch, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.clip(sketch, 0.0, 1.0)


def pencil_sketch_loss(sr: jax.Array, hr: jax.Array) -> jax.Array:
    # NB: the reference computes the sketch transform under torch.no_grad
    # (pencil_sketch.py:18), so — like EdgeLoss — this term carries no
    # gradient and acts as a monitored regularizer; we keep that semantic.
    sr = jax.lax.stop_gradient(sr)
    hr = jax.lax.stop_gradient(hr)
    return 100.0 - psnr(pencil_sketch(sr), pencil_sketch(hr))
