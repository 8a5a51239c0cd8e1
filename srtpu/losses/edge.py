"""Edge loss — L1 between edge maps of prediction and target.

Parity: reference losses/edge_loss.py:11-39 (canny | laplacian | sobel
operators on grayscale; laplacian kernel size = W//10 rounded up to odd;
computed without gradient flow, matching the reference's torch.no_grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srtpu.utils.imgops import canny, laplacian, rgb_to_grayscale, sobel


def extract_edges(x: jax.Array, operator: str = 'canny') -> jax.Array:
    gray = rgb_to_grayscale(x)
    if operator == 'canny':
        return canny(gray)[0]
    if operator == 'laplacian':
        kernel_size = gray.shape[-2] // 10
        if kernel_size % 2 == 0:
            kernel_size += 1
        return laplacian(gray, kernel_size=max(kernel_size, 3))
    if operator == 'sobel':
        return sobel(gray)
    raise ValueError('operator must be one of {canny, laplacian, sobel}')


def edge_loss(sr: jax.Array, hr: jax.Array,
              operator: str = 'canny') -> jax.Array:
    sr = jax.lax.stop_gradient(sr)
    hr = jax.lax.stop_gradient(hr)
    return jnp.mean(jnp.abs(extract_edges(sr, operator)
                            - extract_edges(hr, operator)))
