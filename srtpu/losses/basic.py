"""Pixel-space losses: L1/MAE, L2/MSE, total variation, grayscale PSNR.

Parity: nn.L1Loss/nn.MSELoss entries of the loss registry (reference
models/srmodel.py:37-41), TVLoss (reference losses/losses.py:211-233) and
the grayscale PSNR module (reference losses/losses.py:236-250). All are
NHWC and jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srtpu.utils.imgops import rgb_to_grayscale


def l1_loss(sr: jax.Array, hr: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(sr.astype(jnp.float32) - hr.astype(jnp.float32)))


def l2_loss(sr: jax.Array, hr: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(sr.astype(jnp.float32)
                               - hr.astype(jnp.float32)))


def tv_loss(x: jax.Array, weight: float = 1.0) -> jax.Array:
    """Total variation: 2 * (mean squared dh / count_h + dw / count_w) per
    batch element (reference losses/losses.py:218-233 semantics)."""
    x = x.astype(jnp.float32)
    b = x.shape[0]
    h_tv = jnp.sum(jnp.square(x[:, 1:, :, :] - x[:, :-1, :, :]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:, :] - x[:, :, :-1, :]))
    count_h = x[:, 1:, :, :].size // b
    count_w = x[:, :, 1:, :].size // b
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def psnr_gray(sr: jax.Array, hr: jax.Array, max_val: float = 1.0) -> jax.Array:
    """PSNR on luma (reference losses/losses.py:236-250: converts RGB to
    grayscale first, single mse over the whole batch)."""
    sr = rgb_to_grayscale(sr.astype(jnp.float32))
    hr = rgb_to_grayscale(hr.astype(jnp.float32))
    mse = jnp.mean(jnp.square(sr - hr))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
