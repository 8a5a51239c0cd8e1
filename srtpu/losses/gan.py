"""GAN losses: lsgan, vanilla (BCE-with-logits), wgangp.

Parity: reference losses/losses.py:10-51 (GANLoss modes and target-label
semantics). Pure functions over discriminator outputs; used by the SRGAN
adversarial loop in srtpu.train.gan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(prediction: jax.Array, target_is_real: bool,
             gan_mode: str = 'wgangp', target_real_label: float = 1.0,
             target_fake_label: float = 0.0) -> jax.Array:
    prediction = prediction.astype(jnp.float32)
    if gan_mode == 'lsgan':
        target = target_real_label if target_is_real else target_fake_label
        return jnp.mean(jnp.square(prediction - target))
    if gan_mode == 'vanilla':
        target = target_real_label if target_is_real else target_fake_label
        t = jnp.full_like(prediction, target)
        # BCE with logits, numerically stable form
        return jnp.mean(jnp.maximum(prediction, 0) - prediction * t
                        + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
    if gan_mode == 'wgangp':
        return -jnp.mean(prediction) if target_is_real \
            else jnp.mean(prediction)
    raise NotImplementedError(f'gan mode {gan_mode} not implemented')
