"""Barron's adaptive robust loss with trainable shape/scale parameters.

Capability parity with robust_loss_pytorch.AdaptiveImageLossFunction as used
by the reference ('adaptive' entry, models/srmodel.py:32 with
wavelet_num_levels=2; trainable parameters joined into the optimizer,
srmodel.py:145-154; loss applied to (sr - hr) and averaged, srmodel.py:535).

Implements the general robust loss
    rho(x, alpha, c) = (|a-2|/a) * (((x/c)^2 / |a-2| + 1)^(a/2) - 1)
(Barron, CVPR 2019) with per-channel trainable latent alpha in
(alpha_lo, alpha_hi) via a scaled sigmoid and latent scale via softplus —
the same latent parameterization the reference library uses. The residual is
evaluated in a YUV + 2-level Haar wavelet image representation
(TPU-friendly stand-in for the reference's CDF9/7, same multi-scale intent),
so parameters adapt per frequency band like AdaptiveImageLossFunction.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_RGB2YUV = jnp.asarray([[0.299, 0.587, 0.114],
                        [-0.14714119, -0.28886916, 0.43601035],
                        [0.61497538, -0.51496512, -0.10001026]],
                       dtype=jnp.float32)


def _haar_level(x: jax.Array):
    """One 2D Haar analysis level on NHWC (H, W even; trailing odd row/col
    is dropped, which is safe for the even patch sizes used in training)."""
    h2, w2 = (x.shape[1] // 2) * 2, (x.shape[2] // 2) * 2
    x = x[:, :h2, :w2, :]
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    c = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + c + d) / 2.0
    lh = (a - b + c - d) / 2.0
    hl = (a + b - c - d) / 2.0
    hh = (a - b - c + d) / 2.0
    return ll, (lh, hl, hh)


def wavelet_bands(x: jax.Array, num_levels: int = 2) -> list[jax.Array]:
    """YUV + Haar multi-level decomposition; returns flattened band list."""
    x = jnp.einsum('...c,dc->...d', x.astype(jnp.float32), _RGB2YUV)
    bands = []
    ll = x
    for _ in range(num_levels):
        ll, (lh, hl, hh) = _haar_level(ll)
        bands.extend([lh, hl, hh])
    bands.append(ll)
    return bands


def general_loss(x: jax.Array, alpha: jax.Array, scale: jax.Array,
                 eps: float = 1e-6) -> jax.Array:
    """Barron's general loss, numerically-stable branch blend under jit."""
    x = x.astype(jnp.float32) / scale
    sq = jnp.square(x)
    # alpha == 2 -> 0.5 x^2 ; alpha == 0 -> log(0.5 x^2 + 1); general form
    b = jnp.abs(alpha - 2.0) + eps
    d = jnp.where(alpha >= 0, alpha + eps, alpha - eps)
    loss_general = (b / d) * (jnp.power(sq / b + 1.0, 0.5 * d) - 1.0)
    loss_zero = jnp.log1p(0.5 * sq)
    loss_two = 0.5 * sq
    out = jnp.where(jnp.abs(alpha) < eps, loss_zero,
                    jnp.where(jnp.abs(alpha - 2.0) < eps, loss_two,
                              loss_general))
    return out


class AdaptiveLoss:
    """Trainable adaptive loss over a multi-band image representation.

    Latent parameters (one (alpha, scale) pair per band x channel) live in
    the TrainState's loss_params collection and are co-optimized with the
    model, mirroring reference srmodel.py:145-154.
    """

    trainable = True

    def __init__(self, num_levels: int = 2, channels: int = 3,
                 alpha_lo: float = 0.001, alpha_hi: float = 1.999,
                 alpha_init: float = 1.0, scale_lo: float = 1e-5,
                 scale_init: float = 1.0):
        self.num_levels = num_levels
        self.channels = channels
        self.alpha_lo = alpha_lo
        self.alpha_hi = alpha_hi
        self.alpha_init = alpha_init
        self.scale_lo = scale_lo
        self.scale_init = scale_init
        self.n_bands = 3 * num_levels + 1

    def init(self, rng: jax.Array | None = None) -> dict[str, jax.Array]:
        # invert the affine-sigmoid for alpha_init
        t = (self.alpha_init - self.alpha_lo) / (self.alpha_hi - self.alpha_lo)
        latent_alpha = math.log(t / (1 - t)) if 0 < t < 1 else 0.0
        # invert shifted-softplus for scale_init
        latent_scale = math.log(
            math.expm1(self.scale_init - self.scale_lo) + 1e-12) \
            if self.scale_init > self.scale_lo else 0.0
        shape = (self.n_bands, self.channels)
        return {
            'latent_alpha': jnp.full(shape, latent_alpha, jnp.float32),
            'latent_scale': jnp.full(shape, latent_scale, jnp.float32),
        }

    def alphas_scales(self, params):
        alpha = self.alpha_lo + (self.alpha_hi - self.alpha_lo) * \
            jax.nn.sigmoid(params['latent_alpha'])
        scale = self.scale_lo + jax.nn.softplus(params['latent_scale'])
        return alpha, scale

    def __call__(self, sr: jax.Array, hr: jax.Array,
                 params: dict[str, jax.Array]) -> jax.Array:
        alpha, scale = self.alphas_scales(params)
        residual_bands = wavelet_bands(sr - hr, self.num_levels)
        total, count = 0.0, 0
        for i, band in enumerate(residual_bands):
            total = total + jnp.sum(general_loss(band, alpha[i], scale[i]))
            count += band.size
        return total / count
