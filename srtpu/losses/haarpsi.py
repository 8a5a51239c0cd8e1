"""HaarPSI — Haar wavelet-based perceptual similarity index (weight-free).

Parity target: piq.HaarPSILoss in the reference loss registry
(models/srmodel.py:36). Implements Reisenhofer et al. 2016 ("A Haar
Wavelet-Based Perceptual Similarity Index for Image Quality Assessment"):
3 Haar scales, horizontal+vertical orientations, logistic pooling with
C=30 (on a [0,255] range) and alpha=4.2, 2x subsampling, and YIQ chroma
similarity for RGB inputs. Pure JAX, fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_RGB2YIQ = np.array([[0.299, 0.587, 0.114],
                     [0.5959, -0.2746, -0.3213],
                     [0.2115, -0.5227, 0.3112]], dtype=np.float32)


@functools.lru_cache(maxsize=4)
def _haar_filters(scales: int):
    filters = []
    for j in range(1, scales + 1):
        size = 2 ** j
        f = np.zeros((size, size), dtype=np.float32)
        f[:size // 2, :] = -1.0 / (size * size)
        f[size // 2:, :] = 1.0 / (size * size)
        filters.append(f)
    return filters


def _conv_same(x: jax.Array, k2d: np.ndarray) -> jax.Array:
    from srtpu.utils.imgops import _depthwise
    kh, kw = k2d.shape
    # 'same' padding matching scipy correlate with zero fill; the valid
    # conv itself is slice-scale-adds (grouped convs lower to
    # near-scalar TPU code — PERF.md round 5)
    pad = ((0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0))
    return _depthwise(jnp.pad(x, pad), k2d)


def haarpsi(x: jax.Array, y: jax.Array, scales: int = 3, c: float = 30.0,
            alpha: float = 4.2, data_range: float = 1.0) -> jax.Array:
    """HaarPSI similarity in [0, 1] (1 = identical). NHWC, RGB or gray."""
    x = x.astype(jnp.float32) * (255.0 / data_range)
    y = y.astype(jnp.float32) * (255.0 / data_range)

    is_color = x.shape[-1] == 3
    if is_color:
        x_yiq = jnp.einsum('...c,dc->...d', x, jnp.asarray(_RGB2YIQ))
        y_yiq = jnp.einsum('...c,dc->...d', y, jnp.asarray(_RGB2YIQ))
        x_l, y_l = x_yiq[..., 0:1], y_yiq[..., 0:1]
        x_iq, y_iq = x_yiq[..., 1:3], y_yiq[..., 1:3]
    else:
        x_l, y_l = x, y
        x_iq = y_iq = None

    # 2x subsample via 2x2 mean pooling
    def pool2(v):
        return jax.lax.reduce_window(v, 0.0, jax.lax.add, (1, 2, 2, 1),
                                     (1, 2, 2, 1), 'SAME') / 4.0

    x_l, y_l = pool2(x_l), pool2(y_l)
    if is_color:
        x_iq, y_iq = pool2(x_iq), pool2(y_iq)

    filters = _haar_filters(scales)
    sims, weights = [], []
    for orientation in range(2):  # 0: horizontal edges, 1: vertical
        coeffs_x, coeffs_y = [], []
        for f in filters:
            k = f if orientation == 0 else f.T
            coeffs_x.append(jnp.abs(_conv_same(x_l, k)))
            coeffs_y.append(jnp.abs(_conv_same(y_l, k)))
        # local similarity from the first two scales
        s = ((2 * coeffs_x[0] * coeffs_y[0] + c)
             / (coeffs_x[0] ** 2 + coeffs_y[0] ** 2 + c)
             + (2 * coeffs_x[1] * coeffs_y[1] + c)
             / (coeffs_x[1] ** 2 + coeffs_y[1] ** 2 + c)) / 2.0
        w = jnp.maximum(coeffs_x[scales - 1], coeffs_y[scales - 1])
        sims.append(s)
        weights.append(w)

    if is_color:
        def mean2(v):
            k = np.full((2, 2), 0.25, dtype=np.float32)
            return jnp.abs(_conv_same(v, k))

        sim_iq = (2 * mean2(x_iq) * mean2(y_iq) + c) / \
                 (mean2(x_iq) ** 2 + mean2(y_iq) ** 2 + c)
        s_chroma = jnp.mean(sim_iq, axis=-1, keepdims=True)
        w_chroma = (weights[0] + weights[1]) / 2.0
        sims.append(s_chroma)
        weights.append(w_chroma)

    sims = jnp.concatenate([s.reshape(s.shape[0], -1) for s in sims], axis=1)
    weights = jnp.concatenate([w.reshape(w.shape[0], -1) for w in weights],
                              axis=1)
    pooled = jnp.sum(jax.nn.sigmoid(alpha * sims) * weights, axis=1) / \
        jnp.maximum(jnp.sum(weights, axis=1), 1e-12)
    # inverse logistic, squared
    pooled = jnp.clip(pooled, 1e-6, 1 - 1e-6)
    score = (jnp.log(pooled / (1 - pooled)) / alpha) ** 2
    return jnp.mean(score)


def haarpsi_loss(sr: jax.Array, hr: jax.Array, **kwargs) -> jax.Array:
    """1 - HaarPSI (piq.HaarPSILoss semantics). Inputs clamped to [0,1]
    by the composite-loss dispatcher (reference srmodel.py:525-528)."""
    return 1.0 - haarpsi(sr, hr, **kwargs)
