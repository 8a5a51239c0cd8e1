"""PieAPP — perceptual image-error assessment through pairwise preference.

Parity target: piq.PieAPP in the reference loss registry
(models/srmodel.py:43). Implements the PieAPPv0.1 architecture
(Prashnani et al., CVPR 2018): a shared feature-extraction CNN over 64x64
patches (11 conv layers, multi-scale feature taps after conv3/5/7/9/11),
and two MLP heads on the reference-minus-distorted feature difference — a
per-patch score and a per-patch weight — combined as a weighted average
over a patch grid.

Like LPIPS/DISTS, perceptual fidelity requires converted pretrained
weights (``SRTPU_WEIGHTS_DIR/pieapp.npz``; zero-egress environments can't
fetch the original checkpoint). Without them a deterministic random init is
used and a warning logged — shapes, masking and gradients are exercised
either way.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)

PATCH = 64
STRIDE = 27  # piq.PieAPP default stride

# conv plan: (out_channels, pool_after)
_CONV_PLAN = [
    (64, False), (64, True),     # conv1, conv2 + pool
    (64, False), (128, True),    # conv3, conv4 + pool
    (128, False), (128, True),   # conv5, conv6 + pool
    (128, False), (256, True),   # conv7, conv8 + pool
    (256, False), (512, True),   # conv9, conv10 + pool
    (512, False),                # conv11
]
# feature taps (1-indexed conv numbers) for the multi-scale vector
_TAPS = (3, 5, 7, 9, 11)


def _init_params(rng_seed: int = 0, weights: str | None = None,
                 return_loaded: bool = False):
    loaded = _try_load(weights)
    rng = np.random.default_rng(rng_seed)
    params = {'convs': [], 'fc_score': [], 'fc_weight': []}

    in_c = 3
    for i, (out_c, _) in enumerate(_CONV_PLAN):
        if loaded is not None:
            k = np.transpose(loaded[f'conv{i + 1}.weight'], (2, 3, 1, 0))
            b = loaded[f'conv{i + 1}.bias']
        else:
            bound = 1.0 / np.sqrt(9 * in_c)
            k = rng.uniform(-bound, bound, (3, 3, in_c, out_c)).astype(
                np.float32)
            b = rng.uniform(-bound, bound, out_c).astype(np.float32)
        params['convs'].append((jnp.asarray(k), jnp.asarray(b)))
        in_c = out_c

    # feature-vector length for 64x64 input: taps flattened+concatenated
    feat_len = _feature_length()
    coarse_len = 512 * 2 * 2  # conv11 output at 64/2^5 = 2x2

    def fc_stack(name, in_dim):
        dims = [(in_dim, 512), (512, 1)]
        out = []
        for j, (a, b_) in enumerate(dims):
            if loaded is not None:
                w = loaded[f'{name}{j + 1}.weight'].T
                bias = loaded[f'{name}{j + 1}.bias']
            else:
                bound = 1.0 / np.sqrt(a)
                w = rng.uniform(-bound, bound, (a, b_)).astype(np.float32)
                bias = rng.uniform(-bound, bound, b_).astype(np.float32)
            out.append((jnp.asarray(w), jnp.asarray(bias)))
        return out

    params['fc_score'] = fc_stack('fc_score', feat_len)
    params['fc_weight'] = fc_stack('fc_weight', coarse_len)
    if return_loaded:
        return params, loaded is not None
    return params


def _feature_length() -> int:
    size, total = PATCH, 0
    tap_sizes = {}
    conv_i = 0
    for out_c, pool in _CONV_PLAN:
        conv_i += 1
        tap_sizes[conv_i] = (size, out_c)
        if pool:
            size //= 2
    return sum(h * h * c for t, (h, c) in tap_sizes.items() if t in _TAPS)


def _try_load(weights: str | None):
    path = weights
    if path is None:
        wdir = os.environ.get('SRTPU_WEIGHTS_DIR', 'weights')
        path = Path(wdir) / 'pieapp.npz'
    path = Path(path)
    if path.exists():
        _logger.info('Loaded PieAPP weights from %s', path)
        return dict(np.load(path))
    _logger.warning('PieAPP pretrained weights not found at %s — using '
                    'deterministic random init (ordering-only proxy).',
                    path)
    return None


def _extract_features(params, x):
    """x: (N, 64, 64, 3) patches -> (multi-scale features, coarse)."""
    taps = []
    h = x
    conv_i = 0
    for (k, b), (out_c, pool) in zip(params['convs'], _CONV_PLAN):
        h = jax.lax.conv_general_dilated(
            h, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
        h = jax.nn.relu(h)
        conv_i += 1
        if conv_i in _TAPS:
            taps.append(h.reshape(h.shape[0], -1))
        if pool:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    coarse = h.reshape(h.shape[0], -1)
    return jnp.concatenate(taps, axis=1), coarse


def _mlp(stack, x):
    w1, b1 = stack[0]
    w2, b2 = stack[1]
    h = jax.nn.relu(x @ w1 + b1)
    return h @ w2 + b2


def _patches(img, patch=PATCH, stride=STRIDE):
    """(1, H, W, C) -> (N, patch, patch, C) grid with the piq stride."""
    _, h, w, c = img.shape
    ys = list(range(0, max(h - patch, 0) + 1, stride)) or [0]
    xs = list(range(0, max(w - patch, 0) + 1, stride)) or [0]
    out = [img[0, y:y + patch, x:x + patch, :] for y in ys for x in xs]
    return jnp.stack(out)


class PieAPP:
    """Lower is better; full-reference. Inputs NHWC in [0, 1] (clamped by
    the composite dispatcher — reference srmodel.py:525-528). Images must
    be at least 64x64 (eval bucketing guarantees this)."""

    trainable = False

    def __init__(self, weights: str | None = None, rng_seed: int = 0):
        self.params, self.pretrained = _init_params(rng_seed, weights,
                                                    return_loaded=True)

    def __call__(self, sr: jax.Array, hr: jax.Array, params=None):
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, self.params)
        total, wsum = 0.0, 0.0
        for b in range(sr.shape[0]):
            p_sr = _patches(sr[b:b + 1].astype(jnp.float32))
            p_hr = _patches(hr[b:b + 1].astype(jnp.float32))
            f_sr, c_sr = _extract_features(frozen, p_sr)
            f_hr, c_hr = _extract_features(frozen, p_hr)
            score = _mlp(frozen['fc_score'], f_hr - f_sr)[:, 0]
            weight = _mlp(frozen['fc_weight'], c_hr - c_sr)[:, 0] + 1e-6
            weight = jnp.abs(weight)
            total = total + jnp.sum(score * weight)
            wsum = wsum + jnp.sum(weight)
        return total / wsum
