"""VGG16/19 feature extractors and perceptual losses (VGG loss, LPIPS, DISTS).

Capability parity:
* VGGLoss — feature-space MSE at a named relu layer with ImageNet
  normalization and 0.006 rescale (reference losses/losses.py:54-117).
* LPIPS — piq.LPIPS entry of the loss/metric registries (reference
  models/srmodel.py:39,50): VGG16 features, channel-unit-normalized, squared
  difference, per-layer linear weights, spatial mean, layer sum.
* DISTS — piq.DISTS (reference srmodel.py:33): structure/texture similarity
  over VGG16 feature stages with learned alpha/beta weights.

Pretrained torchvision weights cannot be downloaded in a zero-egress
environment; these modules load converted weights from an .npz (see
tools/convert_torch_weights.py) pointed to by ``SRTPU_WEIGHTS_DIR`` or the
explicit ``weights`` argument. Without weights they fall back to a
deterministic random init and emit a warning — gradients and shapes are
exercised either way, but perceptual fidelity requires the converted weights.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger(__name__)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# conv channel plans; 'M' = 2x2 max pool
VGG16_PLAN = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512, 'M')
VGG19_PLAN = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M')


def _layer_names(plan) -> list[str]:
    names, block, idx = [], 1, 1
    for p in plan:
        if p == 'M':
            names.append(f'pool{block}')
            block += 1
            idx = 1
        else:
            names.append(f'relu{block}_{idx}')
            idx += 1
    return names


def vgg_layer_names(net_type: str) -> list[str]:
    return _layer_names(VGG16_PLAN if net_type == 'vgg16' else VGG19_PLAN)


def init_vgg_params(net_type: str = 'vgg19', rng_seed: int = 0,
                    weights: str | None = None,
                    return_loaded: bool = False):
    """Build the conv parameter list, from converted weights if available.

    ``return_loaded=True`` additionally returns whether real (converted
    pretrained) weights were found — callers surface this loudly at fit
    time (reference gets torchvision weights at runtime,
    losses/losses.py:128,170)."""
    plan = VGG16_PLAN if net_type == 'vgg16' else VGG19_PLAN

    loaded = _try_load(net_type, weights)
    params = []
    rng = np.random.default_rng(rng_seed)
    in_c = 3
    conv_indices = iter(_torchvision_conv_indices(plan))
    for p in plan:
        if p == 'M':
            continue
        conv_i = next(conv_indices)
        if loaded is not None:
            k = loaded[f'features.{conv_i}.weight']  # torch OIHW
            b = loaded[f'features.{conv_i}.bias']
            kernel = np.transpose(k, (2, 3, 1, 0))  # -> HWIO
        else:
            bound = 1.0 / np.sqrt(3 * 3 * in_c)
            kernel = rng.uniform(-bound, bound, (3, 3, in_c, p)).astype(
                np.float32)
            b = rng.uniform(-bound, bound, p).astype(np.float32)
        params.append({'kernel': jnp.asarray(kernel), 'bias': jnp.asarray(b)})
        in_c = p
    if return_loaded:
        return params, loaded is not None
    return params


def _torchvision_conv_indices(plan) -> list[int]:
    idx, out = 0, []
    for p in plan:
        if p == 'M':
            idx += 1
        else:
            out.append(idx)
            idx += 2  # conv + relu
    return out


def _try_load(net_type: str, weights: str | None):
    path = weights
    if path is None:
        wdir = os.environ.get('SRTPU_WEIGHTS_DIR', 'weights')
        path = Path(wdir) / f'{net_type}_features.npz'
    path = Path(path)
    if path.exists():
        data = dict(np.load(path))
        _logger.info('Loaded %s features from %s', net_type, path)
        return data
    _logger.warning(
        '%s pretrained weights not found at %s — using deterministic random '
        'init. Perceptual losses/metrics (VGG/LPIPS/DISTS) need converted '
        'weights for fidelity; see tools/convert_torch_weights.py.',
        net_type, path)
    return None


def _l2_pool(x: jax.Array) -> jax.Array:
    """Depthwise L2-pooling: sqrt of hann-windowed average of squares,
    stride 2 (the DISTS paper's anti-aliased pool; piq.DISTS replaces every
    VGG max-pool with this)."""
    from srtpu.utils.imgops import tree_sum
    w = np.hanning(5)[1:-1]
    k = np.outer(w, w)
    k = (k / k.sum()).astype(np.float32)
    # strided depthwise conv as 9 strided-slice multiply-adds (grouped
    # convs lower to near-scalar TPU code — PERF.md round 5)
    xsq = jnp.pad(jnp.square(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, hh, ww, c = xsq.shape
    oh, ow = (hh - 3) // 2 + 1, (ww - 3) // 2 + 1
    terms = [float(k[i, j]) * jax.lax.slice(
        xsq, (0, i, j, 0), (b, i + 2 * (oh - 1) + 1, j + 2 * (ow - 1) + 1, c),
        (1, 2, 2, 1))
        for i in range(3) for j in range(3)]
    return jnp.sqrt(tree_sum(terms) + 1e-12)


def vgg_features(params: list[dict], plan, x: jax.Array,
                 taps: tuple[str, ...], pool: str = 'max',
                 mask: jax.Array | None = None):
    """Run the conv stack, returning ``(activations, masks)`` dicts at the
    named taps.

    With ``mask`` (NHW1 validity of a top-left rectangle, the eval padding
    convention of data/pipeline.py pad_to_bucket), activations are zeroed
    outside the valid region after EVERY layer. This makes the computation
    on a padded image bit-equal, inside the valid region, to running the
    unpadded image through the same stack: 'SAME' convs zero-pad at the
    true boundary either way, and the 2x2/2 VALID max-pool windows that
    survive min-pooling the mask only ever touch valid rows/cols. Callers
    can therefore take masked spatial means and score a padded and an
    unpadded copy of one image identically (reference evaluates true
    shapes, srmodel.py:214-232).
    """
    assert mask is None or pool == 'max', 'masking implemented for max-pool'
    names = _layer_names(plan)
    outputs = {}
    masks = {}
    conv_i = 0
    if mask is not None:
        mask = mask.astype(x.dtype)
        x = x * mask
    for p, name in zip(plan, names):
        if p == 'M':
            if pool == 'l2':
                x = _l2_pool(x)
            else:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
                if mask is not None:
                    # a pooled cell is valid iff its whole window is
                    mask = -jax.lax.reduce_window(
                        -mask, -jnp.inf, jax.lax.max,
                        (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
        else:
            w = params[conv_i]
            x = jax.lax.conv_general_dilated(
                x, w['kernel'].astype(x.dtype), (1, 1), 'SAME',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) \
                + w['bias'].astype(x.dtype)
            x = jax.nn.relu(x)
            conv_i += 1
        if mask is not None:
            x = x * mask
        if name in outputs:
            continue
        if name in taps:
            outputs[name] = x
            masks[name] = mask
        if len(outputs) == len(taps):
            break
    missing = set(taps) - set(outputs)
    if missing:
        raise ValueError(f'Unknown VGG taps: {sorted(missing)}')
    return outputs, masks


def _normalize_imagenet(x: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class VGGLoss:
    """Feature MSE at one relu layer, rescaled (losses/losses.py:54-117)."""

    trainable = False

    def __init__(self, net_type: str = 'vgg19', layer: str = 'relu2_2',
                 rescale: float = 0.006, weights: str | None = None):
        valid = {'vgg16': ['relu1_2', 'relu2_2', 'relu3_3', 'relu4_3'],
                 'vgg19': ['relu1_2', 'relu2_2', 'relu3_4', 'relu4_4',
                           'relu5_4']}
        assert layer in valid[net_type], f'{layer} invalid for {net_type}'
        self.net_type = net_type
        self.layer = layer
        self.rescale = rescale
        self.plan = VGG16_PLAN if net_type == 'vgg16' else VGG19_PLAN
        self.params, self.pretrained = init_vgg_params(
            net_type, weights=weights, return_loaded=True)

    def __call__(self, sr: jax.Array, hr: jax.Array, params=None):
        sr = _normalize_imagenet(sr.astype(jnp.float32))
        hr = _normalize_imagenet(hr.astype(jnp.float32))
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, self.params)
        f_sr = vgg_features(frozen, self.plan, sr,
                            (self.layer,))[0][self.layer]
        f_hr = vgg_features(frozen, self.plan, hr,
                            (self.layer,))[0][self.layer]
        return jnp.mean(jnp.square(f_sr - f_hr)) * self.rescale


_LPIPS_TAPS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')
# LPIPS normalizes inputs with its own shift/scale constants.
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


class LPIPS:
    """Learned perceptual metric over VGG16 features (piq.LPIPS parity)."""

    trainable = False

    def __init__(self, weights_dir: str | None = None, rng_seed: int = 0):
        wdir = Path(weights_dir
                    or os.environ.get('SRTPU_WEIGHTS_DIR', 'weights'))
        self.plan = VGG16_PLAN
        self.params, vgg_loaded = init_vgg_params(
            'vgg16', rng_seed=rng_seed,
            weights=wdir / 'vgg16_features.npz', return_loaded=True)
        self.lin_weights, lin_loaded = self._load_lin(wdir)
        self.pretrained = vgg_loaded and lin_loaded

    def _load_lin(self, wdir: Path):
        path = Path(wdir) / 'lpips_lin.npz'
        if path.exists():
            data = np.load(path)
            return [jnp.asarray(data[f'lin{i}']) for i in range(5)], True
        _logger.warning('LPIPS linear weights not found at %s — using unit '
                        'weights (feature distances unweighted).', path)
        dims = (64, 128, 256, 512, 512)
        return [jnp.ones((d,), jnp.float32) / d for d in dims], False

    def __call__(self, sr: jax.Array, hr: jax.Array, params=None,
                 mask: jax.Array | None = None):
        shift = jnp.asarray(_LPIPS_SHIFT, jnp.float32)
        scale = jnp.asarray(_LPIPS_SCALE, jnp.float32)

        def prep(x):
            x = x.astype(jnp.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
            return (x - shift) / scale

        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, self.params)
        f_sr, msks = vgg_features(frozen, self.plan, prep(sr), _LPIPS_TAPS,
                                  mask=mask)
        f_hr, _ = vgg_features(frozen, self.plan, prep(hr), _LPIPS_TAPS,
                               mask=mask)

        total = 0.0
        for tap, lin in zip(_LPIPS_TAPS, self.lin_weights):
            a = _unit_normalize(f_sr[tap])
            b = _unit_normalize(f_hr[tap])
            d = jnp.square(a - b)
            d = jnp.sum(d * lin, axis=-1)          # learned 1x1 conv
            m = msks[tap]
            if m is None:
                total = total + jnp.mean(d, axis=(1, 2))  # spatial mean
            else:
                m2 = m[..., 0]
                total = total + (jnp.sum(d * m2, axis=(1, 2))
                                 / jnp.maximum(jnp.sum(m2, axis=(1, 2)), 1.0))
        return jnp.mean(total)


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)) + eps
    return x / norm


_DISTS_TAPS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')


class DISTS:
    """Deep image structure & texture similarity (piq.DISTS parity).

    Per VGG16 stage (plus the input image): texture term from means,
    structure term from covariances, combined with learned per-channel
    alpha/beta weights (uniform fallback without converted weights).
    """

    trainable = False

    def __init__(self, weights_dir: str | None = None, rng_seed: int = 0):
        wdir = Path(weights_dir
                    or os.environ.get('SRTPU_WEIGHTS_DIR', 'weights'))
        self.plan = VGG16_PLAN
        self.params, vgg_loaded = init_vgg_params(
            'vgg16', rng_seed=rng_seed,
            weights=wdir / 'vgg16_features.npz', return_loaded=True)
        (self.alpha, self.beta), ab_loaded = self._load_ab(wdir)
        self.pretrained = vgg_loaded and ab_loaded

    def _load_ab(self, wdir: Path):
        path = Path(wdir) / 'dists_ab.npz'
        dims = (3, 64, 128, 256, 512, 512)
        if path.exists():
            data = np.load(path)
            return ([jnp.asarray(data[f'alpha{i}']) for i in range(6)],
                    [jnp.asarray(data[f'beta{i}']) for i in range(6)]), True
        _logger.warning('DISTS alpha/beta weights not found at %s — using '
                        'uniform weights.', path)
        total = sum(dims) * 2
        return ([jnp.full((d,), 1.0 / total) for d in dims],
                [jnp.full((d,), 1.0 / total) for d in dims]), False

    def __call__(self, sr: jax.Array, hr: jax.Array, params=None):
        c1 = c2 = 1e-6
        sr32 = _normalize_imagenet(sr.astype(jnp.float32))
        hr32 = _normalize_imagenet(hr.astype(jnp.float32))
        frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, self.params)
        # DISTS runs VGG16 with L2-pooling in place of max-pooling (the
        # paper's anti-aliased feature stack; piq.DISTS does the same)
        sr_taps = vgg_features(frozen, self.plan, sr32, _DISTS_TAPS,
                               pool='l2')[0]
        hr_taps = vgg_features(frozen, self.plan, hr32, _DISTS_TAPS,
                               pool='l2')[0]
        feats_sr = [sr.astype(jnp.float32)] + [sr_taps[t]
                                               for t in _DISTS_TAPS]
        feats_hr = [hr.astype(jnp.float32)] + [hr_taps[t]
                                               for t in _DISTS_TAPS]

        score = 0.0
        for fx, fy, a, b in zip(feats_sr, feats_hr, self.alpha, self.beta):
            mx = jnp.mean(fx, axis=(1, 2))
            my = jnp.mean(fy, axis=(1, 2))
            vx = jnp.mean(jnp.square(fx), axis=(1, 2)) - jnp.square(mx)
            vy = jnp.mean(jnp.square(fy), axis=(1, 2)) - jnp.square(my)
            cxy = jnp.mean(fx * fy, axis=(1, 2)) - mx * my
            tex = (2 * mx * my + c1) / (jnp.square(mx) + jnp.square(my) + c1)
            struct = (2 * cxy + c2) / (vx + vy + c2)
            score = score + jnp.mean(jnp.sum(a * tex + b * struct, axis=-1))
        return 1.0 - score
