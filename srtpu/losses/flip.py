"""FLIP perceptual difference metric/loss in pure JAX (NHWC).

Implements the published FLIP algorithm (Andersson et al., "FLIP: A
Difference Evaluator for Alternating Images", HPG 2020) with the same
parameterization the reference uses (reference losses/flip.py:48-109):
monitor distance 0.7 m, width 0.7 m, 3840 px, qc=0.7, qf=0.5, pc=0.4,
pt=0.95, and the reference's training-stability clamps.

TPU-native design (not a translation):
* the reference hard-codes `.cuda()` (flip.py:152,162,...) — here everything
  is device-agnostic jnp;
* CSF and feature-detection filter banks are built once in numpy from the
  (static) pixels-per-degree, so the jitted computation has static shapes;
* color transforms are 3x3 matmuls on the channels-last axis (VPU/MXU
  friendly) instead of reshape-to-NC(HW) matmuls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# D65 linear-RGB -> XYZ (same rational constants as the published algorithm).
_RGB2XYZ = np.array([
    [10135552 / 24577794, 8788810 / 24577794, 4435075 / 24577794],
    [2613072 / 12288897, 8788810 / 12288897, 887015 / 12288897],
    [1425312 / 73733382, 8788810 / 73733382, 70074185 / 73733382],
], dtype=np.float64)
# reference illuminant = linrgb2xyz(ones) = row sums
_REF_ILLUMINANT = _RGB2XYZ.sum(axis=1)

DEFAULT_PPD = 0.7 * (3840 / 0.7) * (math.pi / 180)


def srgb_to_linear(x: jax.Array) -> jax.Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)


def linear_to_srgb(x: jax.Array) -> jax.Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x > 0.0031308,
                     1.055 * x ** (1.0 / 2.4) - 0.055, 12.92 * x)


def _matmul_c(x: jax.Array, m: np.ndarray) -> jax.Array:
    """Apply a 3x3 color matrix along the trailing channel axis."""
    return jnp.einsum('...c,dc->...d', x, jnp.asarray(m, x.dtype))


def linrgb_to_xyz(x):
    return _matmul_c(x, _RGB2XYZ)


def xyz_to_linrgb(x):
    return _matmul_c(x, np.linalg.inv(_RGB2XYZ))


def xyz_to_ycxcz(x):
    x = x / jnp.asarray(_REF_ILLUMINANT, x.dtype)
    y = 116.0 * x[..., 1:2] - 16.0
    cx = 500.0 * (x[..., 0:1] - x[..., 1:2])
    cz = 200.0 * (x[..., 1:2] - x[..., 2:3])
    return jnp.concatenate([y, cx, cz], axis=-1)


def ycxcz_to_xyz(x):
    y = (x[..., 0:1] + 16.0) / 116.0
    cx = x[..., 1:2] / 500.0
    cz = x[..., 2:3] / 200.0
    return jnp.concatenate([y + cx, y, y - cz], axis=-1) * jnp.asarray(
        _REF_ILLUMINANT, x.dtype)


def xyz_to_lab(x):
    x = x / jnp.asarray(_REF_ILLUMINANT, x.dtype)
    delta = 6.0 / 29.0
    limit = 0.00885
    x = jnp.where(x > limit, jnp.cbrt(x),
                  x / (3 * delta * delta) + 4.0 / 29.0)
    l = 116.0 * x[..., 1:2] - 16.0
    a = 500.0 * (x[..., 0:1] - x[..., 1:2])
    b = 200.0 * (x[..., 1:2] - x[..., 2:3])
    return jnp.concatenate([l, a, b], axis=-1)


def srgb_to_ycxcz(x):
    return xyz_to_ycxcz(linrgb_to_xyz(srgb_to_linear(x)))


def linrgb_to_lab(x):
    return xyz_to_lab(linrgb_to_xyz(x))


@functools.lru_cache(maxsize=4)
def _csf_filters(ppd: float):
    """Per-channel CSF gaussians (A, RG, BY), one shared static radius."""
    params = {
        'A': (1.0, 0.0047, 0.0, 1e-5),
        'RG': (1.0, 0.0053, 0.0, 1e-5),
        'BY': (34.1, 0.04, 13.5, 0.025),
    }
    max_b = 0.04
    r = int(np.ceil(3 * np.sqrt(max_b / (2 * np.pi ** 2)) * ppd))
    dx = 1.0 / ppd
    xs, ys = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    z = (xs * dx) ** 2 + (ys * dx) ** 2
    filters = []
    for key in ('A', 'RG', 'BY'):
        a1, b1, a2, b2 = params[key]
        g = (a1 * np.sqrt(np.pi / b1) * np.exp(-np.pi ** 2 * z / b1)
             + a2 * np.sqrt(np.pi / b2) * np.exp(-np.pi ** 2 * z / b2))
        filters.append((g / g.sum()).astype(np.float32))
    return np.stack(filters, axis=-1), r  # (k, k, 3)


@functools.lru_cache(maxsize=4)
def _feature_filters(ppd: float):
    """Edge and point detection kernels (x-direction; y = transpose)."""
    w = 0.082
    sd = 0.5 * w * ppd
    r = int(np.ceil(3 * sd))
    xs, ys = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    g = np.exp(-(xs ** 2 + ys ** 2) / (2 * sd * sd))

    def normalize(gx):
        neg = -gx[gx < 0].sum()
        pos = gx[gx > 0].sum()
        return np.where(gx < 0, gx / neg, gx / pos).astype(np.float32)

    edge = normalize(-xs * g)
    point = normalize((xs ** 2 / (sd * sd) - 1) * g)
    return edge, point, r


def _depthwise_valid(x: jax.Array, kernels: jax.Array) -> jax.Array:
    """Per-channel valid conv: x NHWC, kernels (k, k, C).

    Shifted slice-scale-adds instead of a grouped conv — grouped convs
    lower to near-scalar TPU code (PERF.md round 5 SSIM finding); each
    tap is a (C,)-broadcast multiply the XLA fuser handles at VPU
    bandwidth."""
    from srtpu.utils.imgops import tree_sum
    kh, kw, _ = kernels.shape
    b, hh, ww, c = x.shape
    n, m = hh - kh + 1, ww - kw + 1
    terms = [kernels[i, j] * jax.lax.slice(
        x, (0, i, j, 0), (b, i + n, j + m, c))
        for i in range(kh) for j in range(kw)]
    return tree_sum(terms)


def _replicate_pad(x: jax.Array, r: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode='edge')


def _hunt(lab: jax.Array) -> jax.Array:
    l = lab[..., 0:1]
    return jnp.concatenate([l, 0.01 * l * lab[..., 1:2],
                            0.01 * l * lab[..., 2:3]], axis=-1)


def _hyab(a: jax.Array, b: jax.Array) -> jax.Array:
    d = a - b
    return (jnp.abs(d[..., 0:1])
            + jnp.sqrt(jnp.sum(jnp.square(d[..., 1:3]), axis=-1,
                               keepdims=True) + 1e-20))


@functools.lru_cache(maxsize=4)
def _cmax(qc: float) -> float:
    green = np.array([0.0, 1.0, 0.0])
    blue = np.array([0.0, 0.0, 1.0])

    def lab(rgb):
        xyz = _RGB2XYZ @ rgb / _REF_ILLUMINANT
        delta, limit = 6 / 29, 0.00885
        f = np.where(xyz > limit, np.cbrt(xyz),
                     xyz / (3 * delta * delta) + 4 / 29)
        l = 116 * f[1] - 16
        return np.array([l, 500 * (f[0] - f[1]), 200 * (f[1] - f[2])])

    def hunt(v):
        return np.array([v[0], 0.01 * v[0] * v[1], 0.01 * v[0] * v[2]])

    g, b = hunt(lab(green)), hunt(lab(blue))
    d = g - b
    hyab = abs(d[0]) + np.linalg.norm(d[1:])
    return float(hyab ** qc)


def flip(reference: jax.Array, test: jax.Array,
         ppd: float = DEFAULT_PPD, qc: float = 0.7, qf: float = 0.5,
         pc: float = 0.4, pt: float = 0.95,
         mask: jax.Array | None = None) -> jax.Array:
    """Mean FLIP error between sRGB images in [0,1], NHWC.

    ``mask`` (NHW1) restricts the mean to valid pixels for padded eval.
    """
    reference = reference.astype(jnp.float32)
    test = test.astype(jnp.float32)
    ref_ycc = srgb_to_ycxcz(reference)
    test_ycc = srgb_to_ycxcz(test)

    # --- color pipeline ---
    csf, radius = _csf_filters(ppd)
    csf = jnp.asarray(csf)

    def filter_clamp(ycc):
        filtered = _depthwise_valid(_replicate_pad(ycc, radius), csf)
        return jnp.clip(xyz_to_linrgb(ycxcz_to_xyz(filtered)), 0.0, 1.0)

    pre_ref = _hunt(linrgb_to_lab(filter_clamp(ref_ycc)))
    pre_test = _hunt(linrgb_to_lab(filter_clamp(test_ycc)))

    delta_e_hyab = _hyab(pre_ref, pre_test) ** qc
    cmax = _cmax(qc)
    pccmax = pc * cmax
    delta_e_c = jnp.where(
        delta_e_hyab < pccmax,
        (pt / pccmax) * delta_e_hyab,
        pt + ((delta_e_hyab - pccmax) / (cmax - pccmax)) * (1.0 - pt))

    # --- feature pipeline ---
    edge_k, point_k, fr = _feature_filters(ppd)
    kx = jnp.stack([jnp.asarray(edge_k), jnp.asarray(point_k)], axis=-1)
    ky = jnp.stack([jnp.asarray(edge_k).T, jnp.asarray(point_k).T], axis=-1)

    def features(y):
        y2 = jnp.concatenate([y, y], axis=-1)  # edge + point channels
        padded = _replicate_pad(y2, fr)
        fx = _depthwise_valid(padded, kx)
        fy = _depthwise_valid(padded, ky)
        # norm over (x, y) per detector
        return jnp.sqrt(fx * fx + fy * fy + 1e-20)

    ref_y = (ref_ycc[..., 0:1] + 16.0) / 116.0
    test_y = (test_ycc[..., 0:1] + 16.0) / 116.0
    f_ref = features(ref_y)
    f_test = features(test_y)
    delta_e_f = jnp.max(jnp.abs(f_ref - f_test), axis=-1, keepdims=True)
    delta_e_f = ((1.0 / math.sqrt(2.0)) * delta_e_f) ** qf
    delta_e_f = jnp.clip(delta_e_f, 0.0, 1.0)  # reference stability clamp

    err = delta_e_c ** (1.0 - delta_e_f)
    if mask is not None:
        m = jnp.broadcast_to(mask, err.shape)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(err)


def flip_loss(sr: jax.Array, hr: jax.Array, **kwargs) -> jax.Array:
    """FLIP as a training loss (reference losses/flip.py:40-46:
    loss = model(outputs, targets) computes flip(reference=targets?, ...) —
    the reference forwards (outputs, targets) into compute_flip(targets,
    outputs), i.e. HR is the reference image)."""
    return flip(hr, sr, **kwargs)
