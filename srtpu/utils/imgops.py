"""Device-side image-processing primitives (NHWC, pure JAX).

These replace the reference's kornia dependency (grayscale conversion,
gaussian blur, sobel/laplacian/canny edge maps — used by EdgeLoss and
PencilSketchLoss, reference losses/edge_loss.py and losses/pencil_sketch.py).
Everything is static-shaped and jit-friendly; filters are built in numpy at
trace time.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights (kornia rgb_to_grayscale default).
_GRAY_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """NHWC RGB -> NHW1 luma."""
    if x.shape[-1] == 1:
        return x
    w = jnp.asarray(_GRAY_WEIGHTS, x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def invert(x: jax.Array, max_val: float = 1.0) -> jax.Array:
    return max_val - x


def _pad(x: jax.Array, ph: int, pw: int, mode: str) -> jax.Array:
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)


def tree_sum(terms: list) -> jax.Array:
    """Pairwise (tree) sum — matches conv accumulation rounding closely
    and keeps cancellation-sensitive downstream math stable."""
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1]
                 for i in range(0, len(terms) - 1, 2)] \
            + ([terms[-1]] if len(terms) % 2 else [])
    return terms[0]


def _depthwise(x: jax.Array, kernel2d: jax.Array) -> jax.Array:
    """Valid depthwise conv of NHWC with one 2D kernel shared per channel.

    Computed as shifted slice-scale-adds, NOT a grouped conv:
    feature_group_count=C lowers to near-scalar code on TPU (measured
    25.4 ms for one 11x11-blurred 2048x1408 SSIM, 25x its bandwidth
    bound — PERF.md round 5); k*k slice terms are pure VPU elementwise
    that XLA fuses into one pass. Kernels are trace-time constants, so
    taps are baked as python scalars and zero taps are dropped
    (sobel/laplacian)."""
    k2 = np.asarray(kernel2d, np.float32)
    kh, kw = k2.shape
    b, hh, ww, c = x.shape
    n, m = hh - kh + 1, ww - kw + 1
    terms = [float(k2[i, j]) * jax.lax.slice(
        x, (0, i, j, 0), (b, i + n, j + m, c))
        for i in range(kh) for j in range(kw) if float(k2[i, j]) != 0.0]
    return tree_sum(terms)


@functools.lru_cache(maxsize=32)
def _gaussian_1d(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def gaussian_blur2d(x: jax.Array, kernel_size: int | tuple[int, int],
                    sigma: float | tuple[float, float] = 1.0,
                    border_type: str = 'reflect') -> jax.Array:
    """Separable gaussian blur (two depthwise 1D convs — VPU friendly)."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else kernel_size
    sh, sw = (sigma, sigma) if isinstance(sigma, (int, float)) else sigma
    gh = _gaussian_1d(kh, sh)[:, None]
    gw = _gaussian_1d(kw, sw)[None, :]
    x = _depthwise(_pad(x, kh // 2, 0, border_type), gh)
    x = _depthwise(_pad(x, 0, kw // 2, border_type), gw)
    return x


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)


def spatial_gradient(x: jax.Array, normalized: bool = True):
    """Sobel gx, gy with reflect padding (kornia spatial_gradient parity)."""
    kx = _SOBEL_X / 8.0 if normalized else _SOBEL_X
    ky = kx.T
    xp = _pad(x, 1, 1, 'reflect')
    return _depthwise(xp, kx), _depthwise(xp, ky)


def sobel(x: jax.Array, normalized: bool = True,
          eps: float = 1e-6) -> jax.Array:
    """Sobel edge magnitude (kornia.filters.sobel parity)."""
    gx, gy = spatial_gradient(x, normalized)
    return jnp.sqrt(gx * gx + gy * gy + eps)


@functools.lru_cache(maxsize=32)
def _laplacian_kernel(size: int, normalized: bool = True) -> np.ndarray:
    k = np.ones((size, size), dtype=np.float32)
    k[size // 2, size // 2] = 1.0 - size * size
    if normalized:
        k = k / np.abs(k).sum()
    return k


def laplacian(x: jax.Array, kernel_size: int,
              normalized: bool = True) -> jax.Array:
    """Laplacian filter (kornia.filters.laplacian parity)."""
    return _depthwise(_pad(x, kernel_size // 2, kernel_size // 2, 'reflect'),
                      _laplacian_kernel(kernel_size, normalized))


def canny(x: jax.Array, low_threshold: float = 0.1,
          high_threshold: float = 0.2, kernel_size: int = 5,
          sigma: float = 1.0, hysteresis_iters: int = 16,
          eps: float = 1e-6) -> tuple[jax.Array, jax.Array]:
    """Canny edges: returns (nms-thinned magnitude, binary edges).

    Parity with kornia.filters.canny semantics (used via EdgeLoss,
    reference losses/edge_loss.py:25 — which consumes element [0], the
    magnitude). Hysteresis runs a fixed number of propagation steps under
    jit instead of kornia's data-dependent convergence loop (XLA needs a
    static or while_loop bound; 16 dilation steps saturate typical images).
    """
    blurred = gaussian_blur2d(x, (kernel_size, kernel_size), (sigma, sigma))
    gx, gy = spatial_gradient(blurred, normalized=False)
    magnitude = jnp.sqrt(gx * gx + gy * gy + eps)
    angle = jnp.arctan2(gy, gx)

    # quantize angle to 8 directions
    ang = jnp.round(angle * (180.0 / math.pi) / 45.0) * 45.0
    # neighbor offsets for each of the 8 directions (dy, dx)
    offsets = [(0, 1), (1, 1), (1, 0), (1, -1),
               (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    mag_pad = _pad(magnitude, 1, 1, 'constant')
    h, w = magnitude.shape[1], magnitude.shape[2]

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(
            mag_pad, (0, 1 + dy, 1 + dx, 0),
            (mag_pad.shape[0], h, w, mag_pad.shape[3]))

    nms = jnp.zeros_like(magnitude, dtype=bool)
    for i, (dy, dx) in enumerate(offsets):
        direction = (-180.0 + 45.0 * i)
        sel = (ang == direction) | (ang == direction + 360.0)
        fwd = shifted(dy, dx)
        bwd = shifted(-dy, -dx)
        is_max = (magnitude >= fwd) & (magnitude >= bwd)
        nms = nms | (sel & is_max)

    thin_mag = magnitude * nms

    strong = thin_mag > high_threshold
    weak = (thin_mag > low_threshold) & ~strong

    def body(_, s):
        grown = jax.lax.reduce_window(
            s.astype(jnp.float32), 0.0, jax.lax.max,
            (1, 3, 3, 1), (1, 1, 1, 1), 'SAME') > 0
        return s | (grown & weak)

    strong = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    edges = (strong | jnp.zeros_like(weak)).astype(x.dtype)
    return thin_mag, edges


def center_crop(x: jax.Array, size: int | tuple[int, int]) -> jax.Array:
    """Center crop NHWC (kornia CenterCrop / torchvision center_crop parity,
    used for the 96px eval crops, reference srmodel.py:111,241)."""
    th, tw = (size, size) if isinstance(size, int) else size
    h, w = x.shape[1], x.shape[2]
    if h < th or w < tw:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                        (pw // 2, pw - pw // 2), (0, 0)))
        h, w = x.shape[1], x.shape[2]
    top = (h - th) // 2
    left = (w - tw) // 2
    return x[:, top:top + th, left:left + tw, :]
