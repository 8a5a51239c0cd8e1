"""WDSR — wide-activation SR network with weight-normalized convolutions.

Capability parity with reference models/wdsr.py:9-117:
* block A: 4x channel expansion (3x3 conv), ReLU, 3x3 back-projection;
* block B: 6x expansion (1x1), ReLU, 0.8x linear bottleneck (1x1), 3x3 conv;
* every conv weight-normalized; learned 5x5 skip branch, both branches end in
  a pixel shuffle straight to image space; manual DIV2K RGB mean sub/add.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import DIV2K_RGB_MEAN, WNConv2d, pixel_shuffle


class _BlockA(nn.Module):
    n_feats: int
    res_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = WNConv2d(4 * self.n_feats, 3, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = WNConv2d(self.n_feats, 3, dtype=self.dtype)(res)
        return res * self.res_scale + x


class _BlockB(nn.Module):
    n_feats: int
    res_scale: float = 1.0
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        expand, linear = 6, 0.8
        if self.use_pallas:
            return self._fused(x, expand, linear)
        res = WNConv2d(self.n_feats * expand, 1, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = WNConv2d(int(self.n_feats * linear), 1, dtype=self.dtype)(res)
        res = WNConv2d(self.n_feats, 3, dtype=self.dtype)(res)
        return res * self.res_scale + x

    def _fused(self, x, expand, linear):
        """Fused Pallas path (srtpu.ops.wdsr_block): the 6x-expanded
        activation never leaves VMEM. Weight-norm kernels are materialized
        here (w = g * v/||v||) so the kernel sees plain weights."""
        import math
        from srtpu.ops.wdsr_block import (wdsr_block_fits,
                                          wdsr_block_fused,
                                          wdsr_block_reference)
        from .common import torch_uniform_init
        n, e, L = self.n_feats, self.n_feats * expand, \
            int(self.n_feats * linear)

        def wn_params(name, k, cin, cout):
            bound = 1.0 / math.sqrt(k * k * cin)
            v = self.param(f'{name}_v', torch_uniform_init(bound),
                           (k, k, cin, cout))
            g = self.param(
                f'{name}_g', lambda key, shape: jnp.linalg.norm(
                    jax.lax.stop_gradient(v).reshape(-1, cout), axis=0),
                (cout,))
            b = self.param(f'{name}_b', torch_uniform_init(bound), (cout,))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + 1e-12)
            return v * (g / norm), b

        w1, b1 = wn_params('expand', 1, n, e)
        w2, b2 = wn_params('linear', 1, e, L)
        w3, b3 = wn_params('conv', 3, L, n)
        dtype = self.dtype or x.dtype
        args = (x.astype(dtype), w1[0, 0].astype(dtype),
                b1.astype(jnp.float32), w2[0, 0].astype(dtype),
                b2.astype(jnp.float32), w3.astype(dtype),
                b3.astype(jnp.float32))
        if wdsr_block_fits(x.shape, expand, dtype):
            return wdsr_block_fused(*args, self.res_scale)
        return wdsr_block_reference(*args, res_scale=self.res_scale)


class WDSR(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    block_type: str = 'B'
    n_feats: int = 128
    n_resblocks: int = 16
    res_scale: float = 1.0
    use_pallas: bool = False   # fused wide-activation blocks (type B only)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channels == 3:
            rgb_mean = jnp.asarray(DIV2K_RGB_MEAN, dtype=x.dtype)
            x = x - rgb_mean

        r = self.scale_factor
        out_feats = r * r * self.channels

        s = WNConv2d(out_feats, 5, dtype=self.dtype)(x)
        s = pixel_shuffle(s, r)

        x = WNConv2d(self.n_feats, 3, dtype=self.dtype)(x)
        for _ in range(self.n_resblocks):
            if self.block_type == 'A':
                x = _BlockA(self.n_feats, self.res_scale,
                            dtype=self.dtype)(x)
            else:
                x = _BlockB(self.n_feats, self.res_scale,
                            use_pallas=self.use_pallas,
                            dtype=self.dtype)(x)
        x = WNConv2d(out_feats, 3, dtype=self.dtype)(x)
        x = pixel_shuffle(x, r)

        x = x + s
        if self.channels == 3:
            x = x + rgb_mean
        return x
