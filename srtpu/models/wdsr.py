"""WDSR — wide-activation SR network with weight-normalized convolutions.

Capability parity with reference models/wdsr.py:9-117:
* block A: 4x channel expansion (3x3 conv), ReLU, 3x3 back-projection;
* block B: 6x expansion (1x1), ReLU, 0.8x linear bottleneck (1x1), 3x3 conv;
* every conv weight-normalized; learned 5x5 skip branch, both branches end in
  a pixel shuffle straight to image space; manual DIV2K RGB mean sub/add.
"""

from __future__ import annotations

from typing import Any

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
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        expand, linear = 6, 0.8
        res = WNConv2d(self.n_feats * expand, 1, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = WNConv2d(int(self.n_feats * linear), 1, dtype=self.dtype)(res)
        res = WNConv2d(self.n_feats, 3, dtype=self.dtype)(res)
        return res * self.res_scale + x


class WDSR(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    block_type: str = 'B'
    n_feats: int = 128
    n_resblocks: int = 16
    res_scale: float = 1.0
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
        block = _BlockA if self.block_type == 'A' else _BlockB
        for _ in range(self.n_resblocks):
            x = block(self.n_feats, self.res_scale, dtype=self.dtype)(x)
        x = WNConv2d(out_feats, 3, dtype=self.dtype)(x)
        x = pixel_shuffle(x, r)

        x = x + s
        if self.channels == 3:
            x = x + rgb_mean
        return x
