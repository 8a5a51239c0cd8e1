"""DDBPN — dense deep back-projection network.

Capability parity with reference models/ddbpn.py:10-137: scale-matched
projection convs (kernel/stride/pad = 6/2/2, 8/4/2, 12/8/2 for x2/x4/x8),
dense up/down projection units with PReLU and optional 1x1 bottlenecks,
depth-6 alternation with dense concatenation, mean shift in/out.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv2d, ConvTranspose2d, PReLU, mean_shift

_PROJ_PARAMS = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class _ProjectionConv(nn.Module):
    features: int
    scale: int
    up: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p = _PROJ_PARAMS[self.scale]
        if self.up:
            return ConvTranspose2d(self.features, k, strides=s, padding=p,
                                   dtype=self.dtype)(x)
        return Conv2d(self.features, k, strides=s, padding=p,
                      dtype=self.dtype)(x)


class DenseProjection(nn.Module):
    nr: int
    scale: int
    up: bool
    bottleneck: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.bottleneck:
            x = Conv2d(self.nr, 1, dtype=self.dtype)(x)
            x = PReLU(self.nr)(x)
        inter = x.shape[-1]

        a0 = _ProjectionConv(self.nr, self.scale, self.up, self.dtype)(x)
        a0 = PReLU(self.nr)(a0)
        b0 = _ProjectionConv(inter, self.scale, not self.up, self.dtype)(a0)
        b0 = PReLU(inter)(b0)
        e = b0 - x
        a1 = _ProjectionConv(self.nr, self.scale, self.up, self.dtype)(e)
        a1 = PReLU(self.nr)(a1)
        return a0 + a1


class DDBPN(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n0: int = 128
    nr: int = 32
    depth: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channels == 3:
            x = mean_shift(x, sign=-1)

        x = Conv2d(self.n0, 3, dtype=self.dtype)(x)
        x = PReLU(self.n0)(x)
        x = Conv2d(self.nr, 1, dtype=self.dtype)(x)
        x = PReLU(self.nr)(x)

        h_list, l_list = [], []
        for i in range(self.depth - 1):
            l = x if i == 0 else jnp.concatenate(l_list, axis=-1)
            h_list.append(DenseProjection(
                self.nr, self.scale_factor, up=True, bottleneck=i > 1,
                dtype=self.dtype)(l))
            l_list.append(DenseProjection(
                self.nr, self.scale_factor, up=False, bottleneck=i != 0,
                dtype=self.dtype)(jnp.concatenate(h_list, axis=-1)))

        h_list.append(DenseProjection(
            self.nr, self.scale_factor, up=True, bottleneck=True,
            dtype=self.dtype)(jnp.concatenate(l_list, axis=-1)))

        out = Conv2d(self.channels, 3, dtype=self.dtype)(
            jnp.concatenate(h_list, axis=-1))

        if self.channels == 3:
            out = mean_shift(out, sign=1)
        return out
