"""RCAN — residual-in-residual network with channel attention.

Capability parity with reference models/rcan.py:10-129: CALayer squeeze-
excite gates (global average pool -> 1x1 reduce -> ReLU -> 1x1 expand ->
sigmoid), RCAB residual blocks, n_resgroups residual groups each with a
closing conv and group skip, global skip, mean shift in/out, sub-pixel tail.

The squeeze-excite gate also has a fused Pallas implementation in
srtpu.ops.ca_layer used on the training hot path.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv2d, UpscaleBlock, mean_shift


class CALayer(nn.Module):
    channel: int
    reduction: int = 16
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.use_pallas:
            from srtpu.ops import ca_layer_fits, ca_layer_fused_trainable
            import math
            c, r = self.channel, self.reduction
            w1 = self.param('w1', _ca_init(c), (c, c // r))
            b1 = self.param('b1', _ca_init(c), (c // r,))
            w2 = self.param('w2', _ca_init(c // r), (c // r, c))
            b2 = self.param('b2', _ca_init(c // r), (c,))
            if ca_layer_fits(x.shape, x.dtype):
                return ca_layer_fused_trainable(x, w1, b1, w2, b2)
            from srtpu.ops import ca_layer_reference
            return ca_layer_reference(x, w1, b1, w2, b2)
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Conv2d(self.channel, 1, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y


def _ca_init(fan_in):
    import math
    import jax
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class RCAB(nn.Module):
    n_feats: int
    kernel_size: int = 3
    reduction: int = 16
    res_scale: float = 1.0
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype)(res)
        res = CALayer(self.n_feats, self.reduction,
                      use_pallas=self.use_pallas, dtype=self.dtype)(res)
        return res + x


class ResidualGroup(nn.Module):
    n_feats: int
    kernel_size: int = 3
    reduction: int = 16
    n_resblocks: int = 16
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = x
        for _ in range(self.n_resblocks):
            res = RCAB(self.n_feats, self.kernel_size, self.reduction,
                       use_pallas=self.use_pallas, dtype=self.dtype)(res)
        res = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype)(res)
        return res + x


class RCAN(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n_feats: int = 64
    n_resblocks: int = 16
    n_resgroups: int = 10
    reduction: int = 16
    res_scale: float = 1.0
    use_pallas: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channels == 3:
            x = mean_shift(x, sign=-1)

        x = Conv2d(self.n_feats, 3, dtype=self.dtype)(x)

        res = x
        for _ in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, 3, self.reduction,
                                self.n_resblocks,
                                use_pallas=self.use_pallas,
                                dtype=self.dtype)(res)
        res = Conv2d(self.n_feats, 3, dtype=self.dtype)(res)
        x = res + x

        x = UpscaleBlock(self.scale_factor, self.n_feats, dtype=self.dtype)(x)
        x = Conv2d(self.channels, 3, dtype=self.dtype)(x)

        if self.channels == 3:
            x = mean_shift(x, sign=1)
        return x
