"""SRResNet — batch-normalized residual SR network with PReLU activations.

Capability parity with reference models/srresnet.py:9-36: 9x9 head conv with
PReLU, n_resblocks batch-norm ResBlocks + closing conv/BN with a global skip,
sub-pixel upscale tail with PReLU, and a 9x9 output conv.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from .common import (BasicBlock, Conv2d, PReLU, ResBlock, UpscaleBlock)


class SRResNet(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n_feats: int = 64
    n_resblocks: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.n_feats, kernel_size=9, act=PReLU,
                       dtype=self.dtype)(x, train)

        res = x
        for _ in range(self.n_resblocks):
            res = ResBlock(n_feats=self.n_feats, kernel_size=3,
                           n_conv_layers=2, norm='batch', act=PReLU,
                           dtype=self.dtype)(res, train)
        res = BasicBlock(self.n_feats, kernel_size=3, norm='batch', act=None,
                         dtype=self.dtype)(res, train)
        x = res + x

        x = UpscaleBlock(self.scale_factor, self.n_feats, act=PReLU,
                         dtype=self.dtype)(x)
        x = Conv2d(self.channels, 9, dtype=self.dtype)(x)
        return x
