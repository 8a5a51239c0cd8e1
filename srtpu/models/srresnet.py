"""SRResNet — batch-normalized residual SR network with PReLU activations.

Capability parity with reference models/srresnet.py:9-36: 9x9 head conv with
PReLU, n_resblocks batch-norm ResBlocks + closing conv/BN with a global skip,
sub-pixel upscale tail with PReLU, and a 9x9 output conv.

``use_pallas='cs'`` runs the BN trunk on the fused CS kernel path
(srtpu.ops.bn_resblock_cs) AND the tail (PReLU sub-pixel stages + the 9x9
output conv) on the CS upscale path: the 9x9 HR-resolution output conv —
the profiled bottleneck of the XLA step (PERF.md round 3) — lowers to a
5x5 phase-dense coarse conv at LR resolution. Same math, different
parameter tree (stacked CS-arranged weights, see CSBNTrunk/CSUpscaleTail).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from .common import (BasicBlock, Conv2d, CSBNTrunk, CSUpscaleTail, PReLU,
                     ResBlock, UpscaleBlock)


class SRResNet(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n_feats: int = 64
    n_resblocks: int = 16
    # 'cs' (default): fused CS BN trunk + phase-dense 5x5 coarse tail —
    # measured 2.47x vs XLA on TPU (PERF.md); off-plan shapes / non-TPU
    # backends fall back to XLA inside CSBNTrunk/CSUpscaleTail.
    use_pallas: Any = 'cs'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.n_feats, kernel_size=9, act=PReLU,
                       dtype=self.dtype)(x, train)

        if self.use_pallas == 'cs':
            h, w = x.shape[1], x.shape[2]
            x, k = CSBNTrunk(n_feats=self.n_feats,
                             n_resblocks=self.n_resblocks,
                             dtype=self.dtype)(x, train, emit_cs=True)
            # CS-packed seam: see srtpu/models/edsr.py
            return CSUpscaleTail(self.scale_factor, self.n_feats,
                                 self.channels, act=PReLU, final_ksize=9,
                                 dtype=self.dtype)(
                                     x, cs=None if k is None else (k, h, w))
        else:
            res = x
            for _ in range(self.n_resblocks):
                res = ResBlock(n_feats=self.n_feats, kernel_size=3,
                               n_conv_layers=2, norm='batch', act=PReLU,
                               dtype=self.dtype)(res, train)
            res = BasicBlock(self.n_feats, kernel_size=3, norm='batch',
                             act=None, dtype=self.dtype)(res, train)
            x = res + x

        x = UpscaleBlock(self.scale_factor, self.n_feats, act=PReLU,
                         dtype=self.dtype)(x)
        x = Conv2d(self.channels, 9, dtype=self.dtype)(x)
        return x
