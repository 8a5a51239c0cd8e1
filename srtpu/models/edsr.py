"""EDSR — deep residual SR network without batch norm.

Capability parity with reference models/edsr.py:9-54: mean-shift in/out,
head conv, n_resblocks ResBlocks (+ closing conv) with a global skip, and a
sub-pixel upscale tail. Flagship model for the TPU build (BASELINE.json
config 2: EDSR-baseline = 16 resblocks, 64 features, x4).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from .common import (Conv2d, CSTrunk, CSUpscaleTail, FusedResBlock,
                     ResBlock, UpscaleBlock, mean_shift)


class EDSR(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    # 'cs' (default): the transposed channel-sublane trunk + tail —
    # measured 1.57-1.73x XLA across scales on TPU (PERF.md); off-plan
    # shapes / non-TPU backends fall back to XLA inside CSTrunk, so the
    # default is always safe. False: XLA convs; True: fused NHWC Pallas
    # resblocks. Checkpoints trained with use_pallas=False convert via
    # tools/convert_ckpt_layout.py (the CS trunk stores stacked
    # CS-arranged weights, not per-block HWIO trees).
    use_pallas: bool | str = 'cs'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channels == 3:
            x = mean_shift(x, sign=-1)

        x = Conv2d(self.n_feats, 3, dtype=self.dtype)(x)

        if self.use_pallas == 'cs':
            h, w = x.shape[1], x.shape[2]
            x, k = CSTrunk(n_feats=self.n_feats,
                           n_resblocks=self.n_resblocks,
                           res_scale=self.res_scale, dtype=self.dtype)(
                               x, emit_cs=True)
            # the trunk hands its CS-packed output straight to the tail —
            # no CS->NHWC->CS round trip at the seam
            x = CSUpscaleTail(self.scale_factor, self.n_feats,
                              self.channels, dtype=self.dtype)(
                                  x, cs=None if k is None else (k, h, w))
            if self.channels == 3:
                x = mean_shift(x, sign=1)
            return x
        else:
            res = x
            for _ in range(self.n_resblocks):
                if self.use_pallas:
                    res = FusedResBlock(n_feats=self.n_feats,
                                        res_scale=self.res_scale,
                                        dtype=self.dtype)(res)
                else:
                    res = ResBlock(n_feats=self.n_feats, kernel_size=3,
                                   res_scale=self.res_scale,
                                   dtype=self.dtype)(res)
            res = Conv2d(self.n_feats, 3, dtype=self.dtype)(res)
            x = res + x

        x = UpscaleBlock(self.scale_factor, self.n_feats,
                         dtype=self.dtype)(x)
        x = Conv2d(self.channels, 3, dtype=self.dtype)(x)

        if self.channels == 3:
            x = mean_shift(x, sign=1)
        return x
