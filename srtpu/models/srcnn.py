"""SRCNN — bicubic pre-upsample followed by a 3-conv refinement net.

Capability parity with reference models/srcnn.py:9-27 (9-1-5 conv stack on a
bicubically upscaled input). TPU-native twist: the bicubic upsample is two
interpolation-matrix matmuls (MXU) instead of a gather-based interpolate.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from .common import Conv2d, bicubic_resize


class SRCNN(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x = bicubic_resize(
            x, (h * self.scale_factor, w * self.scale_factor), a=-0.75,
            antialias=False)
        x = Conv2d(64, 9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv2d(32, 1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv2d(self.channels, 5, dtype=self.dtype)(x)
        return x
