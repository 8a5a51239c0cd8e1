"""RDN — residual dense network with local and global feature fusion.

Capability parity with reference models/rdn.py:9-111: dense-growth conv
blocks (concat), per-block local feature fusion (1x1), global fusion over the
concatenation of all block outputs, config A=(20 blocks, 6 layers, growth 32)
/ B=(16, 8, 64), and a scale-specific sub-pixel upsampling net.

Deviation (documented): the reference hard-codes 3 output channels for
scales 2/3 (rdn.py:85) but uses self._channels for scale 4; we use
``channels`` consistently.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv2d, pixel_shuffle

RDN_CONFIGS = {
    'A': (20, 6, 32),
    'B': (16, 8, 64),
}


class _RDB(nn.Module):
    """Residual dense block: C dense conv layers + 1x1 local fusion."""

    growth0: int
    growth: int
    n_layers: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feats = x
        for _ in range(self.n_layers):
            out = Conv2d(self.growth, self.kernel_size, dtype=self.dtype)(feats)
            out = nn.relu(out)
            feats = jnp.concatenate([feats, out], axis=-1)
        fused = Conv2d(self.growth0, 1, dtype=self.dtype)(feats)
        return fused + x


class RDN(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    rdn_config: str = 'B'
    growth0: int = 64
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        D, C, G = RDN_CONFIGS[self.rdn_config]
        G0, k = self.growth0, self.kernel_size

        f1 = Conv2d(G0, k, dtype=self.dtype)(x)
        x = Conv2d(G0, k, dtype=self.dtype)(f1)

        block_outs = []
        for _ in range(D):
            x = _RDB(G0, G, C, k, dtype=self.dtype)(x)
            block_outs.append(x)

        x = Conv2d(G0, 1, dtype=self.dtype)(
            jnp.concatenate(block_outs, axis=-1))
        x = Conv2d(G0, k, dtype=self.dtype)(x)
        x = x + f1

        s = self.scale_factor
        if s in (2, 3):
            x = Conv2d(G * s * s, k, dtype=self.dtype)(x)
            x = pixel_shuffle(x, s)
            x = Conv2d(self.channels, k, dtype=self.dtype)(x)
        elif s == 4:
            x = Conv2d(G * 4, k, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
            x = Conv2d(G * 4, k, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
            x = Conv2d(self.channels, k, dtype=self.dtype)(x)
        else:
            raise ValueError('RDN scale must be 2, 3 or 4.')
        return x
