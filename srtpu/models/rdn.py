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
    # 'cs' (default since round 3): fused whole-RDB Pallas kernels — 22.3
    # vs 27.3 ms/step XLA at the B flagship (PERF.md). Config B /
    # 64-multiple channels only; other configs and unsupported shapes run
    # the same params through XLA math. NOTE: 'cs' stores a different
    # checkpoint param tree than False (CS-arranged stacks vs per-block
    # HWIO) — a False-tree checkpoint cannot resume under 'cs'.
    use_pallas: bool | str = 'cs'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        D, C, G = RDN_CONFIGS[self.rdn_config]
        G0, k = self.growth0, self.kernel_size

        f1 = Conv2d(G0, k, dtype=self.dtype)(x)
        # CS path needs uniform 16-multiple growth and, for dense inputs
        # wider than 128 channels, 64-multiples (the chunked convT)
        cs_ok = (self.use_pallas == 'cs' and G == G0 and k == 3
                 and G0 % 16 == 0
                 and all(G0 * (i + 1) <= 64 or G0 * (i + 1) % 64 == 0
                         for i in range(C + 1)))
        if cs_ok:
            x = self._cs_trunk(f1, D, C, G, G0)
        else:
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

    def _cs_trunk(self, f1, D, C, G, G0):
        """SFE conv 2 + D dense blocks + global fusion, CS layout
        (srtpu.ops.cs_conv.rdn_trunk_cs). Takes/returns NHWC."""
        import math
        import jax
        from .common import torch_uniform_init
        from srtpu.ops.cs_conv import (conv3x3_cs_pre, cs_plan_s,
                                       cs_to_nhwc, nhwc_to_cs,
                                       rdn_trunk_cs2)

        def u(bound, shape, name):
            return self.param(name, torch_uniform_init(bound), shape)

        c_tot = G0 + C * G
        sfe2_w = u(1 / math.sqrt(9 * G0), (3 * G0, 3 * G0), 'sfe2_kernel')
        sfe2_b = u(1 / math.sqrt(9 * G0), (G0,), 'sfe2_bias')
        ws, bs = [], []
        for i in range(C):
            cin = G0 + i * G
            ws.append(u(1 / math.sqrt(9 * cin), (D, 3 * G, 3 * cin),
                        f'dense{i}_kernel'))
            bs.append(u(1 / math.sqrt(9 * cin), (D, G), f'dense{i}_bias'))
        wfs = u(1 / math.sqrt(c_tot), (D, G0, c_tot), 'lff_kernel')
        bfs = u(1 / math.sqrt(c_tot), (D, G0), 'lff_bias')
        gff1_w = u(1 / math.sqrt(D * G0), (G0, D * G0), 'gff1_kernel')
        gff1_b = u(1 / math.sqrt(D * G0), (G0,), 'gff1_bias')
        gff2_w = u(1 / math.sqrt(9 * G0), (3 * G0, 3 * G0), 'gff2_kernel')
        gff2_b = u(1 / math.sqrt(9 * G0), (G0,), 'gff2_bias')

        dtype = self.dtype or f1.dtype
        f1d = f1.astype(dtype)
        # S<=1024: the widest dense layer's double-buffered (c_in, S)
        # blocks must fit VMEM alongside the chunk scratches
        plan = cs_plan_s(f1.shape, 1024, 1088)
        from srtpu.ops.cs_conv import log_path
        log_path('CSRDNTrunk', f1.shape, 'xla' if plan is None else 'cs')
        if plan is None:
            return self._xla_trunk_from_cs_params(
                f1d, D, C, G, G0, sfe2_w, sfe2_b, ws, bs, wfs, bfs,
                gff1_w, gff1_b, gff2_w, gff2_b, dtype)

        k, _ = plan
        h, w = f1.shape[1], f1.shape[2]
        f1c = nhwc_to_cs(f1d, k)
        x = conv3x3_cs_pre(f1c, sfe2_w, sfe2_b, w, k)
        # round-3 fused whole-RDB kernels: the dense buffer stays VMEM-
        # resident across all C layers (no per-layer concat traffic).
        # cs_conv._RDN_FWD selects per-block calls vs the round-5
        # grid-over-blocks single kernel (A/B: tools/ab_rdn_grid.py)
        from srtpu.ops import cs_conv as _cs
        if _cs._RDN_FWD == 'grid':
            from srtpu.ops.cs_conv import rdn_trunk_cat_cs
            cat = rdn_trunk_cat_cs(x, tuple(ws), tuple(bs), wfs, bfs,
                                   w, k)                # (Gr, D*G0, S)
        else:
            outs = rdn_trunk_cs2(x, tuple(ws), tuple(bs), wfs, bfs, w, k)
            cat = jnp.concatenate(outs, axis=1)        # (Gr, D*G0, S)
        y = jnp.einsum('oc,gcs->gos', gff1_w.astype(dtype), cat) \
            + gff1_b[:, None].astype(dtype)
        y = conv3x3_cs_pre(y, gff2_w, gff2_b, w, k) + f1c
        return cs_to_nhwc(y, k, h, w)

    def _xla_trunk_from_cs_params(self, f1, D, C, G, G0, sfe2_w, sfe2_b,
                                  ws, bs, wfs, bfs, gff1_w, gff1_b,
                                  gff2_w, gff2_b, dtype):
        """XLA fallback running the SAME CS-stored params (un-arranged)."""
        import jax
        from srtpu.ops.cs_conv import conv3x3_reference, w_hwio_from_cs
        x = conv3x3_reference(
            f1, w_hwio_from_cs(sfe2_w[None], G0, G0)[0].astype(dtype),
            sfe2_b)
        whs = [w_hwio_from_cs(ws[i], G0 + i * G, G) for i in range(C)]
        block_outs = []
        for l in range(D):
            feats = x
            for i in range(C):
                o = conv3x3_reference(feats, whs[i][l].astype(dtype),
                                      bs[i][l])
                feats = jnp.concatenate([feats, jax.nn.relu(o)], axis=-1)
            fused = jnp.einsum('bhwc,oc->bhwo', feats,
                               wfs[l].astype(dtype)) + bfs[l].astype(dtype)
            x = fused + x
            block_outs.append(x)
        cat = jnp.concatenate(block_outs, axis=-1)
        y = jnp.einsum('bhwc,oc->bhwo', cat, gff1_w.astype(dtype)) \
            + gff1_b.astype(dtype)
        y = conv3x3_reference(
            y, w_hwio_from_cs(gff2_w[None], G0, G0)[0].astype(dtype),
            gff2_b)
        return y + f1
