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
    use_pallas: bool | str = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cs=None):
        expand, linear = 6, 0.8
        if self.use_pallas == 'cs':
            # CS-mode block: params named expand/linear/conv (materialized
            # weight norm). With cs=(w_img, k) x is (G, C, S) and the
            # fused kernel runs; with cs=None (unsupported shapes, e.g.
            # large eval images) the SAME params run through XLA math.
            return self._cs_block(x, expand, linear, cs)
        if self.use_pallas is True:
            return self._fused(x, expand, linear)
        res = WNConv2d(self.n_feats * expand, 1, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = WNConv2d(int(self.n_feats * linear), 1, dtype=self.dtype)(res)
        res = WNConv2d(self.n_feats, 3, dtype=self.dtype)(res)
        return res * self.res_scale + x

    def _wn_params(self, name, k, cin, cout):
        import math
        from .common import torch_uniform_init
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

    def _cs_block(self, x_cs, expand, linear, cs):
        """Whole block as one Pallas kernel per direction; h1 (6C wide)
        never leaves VMEM (srtpu/ops/wdsr_cs.py). cs=None: XLA fallback
        with the same stored params."""
        from srtpu.ops.wdsr_cs import wdsr_block_cs, wdsr_lp
        n, e = self.n_feats, self.n_feats * expand
        lv, lp = wdsr_lp(n, linear)
        w1, b1 = self._wn_params('expand', 1, n, e)
        w2, b2 = self._wn_params('linear', 1, e, lv)
        w3, b3 = self._wn_params('conv', 3, lv, n)
        dtype = self.dtype or x_cs.dtype
        if cs is None:
            from srtpu.ops.cs_conv import conv3x3_reference
            xd = x_cs.astype(dtype)
            h1 = jax.nn.relu(xd @ w1[0, 0].astype(dtype)
                             + b1.astype(dtype))
            h2 = h1 @ w2[0, 0].astype(dtype) + b2.astype(dtype)
            res = conv3x3_reference(h2, w3.astype(dtype), b3)
            return res * self.res_scale + xd
        w_img, k = cs
        # pad the bottleneck width to a 16-multiple; zero rows are exact
        # and their grads are sliced off by jnp.pad's VJP
        w2m = jnp.pad(jnp.transpose(w2[0, 0]), ((0, lp - lv), (0, 0)))
        b2p = jnp.pad(b2, (0, lp - lv))
        w3p = jnp.pad(w3, ((0, 0), (0, 0), (0, lp - lv), (0, 0)))
        return wdsr_block_cs(
            x_cs, jnp.transpose(w1[0, 0]).astype(dtype),
            b1, w2m.astype(dtype), b2p, w3p.astype(dtype), b3,
            self.res_scale, w_img, k)

    def _fused(self, x, expand, linear):
        """Fused Pallas path (srtpu.ops.wdsr_block): the 6x-expanded
        activation never leaves VMEM. Weight-norm kernels are materialized
        here (w = g * v/||v||) so the kernel sees plain weights."""
        from srtpu.ops.wdsr_block import (wdsr_block_fits,
                                          wdsr_block_fused,
                                          wdsr_block_reference)
        n, e, L = self.n_feats, self.n_feats * expand, \
            int(self.n_feats * linear)

        w1, b1 = self._wn_params('expand', 1, n, e)
        w2, b2 = self._wn_params('linear', 1, e, L)
        w3, b3 = self._wn_params('conv', 3, L, n)
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
    # False: XLA; True: fused NHWC blocks (round 1, loses — PERF.md);
    # 'cs': CS-layout fused blocks, h1 VMEM-resident (type B only)
    use_pallas: bool | str = False
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
        cs_mode = (self.use_pallas == 'cs' and self.block_type == 'B'
                   and self.n_feats % 16 == 0
                   and self.n_feats * 6 % 128 == 0)
        if cs_mode:
            # CS-mode blocks (params: expand/linear/conv). When the shape
            # supports a CS plan the whole trunk stays in the transposed
            # layout (one conversion each way); otherwise the same params
            # run through XLA math (large eval images).
            from srtpu.ops.cs_conv import cs_plan_s, cs_to_nhwc, nhwc_to_cs
            plan = cs_plan_s(
                (x.shape[0], x.shape[1], x.shape[2], self.n_feats),
                1024, 1088)
            from srtpu.ops.cs_conv import log_path
            log_path('CSWDSRTrunk', x.shape,
                     'xla' if plan is None else 'cs')
            if plan is not None:
                k, _ = plan
                w_img = x.shape[2]
                dtype = self.dtype or x.dtype
                x_cs = nhwc_to_cs(x.astype(dtype), k)
                for _ in range(self.n_resblocks):
                    x_cs = _BlockB(self.n_feats, self.res_scale,
                                   use_pallas='cs', dtype=self.dtype)(
                                       x_cs, cs=(w_img, k))
                x = cs_to_nhwc(x_cs, k, x.shape[1], w_img)
            else:
                for _ in range(self.n_resblocks):
                    x = _BlockB(self.n_feats, self.res_scale,
                                use_pallas='cs', dtype=self.dtype)(x)
        else:
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
