"""RCAN — residual-in-residual network with channel attention.

Capability parity with reference models/rcan.py:10-129: CALayer squeeze-
excite gates (global average pool -> 1x1 reduce -> ReLU -> 1x1 expand ->
sigmoid), RCAB residual blocks, n_resgroups residual groups each with a
closing conv and group skip, global skip, mean shift in/out, sub-pixel tail.

The squeeze-excite gate also has a fused Pallas implementation in
srtpu.ops.ca_layer used on the training hot path.
"""

from __future__ import annotations

from typing import Any, ClassVar

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


class CSResidualGroup(nn.Module):
    """RCAN residual group on the CS-layout kernel path (srtpu.ops.cs_conv
    resgroup_ca_cs): fused Pallas conv pairs + channel attention computed
    directly on the transposed layout, one group-level custom VJP with
    stacked weights. Takes and returns NHWC; CSRCANTrunk below keeps the
    whole trunk in CS between groups."""

    n_feats: int = 64
    reduction: int = 16
    n_resblocks: int = 16
    dtype: Any = None

    def setup(self):
        import math
        n, nb, r = self.n_feats, self.n_resblocks, self.reduction
        cb = 1.0 / math.sqrt(9 * n)
        self.w1 = self.param('w1', _u_init(cb), (nb, 3 * n, 3 * n))
        self.b1 = self.param('b1', _u_init(cb), (nb, n))
        self.w2 = self.param('w2', _u_init(cb), (nb, 3 * n, 3 * n))
        self.b2 = self.param('b2', _u_init(cb), (nb, n))
        self.wd = self.param('wd', _u_init(1 / math.sqrt(n)), (nb, n, n // r))
        self.bd = self.param('bd', _u_init(1 / math.sqrt(n)), (nb, n // r))
        self.wu = self.param('wu', _u_init(1 / math.sqrt(n // r)),
                             (nb, n // r, n))
        self.bu = self.param('bu', _u_init(1 / math.sqrt(n // r)), (nb, n))
        self.wc = self.param('wc', _u_init(cb), (3 * n, 3 * n))
        self.bc = self.param('bc', _u_init(cb), (n,))

    def cs_apply(self, x_cs, h_img, w_img, k, s_valid=None):
        from srtpu.ops.cs_conv import resgroup_ca_cs
        return resgroup_ca_cs(x_cs, self.w1, self.b1, self.w2, self.b2,
                              self.wd, self.bd, self.wu, self.bu,
                              self.wc, self.bc, h_img, w_img, k, s_valid)

    def xla_apply(self, x):
        """Fallback for shapes the CS packing doesn't support."""
        import jax.numpy as jnp
        from srtpu.ops.cs_conv import (ca_gate_reference,
                                       conv3x3_reference, w_hwio_from_cs)
        n = self.n_feats
        w1h = w_hwio_from_cs(self.w1, n, n)
        w2h = w_hwio_from_cs(self.w2, n, n)
        wch = w_hwio_from_cs(self.wc[None], n, n)[0]
        res = x
        for i in range(self.n_resblocks):
            r = conv3x3_reference(res, w1h[i], self.b1[i])
            r = jnp.maximum(r, 0)
            r = conv3x3_reference(r, w2h[i], self.b2[i])
            r = ca_gate_reference(r, self.wd[i], self.bd[i],
                                  self.wu[i], self.bu[i])
            res = res + r
        return conv3x3_reference(res, wch, self.bc) + x

    def __call__(self, x):
        return self.xla_apply(x)


def _u_init(bound):
    import jax

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class RCAN(nn.Module):
    # channel attention pools over the WHOLE image (reference
    # rcan.py:10-29 AdaptiveAvgPool2d(1)): a tile-batched forward would
    # gate on per-tile statistics — different semantics, not a seam
    # effect — so the Trainer's tiled eval/predict path excludes RCAN.
    GLOBAL_POOLING: ClassVar[bool] = True

    scale_factor: int = 4
    channels: int = 3
    n_feats: int = 64
    n_resblocks: int = 16
    n_resgroups: int = 10
    reduction: int = 16
    res_scale: float = 1.0
    # 'cs' (default): CS-layout trunk with the fused CA gate — measured
    # +52% vs XLA at the 10x16 flagship on TPU (PERF.md); off-plan
    # shapes / non-TPU backends fall back to XLA inside _cs_trunk.
    # False: XLA; True: fused Pallas CA gate on NHWC.
    use_pallas: bool | str = 'cs'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.channels == 3:
            x = mean_shift(x, sign=-1)

        x = Conv2d(self.n_feats, 3, dtype=self.dtype)(x)

        if self.use_pallas == 'cs':
            # trunk on CS kernels; tail stays XLA — measured: the CS tail
            # bought RCAN only ~1% (the trunk dominates its 15 ms step)
            # while XLA compile time of the combined graph blew up ~10x
            x = self._cs_trunk(x)
            x = UpscaleBlock(self.scale_factor, self.n_feats,
                             dtype=self.dtype)(x)
            x = Conv2d(self.channels, 3, dtype=self.dtype)(x)
            if self.channels == 3:
                x = mean_shift(x, sign=1)
            return x

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

    def _cs_trunk(self, x):
        """All residual groups + trunk close conv + global skip in CS
        layout (one conversion each way); XLA fallback off-plan."""
        import math
        from srtpu.ops.cs_conv import (conv3x3_cs_pre, conv3x3_reference,
                                       cs_plan, cs_plan_pad, cs_to_nhwc,
                                       nhwc_to_cs, w_hwio_from_cs)
        n = self.n_feats
        groups = [CSResidualGroup(n_feats=n, reduction=self.reduction,
                                  n_resblocks=self.n_resblocks,
                                  dtype=self.dtype)
                  for _ in range(self.n_resgroups)]
        cb = 1.0 / math.sqrt(9 * n)
        wt = self.param('trunk_close_kernel', _u_init(cb), (3 * n, 3 * n))
        bt = self.param('trunk_close_bias', _u_init(cb), (n,))

        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        # lane-bound gate (see CSTrunk): cs_plan has no upper channel
        # bound, but the layout only wins while C under-fills the 128 MXU
        # lanes and the (3C, S) im2col stacks fit block VMEM
        plan = cs_plan(x.shape) if n <= 96 else None
        s_pad = s_valid = None
        if plan is None and n <= 96:
            # lane-unaligned S (the scale-3 42x42 recipe): dead-lane
            # padded packing — the CA segment pools mask the pad tail
            # (srtpu.ops.cs_conv resgroup_ca_cs s_valid)
            pp = cs_plan_pad(x.shape)
            if pp is not None:
                kp, gp, s_pad = pp
                plan = (kp, gp)
                s_valid = x.shape[1] * x.shape[2] * kp
        from srtpu.ops.cs_conv import log_path
        log_path('CSRCANTrunk', x.shape,
                 'xla' if plan is None else
                 ('cs-padded' if s_pad else 'cs'))
        if plan is None:
            res = xd
            for grp in groups:
                res = grp.xla_apply(res)
            wth = w_hwio_from_cs(wt[None], n, n)[0]
            return conv3x3_reference(res, wth.astype(dtype), bt) + xd

        k, _ = plan
        h_img, w_img = x.shape[1], x.shape[2]
        xc = nhwc_to_cs(xd, k, s_pad)
        res = xc
        for grp in groups:
            res = grp.cs_apply(res, h_img, w_img, k, s_valid)
        res = conv3x3_cs_pre(res, wt, bt, w_img, k, s_valid) + xc
        return cs_to_nhwc(res, k, h_img, w_img)
