"""DDBPN — dense deep back-projection network.

Capability parity with reference models/ddbpn.py:10-137: scale-matched
projection convs (kernel/stride/pad = 6/2/2, 8/4/2, 12/8/2 for x2/x4/x8),
dense up/down projection units with PReLU and optional 1x1 bottlenecks,
depth-6 alternation with dense concatenation, mean shift in/out.

``use_pallas='cs'`` runs the back-projection body on the CS kernel path
(srtpu.ops.ddbpn_cs): every stride-r projection conv / transposed conv
lowers to a 3x3 COARSE conv over phase-major channels, so ALL compute
stays at LR spatial resolution with full MXU lanes — HR activations are
never materialized in fine layout (the dense h-concat stays a list of
phase-major blocks; 1x1 bottlenecks become per-block matmuls). Different
parameter tree (pre-arranged CS weights with structural-zero masks).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv2d, ConvTranspose2d, PReLU, mean_shift, \
    torch_uniform_init

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


def _prelu_ch(y, alpha, tile: int = 1):
    """Per-channel PReLU on a channel-sublane tensor (G, C, S) — alpha
    tiled for phase-major blocks ((a*r+b)*C + c broadcasts alpha[c])."""
    a = (jnp.tile(alpha, tile) if tile > 1 else alpha).astype(y.dtype)
    return jnp.where(y >= 0, y, a[None, :, None] * y)


def _prelu_nhwc(y, alpha):
    return jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)


class CSDenseProjection(nn.Module):
    """DenseProjection on the CS path (same math, pre-arranged weights).

    ``up=True`` consumes LR channel-sublane blocks and returns an HR
    phase-major block; ``up=False`` the reverse. The three projection
    convs are conv3x3_cs_pre calls on coarse-arranged weights with
    structural-zero masks (srtpu.ops.ddbpn_cs); the optional 1x1
    bottleneck is a per-block matmul (phase-major group view at HR —
    no concat materialization). ``ctx=(k, w_img)`` selects the kernel
    path; ``ctx=None`` runs the identical math via XLA coarse convs on
    NHWC tensors (eval shapes / CPU).

    Reference parity: models/ddbpn.py:27-64.
    """

    nr: int
    scale: int
    up: bool
    n_blocks: int
    bottleneck: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, ctx):
        from srtpu.ops.cs_conv import conv3x3_cs_pre, conv3x3_reference, \
            w_hwio_from_cs
        from srtpu.ops.ddbpn_cs import (down_mask_cs, nhwc_to_pm,
                                        pm_to_nhwc_fine, up_mask_cs)
        r, nr = self.scale, self.nr
        r2 = r * r
        k_fine = _PROJ_PARAMS[r][0]
        bound = 1.0 / math.sqrt(nr * k_fine * k_fine)
        alpha_init = lambda key, shape: jnp.full(shape, 0.25, jnp.float32)

        if self.bottleneck:
            c_tot = self.n_blocks * nr
            wb = self.param('bneck_kernel',
                            torch_uniform_init(1.0 / math.sqrt(c_tot)),
                            (c_tot, nr))
            bb = self.param('bneck_bias',
                            torch_uniform_init(1.0 / math.sqrt(c_tot)),
                            (nr,))
            alb = self.param('bneck_alpha', alpha_init, (nr,))

        m_up = up_mask_cs(r, nr, nr)
        m_dn = down_mask_cs(r, nr, nr)
        if self.up:   # a0: up(x), b0: down(a0), a1: up(e)
            sh_a = sh_c = (3 * r2 * nr, 3 * nr)
            sh_b = (3 * nr, 3 * r2 * nr)
            m_a = m_c = m_up
            m_b = m_dn
        else:         # a0: down(x), b0: up(a0), a1: down(e)
            sh_a = sh_c = (3 * nr, 3 * r2 * nr)
            sh_b = (3 * r2 * nr, 3 * nr)
            m_a = m_c = m_dn
            m_b = m_up
        w_a = self.param('a0_kernel', torch_uniform_init(bound), sh_a)
        b_a = self.param('a0_bias', torch_uniform_init(bound), (nr,))
        al_a = self.param('a0_alpha', alpha_init, (nr,))
        w_b = self.param('b0_kernel', torch_uniform_init(bound), sh_b)
        b_b = self.param('b0_bias', torch_uniform_init(bound), (nr,))
        al_b = self.param('b0_alpha', alpha_init, (nr,))
        w_c = self.param('a1_kernel', torch_uniform_init(bound), sh_c)
        b_c = self.param('a1_bias', torch_uniform_init(bound), (nr,))
        al_c = self.param('a1_alpha', alpha_init, (nr,))

        # PReLU tiles: phase-major outputs broadcast alpha over phases
        t_a = r2 if self.up else 1
        t_b = 1 if self.up else r2
        ba_full = jnp.tile(b_a, r2) if self.up else b_a
        bb_full = b_b if self.up else jnp.tile(b_b, r2)
        bc_full = jnp.tile(b_c, r2) if self.up else b_c

        if ctx is not None:
            k, w_img = ctx
            # ---- kernel path: everything at coarse resolution ----
            if self.bottleneck:
                # 1x1 over the (never-materialized) dense concat: one
                # matmul per input block. Up consumes LR CS blocks; down
                # consumes HR phase-major blocks via the (G, r2, C, S)
                # group view — same fine-channel math, zero layout copies.
                acc = 0.0
                for t, xt in enumerate(xs):
                    g_, ct, s_ = xt.shape
                    wt = wb[t * nr:(t + 1) * nr].astype(xt.dtype)
                    if ct == nr:          # LR CS block
                        acc = acc + jnp.einsum('co,gcs->gos', wt, xt)
                    else:                 # HR phase-major block
                        xv = xt.reshape(g_, r2, nr, s_)
                        acc = acc + jnp.einsum(
                            'co,gpcs->gpos', wt, xv).reshape(g_, -1, s_)
                tile = 1 if acc.shape[1] == nr else r2
                bfull = bb if tile == 1 else jnp.tile(bb, r2)
                x = _prelu_ch(acc + bfull.astype(acc.dtype)[None, :, None],
                              alb, tile)
            else:
                x = xs[0]
            # NOTE a whole-unit fused kernel (three convs + PReLUs +
            # residual arithmetic in one Mosaic body) was built and is
            # exact, but REGRESSED 9.60 -> 10.32 ms/step with 2x the
            # compile time — the huge per-group body defeats grid
            # pipelining (same mechanism as the S=8192 trunk negative,
            # PERF.md). Separate conv kernels + XLA elementwise win.
            a0 = _prelu_ch(conv3x3_cs_pre(
                x, w_a * m_a, ba_full, w_img, k), al_a, t_a)
            b0 = _prelu_ch(conv3x3_cs_pre(
                a0, w_b * m_b, bb_full, w_img, k), al_b, t_b)
            e = b0 - x
            a1 = _prelu_ch(conv3x3_cs_pre(
                e, w_c * m_c, bc_full, w_img, k), al_c, t_a)
            return a0 + a1

        # ---- fallback: identical math, XLA coarse convs on NHWC ----
        x = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
        if self.bottleneck:
            x = _prelu_nhwc(
                jnp.einsum('bhwc,co->bhwo', x, wb.astype(x.dtype))
                + bb.astype(x.dtype), alb)

        def conv_up(y, w_csd, b, al):
            wh = w_hwio_from_cs((w_csd * m_up)[None], nr, r2 * nr)[0]
            out = conv3x3_reference(y, wh.astype(y.dtype), jnp.tile(b, r2))
            return _prelu_nhwc(pm_to_nhwc_fine(out, r), al)

        def conv_dn(y, w_csd, b, al):
            wh = w_hwio_from_cs((w_csd * m_dn)[None], r2 * nr, nr)[0]
            out = conv3x3_reference(nhwc_to_pm(y, r), wh.astype(y.dtype), b)
            return _prelu_nhwc(out, al)

        ca, cb = (conv_up, conv_dn) if self.up else (conv_dn, conv_up)
        a0 = ca(x, w_a, b_a, al_a)
        b0 = cb(a0, w_b, b_b, al_b)
        e = b0 - x
        a1 = ca(e, w_c, b_c, al_c)
        return a0 + a1


class DDBPN(nn.Module):
    scale_factor: int = 4
    channels: int = 3
    n0: int = 128
    nr: int = 32
    depth: int = 6
    # 'cs' (default): phase-major back-projections — measured 3.1x vs
    # XLA on TPU (PERF.md); non-{2,4} scales / off-plan shapes / non-TPU
    # backends fall back to the identical-math XLA coarse-conv branch
    # inside _cs_forward.
    use_pallas: Any = 'cs'
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_pallas == 'cs':
            return self._cs_forward(x)
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

    def _cs_forward(self, x):
        """CS-path body: LR blocks channel-sublane, HR blocks phase-major.

        Same math as the XLA branch above (reference models/ddbpn.py:100-137);
        the parameter tree differs (CSDenseProjection pre-arranged weights).
        """
        from srtpu.ops.cs_conv import (conv3x3_cs_pre, conv3x3_reference,
                                       cs_plan, nhwc_to_cs,
                                       w_hwio_from_cs)
        from srtpu.ops.cs_conv import pm_to_nhwc as cs_pm_to_nhwc
        from srtpu.ops.ddbpn_cs import final_mask_cs, nhwc_to_pm, \
            pm_to_nhwc_fine
        r, nr, ch = self.scale_factor, self.nr, self.channels
        r2 = r * r
        nt = self.depth  # number of h blocks feeding the output conv
        co = -(-r2 * ch // 16) * 16
        bound_f = 1.0 / math.sqrt(9 * nt * nr)
        ws_f = self.param('out_kernel', torch_uniform_init(bound_f),
                          (nt, 3 * co, 3 * r2 * nr))
        bs_f = self.param('out_bias', torch_uniform_init(bound_f), (ch,))
        m_f = final_mask_cs(r, nr, ch)

        if ch == 3:
            x = mean_shift(x, sign=-1)
        x = _prelu_nhwc(Conv2d(self.n0, 3, dtype=self.dtype)(x),
                        self.param('head_alpha0',
                                   lambda k_, s_: jnp.full(s_, 0.25,
                                                           jnp.float32),
                                   (self.n0,)))
        x = _prelu_nhwc(Conv2d(self.nr, 1, dtype=self.dtype)(x),
                        self.param('head_alpha1',
                                   lambda k_, s_: jnp.full(s_, 0.25,
                                                           jnp.float32),
                                   (self.nr,)))

        b, h, w, _ = x.shape
        # x8's 64*nr-wide phase-major stacks outgrow the kernels' VMEM
        # budget — kernel path covers x2/x4, x8 takes the XLA formulation
        plan = cs_plan(x.shape) if r in (2, 4) else None
        from srtpu.ops.cs_conv import log_path
        log_path('CSDDBPN', x.shape, 'xla' if plan is None else 'cs')
        ctx = None
        if plan is not None:
            k = plan[0]
            ctx = (k, w)
            x = nhwc_to_cs(x, k)

        h_list, l_list = [], []
        for i in range(self.depth - 1):
            ls = l_list if i else [x]
            h_list.append(CSDenseProjection(
                self.nr, r, up=True, n_blocks=len(ls), bottleneck=i > 1,
                dtype=self.dtype)(ls, ctx))
            l_list.append(CSDenseProjection(
                self.nr, r, up=False, n_blocks=len(h_list),
                bottleneck=i != 0, dtype=self.dtype)(h_list, ctx))
        h_list.append(CSDenseProjection(
            self.nr, r, up=True, n_blocks=len(l_list), bottleneck=True,
            dtype=self.dtype)(l_list, ctx))

        # output conv: fine 3x3 over the dense h-concat == sum of
        # per-block phase-dense coarse convs (linearity keeps every
        # X3 stack at one block's width)
        bpd = jnp.concatenate([jnp.tile(bs_f, r2),
                               jnp.zeros(co - r2 * ch, bs_f.dtype)])
        if ctx is not None:
            acc = 0.0
            for t, ht in enumerate(h_list):
                acc = acc + conv3x3_cs_pre(
                    ht, ws_f[t] * m_f,
                    bpd if t == 0 else jnp.zeros_like(bpd), w, k)
            out = cs_pm_to_nhwc(acc, r, ch, k, h, w)
        else:
            acc = 0.0
            for t, ht in enumerate(h_list):
                wh = w_hwio_from_cs((ws_f[t] * m_f)[None], r2 * nr, co)[0]
                acc = acc + conv3x3_reference(
                    nhwc_to_pm(ht, r), wh.astype(ht.dtype),
                    bpd if t == 0 else jnp.zeros_like(bpd))
            out = pm_to_nhwc_fine(acc[..., :r2 * ch], r)
        if ch == 3:
            out = mean_shift(out, sign=1)
        return out
