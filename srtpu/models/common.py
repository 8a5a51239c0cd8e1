"""Shared building blocks for the SR model zoo (TPU-native, NHWC).

Capability parity with the reference's shared blocks
(/root/reference/models/common.py:7-139): 'same'-padded conv, conv+norm+act
basic block, frozen DIV2K mean shift, residual block with res_scale, and a
sub-pixel (pixel-shuffle) upscale block for scale factors {2,3,4,8}.

Design notes (TPU-first, not a translation):
* NHWC layout everywhere — XLA:TPU's native conv layout; channels ride the
  lane dimension (128) of the VPU/MXU.
* Parameters are stored in float32 and cast to a compute ``dtype``
  (bfloat16 by default on TPU) at call time; XLA fuses the casts into the
  convolutions.
* Initialization matches torch's Conv2d default (kaiming-uniform with
  a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and
  bias) so training dynamics are comparable with the reference recipes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# DIV2K training-set RGB statistics (reference models/common.py:61-63).
DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)

Dtype = Any


def _pair(v) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def torch_uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2d(nn.Module):
    """'same'-padded 2D convolution (NHWC) with torch-default init.

    Mirrors the capability of DefaultConv2d (reference models/common.py:7-30):
    padding='same' keeps H/W, 'valid' means none, and an explicit int pads
    both sides. Also supports strides for discriminator/projection convs.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int | tuple[int, int] = 1
    padding: str | int | tuple[int, int] = 'same'
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        strides = _pair(self.strides)
        in_features = x.shape[-1]
        fan_in = k[0] * k[1] * in_features // self.feature_group_count
        bound = 1.0 / math.sqrt(fan_in)

        kernel = self.param(
            'kernel', torch_uniform_init(bound),
            (*k, in_features // self.feature_group_count, self.features))

        if isinstance(self.padding, str):
            pad = self.padding.upper()
            assert pad in ('SAME', 'VALID')
            padding = pad
        else:
            p = _pair(self.padding)
            padding = ((p[0], p[0]), (p[1], p[1]))

        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=strides, padding=padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        if self.use_bias:
            bias = self.param('bias', torch_uniform_init(bound),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed conv matching torch ConvTranspose2d geometry.

    out = (in - 1) * stride - 2 * padding + kernel.  Implemented as an
    input-dilated convolution with a flipped kernel — the form XLA:TPU
    lowers efficiently (used by DDBPN's up-projections,
    reference models/ddbpn.py:10-24).
    """

    features: int
    kernel_size: int | tuple[int, int]
    strides: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        s = _pair(self.strides)
        p = _pair(self.padding)
        in_features = x.shape[-1]
        # torch ConvTranspose2d init: fan_in computed from the torch weight
        # layout (in, out, kh, kw) -> fan_in = out * kh * kw... torch actually
        # uses weight.size(1) * kh * kw = out_channels * k * k.
        fan_in = self.features * k[0] * k[1]
        bound = 1.0 / math.sqrt(fan_in)

        kernel = self.param('kernel', torch_uniform_init(bound),
                            (*k, self.features, in_features))  # HWOI layout

        dtype = self.dtype or x.dtype
        pad = ((k[0] - 1 - p[0], k[0] - 1 - p[0]),
               (k[1] - 1 - p[1], k[1] - 1 - p[1]))
        y = lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(dtype),
            window_strides=(1, 1), padding=pad,
            lhs_dilation=s,
            dimension_numbers=('NHWC', 'HWOI', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', torch_uniform_init(bound),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class WNConv2d(nn.Module):
    """Weight-normalized conv (w = g * v / ||v||), used by WDSR.

    Parity: reference models/wdsr.py:62 wraps every conv in
    nn.utils.weight_norm; init g = ||v|| so the initial forward equals the
    plain conv.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    padding: str | int = 'same'
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        in_features = x.shape[-1]
        fan_in = k[0] * k[1] * in_features
        bound = 1.0 / math.sqrt(fan_in)

        v = self.param('v', torch_uniform_init(bound),
                       (*k, in_features, self.features))
        g = self.param(
            'g', lambda key, shape: jnp.linalg.norm(
                jax.lax.stop_gradient(v).reshape(-1, self.features), axis=0),
            (self.features,))

        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)) + 1e-12)
        kernel = v * (g / norm)

        if isinstance(self.padding, str):
            padding = self.padding.upper()
        else:
            p = _pair(self.padding)
            padding = ((p[0], p[0]), (p[1], p[1]))

        dtype = self.dtype or x.dtype
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1), padding=padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', torch_uniform_init(bound),
                              (self.features,))
            y = y + bias.astype(dtype)
        return y


class PReLU(nn.Module):
    """Parametric ReLU with 1 or per-channel parameters (torch semantics)."""

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            'alpha',
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_parameters,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def mean_shift(x: jax.Array, sign: int, rgb_range: float = 1.0,
               rgb_mean: Sequence[float] = DIV2K_RGB_MEAN,
               rgb_std: Sequence[float] = (1.0, 1.0, 1.0)) -> jax.Array:
    """Frozen DIV2K mean shift (reference models/common.py:58-71).

    sign=-1 subtracts the dataset mean, sign=+1 adds it back. Pure function
    (no parameters) — XLA fuses it into the adjacent conv.
    """
    mean = jnp.asarray(rgb_mean, dtype=x.dtype)
    std = jnp.asarray(rgb_std, dtype=x.dtype)
    return x / std + sign * rgb_range * mean / std


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Sub-pixel convolution rearrangement (torch PixelShuffle semantics).

    NHWC input (..., H, W, C*r*r) -> (..., H*r, W*r, C) with the channel
    index decomposed as c*r*r + i*r + j (c major), matching torch so that
    converted checkpoints produce identical images.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Inverse of :func:`pixel_shuffle` (space_to_depth, c-major)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


class BasicBlock(nn.Module):
    """Conv followed by optional norm and activation.

    Parity: reference models/common.py:33-55.  ``norm`` is 'batch' or None;
    ``act`` is a callable (e.g. nn.relu) or a Module factory (e.g. PReLU).
    """

    features: int = 64
    kernel_size: int = 3
    use_bias: bool = True
    norm: str | None = None
    act: Any = nn.relu
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv2d(self.features, self.kernel_size, dtype=self.dtype)(x)
        if self.norm == 'batch':
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        if self.act is not None:
            act = self.act
            if isinstance(act, type) and issubclass(act, nn.Module):
                act = act()
            x = act(x)
        return x


class ResBlock(nn.Module):
    """Residual block: [conv (+norm) (+act)] x n, last conv without act,
    output scaled by res_scale and added to the input.

    Parity: reference models/common.py:74-109.
    """

    n_feats: int = 64
    kernel_size: int = 3
    n_conv_layers: int = 2
    use_bias: bool = True
    norm: str | None = None
    act: Any = nn.relu
    res_scale: float = 1.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        res = x
        for i in range(self.n_conv_layers):
            res = Conv2d(self.n_feats, self.kernel_size,
                         use_bias=self.use_bias, dtype=self.dtype)(res)
            if self.norm == 'batch':
                res = nn.BatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   dtype=self.dtype)(res)
            if self.act is not None and i < self.n_conv_layers - 1:
                act = self.act
                if isinstance(act, type) and issubclass(act, nn.Module):
                    act = act()
                res = act(res)
        return res * self.res_scale + x


class FusedResBlock(nn.Module):
    """EDSR-style resblock backed by the fused Pallas kernel
    (srtpu.ops.resblock): conv3x3 + ReLU + conv3x3 + res_scale + skip in a
    single VMEM residency. Falls back to the XLA reference for shapes that
    don't fit VMEM (large eval images). Same math as ResBlock with
    n_conv_layers=2, norm=None, act=relu.
    """

    n_feats: int = 64
    res_scale: float = 1.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from srtpu.ops import resblock_fits, resblock_reference
        from srtpu.ops.resblock import resblock_fused_v2
        n = self.n_feats
        bound = 1.0 / math.sqrt(9 * n)
        w1 = self.param('kernel1', torch_uniform_init(bound), (3, 3, n, n))
        b1 = self.param('bias1', torch_uniform_init(bound), (n,))
        w2 = self.param('kernel2', torch_uniform_init(bound), (3, 3, n, n))
        b2 = self.param('bias2', torch_uniform_init(bound), (n,))
        dtype = self.dtype or x.dtype
        args = (x.astype(dtype), w1.astype(dtype), b1.astype(jnp.float32),
                w2.astype(dtype), b2.astype(jnp.float32))
        if resblock_fits(x.shape, dtype):
            # v2: fused forward + saved-h1 backward (no remat; PERF.md)
            return resblock_fused_v2(*args, self.res_scale)
        return resblock_reference(*args, res_scale=self.res_scale)


# trunk_bwd_mega keeps two (L, 3C, 3C) f32 dW accumulators VMEM-resident;
# past this budget CSTrunk routes to the per-block trunk_cs instead
# (srtpu/ops/cs_conv.py _mega_cp is 40 MB total incl. streamed blocks)
_MEGA_ACC_BUDGET = 24 * 1024 * 1024


class CSTrunk(nn.Module):
    """EDSR trunk (resblocks + close conv + global skip) in CS layout.

    Runs the whole 64-channel hot loop in the transposed channel-sublane
    layout (srtpu.ops.cs_conv): one NHWC->CS conversion on entry, fused
    Pallas resblocks with Pallas backwards, one conversion back on exit.
    Measured 66% vs 36% MFU against XLA convs at EDSR-baseline shapes
    (PERF.md round 2). Falls back to XLA convs (same params) for shapes
    the packing doesn't support (large eval images).

    Same math as [ResBlock x n + Conv2d + skip] — reference
    models/edsr.py:26-33.
    """

    n_feats: int = 64
    n_resblocks: int = 16
    res_scale: float = 1.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 emit_cs: bool = False):
        """emit_cs=True returns ``(y, k)`` where y is still CS-packed
        (k = lane packing) when the CS path ran, or ``(y_nhwc, None)`` on
        the XLA fallback — CSUpscaleTail consumes the packed form
        directly, skipping the CS->NHWC->CS round trip at the seam."""
        from srtpu.ops.cs_conv import (conv3x3_cs, conv3x3_reference,
                                       cs_plan, cs_plan_pad, cs_to_nhwc,
                                       nhwc_to_cs, trunk_cs_mega)
        from srtpu.ops.resblock import resblock_reference
        n, nb = self.n_feats, self.n_resblocks
        bound = 1.0 / math.sqrt(9 * n)
        # block weights are stored stacked AND pre-arranged in CS layout
        # (L,3C,3C): the forward then needs zero per-step transforms
        # (HWIO-stored variants cost 0.5-0.8 ms/step in transposes;
        # PERF.md round 2). Elementwise-identical init distribution.
        w1 = self.param('w1', torch_uniform_init(bound), (nb, 3 * n, 3 * n))
        b1 = self.param('b1', torch_uniform_init(bound), (nb, n))
        w2 = self.param('w2', torch_uniform_init(bound), (nb, 3 * n, 3 * n))
        b2 = self.param('b2', torch_uniform_init(bound), (nb, n))
        wc = self.param('close_kernel', torch_uniform_init(bound),
                        (3, 3, n, n))
        bc = self.param('close_bias', torch_uniform_init(bound), (n,))

        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        # the CS layout wins only while C under-fills the 128 MXU lanes
        # (WDSR-B at 128f is a measured negative, EDSR-large at 256f runs
        # 78% MFU on plain XLA — PERF.md); cs_plan itself has no upper
        # channel bound, so gate here
        plan = cs_plan(x.shape) if n <= 96 else None
        s_pad = s_valid = None
        if plan is None and n <= 96:
            # lane-unaligned S (e.g. scale-3 42x42 LR): pack with a
            # zero-padded dead-lane tail instead of falling back to XLA —
            # ~5% dead compute vs the full CS win (cs_plan_pad)
            pp = cs_plan_pad(x.shape)
            if pp is not None:
                kp, gp, s_pad = pp
                plan = (kp, gp)
                s_valid = x.shape[1] * x.shape[2] * kp
        from srtpu.ops.cs_conv import log_path
        log_path('CSTrunk', x.shape,
                 'xla' if plan is None else
                 ('cs-padded' if s_pad else 'cs'))
        if plan is None:
            from srtpu.ops.cs_conv import w_hwio_from_cs
            w1h = w_hwio_from_cs(w1, n, n)
            w2h = w_hwio_from_cs(w2, n, n)
            res = xd
            for i in range(nb):
                res = resblock_reference(
                    res, w1h[i].astype(dtype), b1[i].astype(jnp.float32),
                    w2h[i].astype(dtype), b2[i].astype(jnp.float32),
                    res_scale=self.res_scale)
            res = conv3x3_reference(res, wc.astype(dtype), bc)
            return (res + xd, None) if emit_cs else res + xd

        k, _ = plan
        w_img = x.shape[2]
        xc = nhwc_to_cs(xd, k, s_pad)
        # one pallas_call per direction for the whole chain (the running
        # activation stays VMEM-resident across all blocks; PERF.md r3).
        # The mega backward keeps BOTH (L, 3C, 3C) f32 dW accumulators
        # VMEM-resident for the whole grid — beyond ~24 MB of accumulators
        # that blows the 40 MB scoped budget (srtpu/ops/cs_conv.py
        # _mega_cp) at Mosaic compile, so long/wide trunks take the
        # per-block path (same stacked params, same math, block-sized
        # working sets) instead.
        mega_acc_bytes = 2 * nb * (3 * n) ** 2 * 4
        if mega_acc_bytes <= _MEGA_ACC_BUDGET:
            res = trunk_cs_mega(xc, w1, b1, w2, b2, self.res_scale,
                                w_img, k, s_valid)
        else:
            from srtpu.ops.cs_conv import trunk_cs
            res = trunk_cs(xc, w1, b1, w2, b2, self.res_scale, w_img, k,
                           s_valid)
        res = conv3x3_cs(res, wc, bc, w_img, k, s_valid) + xc
        if emit_cs:
            # NOTE (padded path): when s_pad is set the emitted CS buffer
            # carries a dead-lane tail. CSUpscaleTail re-derives the SAME
            # cs_plan_pad and consumes it directly for single-stage
            # scales (x2/x3) with a <=3-tap phase-dense final conv — the
            # canonical scale-3 recipe rides the kernels end-to-end
            # (round 4). Multi-stage tails (x4/x8) and wide final convs
            # (SRResNet's 9x9) still route the padded buffer through
            # cs_to_nhwc (which drops the pad tail) to the XLA tail.
            return res, k
        return cs_to_nhwc(res, k, x.shape[1], w_img)


class CSUpscaleTail(nn.Module):
    """Sub-pixel upscaler + final conv on the CS kernel path.

    Each upscale stage is ONE fused Pallas kernel (conv C -> r^2*C with
    phase-major outputs + the pixel shuffle as per-row selection matmuls)
    — the NHWC shuffle's reshape/transpose layout copies (~0.7 ms/step at
    EDSR-baseline, PERF.md round 2) never happen. The final conv also
    runs in CS; only the (B, H, W, ch) result converts back.

    Serves two reference tails:
    - EDSR (act=None, final_ksize=3): UpscaleBlock + Conv2d, reference
      models/common.py:112-139 + models/edsr.py:34-36.
    - SRResNet (act=PReLU, final_ksize=9): PReLU after each shuffle and a
      9x9 HR output conv, reference models/srresnet.py:28-32. The 9x9
      fine conv over the r=2 phase-major last stage lowers to a 5x5
      phase-dense COARSE conv (w_phase_dense) — it runs at LR spatial
      resolution with full lanes instead of HR resolution with c_out=3.

    torch PixelShuffle channel order is absorbed into the stored weight
    arrangement; PReLU (scalar alpha, torch nn.PReLU() semantics) is
    elementwise, hence exact in any layout.
    """

    scale_factor: int = 4
    n_feats: int = 64
    channels: int = 3
    act: Any = None             # PReLU class or None; applied per stage
    final_ksize: int = 3
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, cs=None) -> jax.Array:
        """x: NHWC features — or, with ``cs=(k, h, w)``, the CS-packed
        (G, C, S) trunk output (CSTrunk/CSBNTrunk ``emit_cs``): the seam
        then skips a CS->NHWC->CS round trip."""
        from srtpu.ops.cs_conv import (conv3x3_cs, conv3x3_cs_pre, cs_plan,
                                       cs_plan_pad, cs_regroup, cs_to_nhwc,
                                       nhwc_to_cs, phase_dense_ck,
                                       pm_to_nhwc, upsample_cs,
                                       w_hwio_from_cs, w_phase_dense,
                                       w_pm_cs)
        n, fk = self.n_feats, self.final_ksize
        assert self.scale_factor in (2, 3, 4, 8)
        rs = [3] if self.scale_factor == 3 else \
            [2] * int(math.log2(self.scale_factor))
        bound = 1.0 / math.sqrt(9 * n)
        ws, bs, alphas = [], [], []
        for i, r in enumerate(rs):
            ws.append(self.param(f'up{i}_kernel', torch_uniform_init(bound),
                                 (r * r, 3 * n, 3 * n)))
            bs.append(self.param(f'up{i}_bias', torch_uniform_init(bound),
                                 (r * r, n)))
            if self.act is not None:
                alphas.append(self.param(
                    f'up{i}_alpha',
                    lambda key, shape: jnp.full(shape, 0.25, jnp.float32),
                    (1,)))
        bound_f = 1.0 / math.sqrt(fk * fk * n)
        wf = self.param('final_kernel', torch_uniform_init(bound_f),
                        (fk * self.channels, fk * n))
        bf = self.param('final_bias', torch_uniform_init(bound_f),
                        (self.channels,))

        dtype = self.dtype or x.dtype
        if cs is not None:
            k_in, h, w = cs
            b = x.shape[0] * k_in
        else:
            b, h, w, _ = x.shape

        def _act(y, i):
            if self.act is None:
                return y
            a = alphas[i].astype(y.dtype)
            return jnp.where(y >= 0, y, a * y)

        # lane-bound gate as in CSTrunk: beyond ~96 channels XLA's convs
        # fill the MXU and the wide pm stage (r^2*C) stops fitting VMEM
        plan = cs_plan((b, h, w, n)) if n <= 96 else None
        s_pad = s_valid = None
        # the phase-dense final conv's COARSE tap span (w_phase_dense ck):
        # the dead-lane padded path requires ck == 3 exactly — cs_plan_pad's
        # one-dead-row guarantee covers only dy = +/-1 taps, and the
        # kernels reject s_valid with any other kk (a fk=1 tail computes
        # ck=1 and must fall back to XLA, not crash at trace time)
        ck = phase_dense_ck(fk, rs[-1])
        if plan is None and n <= 96 and len(rs) == 1 and ck == 3:
            # single-stage tail (x2/x3) on a lane-unaligned S (the
            # canonical scale-3 42x42 LR): dead-lane padded packing —
            # the same cs_plan_pad the trunk uses, so the padded seam
            # (CSTrunk emit_cs) lines up. No interleave stage runs, and
            # both convs (pm 3x3 + phase-dense ck<=3) honor s_valid.
            pp = cs_plan_pad((b, h, w, n))
            if pp is not None:
                plan = (pp[0], pp[1])
                s_pad = pp[2]
                s_valid = h * w * pp[0]
        # every stage input must fit the kernels (S <= 4096; final conv
        # reads S_f <= 16384)
        ok = plan is not None
        if ok:
            k, hh, ww = plan[0], h, w
            for r in rs[:-1]:
                # interleave pieces must be lane-tile aligned: r*wk % 128
                # (Mosaic rejects offset-mismatched sub-tile concats)
                if hh * ww * k > 4096 or (r * ww * k) % 128:
                    ok = False
                    break
                hh, ww = hh * r, ww * r
                k = (cs_plan((b, hh, ww, n)) or (0,))[0]
                if not k:
                    ok = False
                    break
            # the last stage stays PHASE-MAJOR at coarse resolution
            # (S unchanged); its wide channel count r^2*C must be
            # 64-divisible for the kernels' chunked paths
            pm_c = rs[-1] ** 2 * n
            ok = ok and (s_pad or hh * ww * k) <= 4096 \
                and (pm_c <= 128 or pm_c % 64 == 0) \
                and (cs is None or plan[0] == cs[0]) \
                and (cs is None or s_pad is None or x.shape[-1] == s_pad)

        from srtpu.ops.cs_conv import log_path
        log_path('CSUpscaleTail', (b, h, w, n),
                 ('cs-padded' if s_pad else 'cs') if ok else 'xla')
        if not ok:
            y = (x if cs is None else cs_to_nhwc(x, cs[0], h, w)) \
                .astype(dtype)
            for i, r in enumerate(rs):
                y = _act(_xla_upstage(y, ws[i], bs[i], n, r, dtype), i)
            wfh = w_hwio_from_cs(wf[None], n, self.channels, fk)[0]
            from srtpu.ops.cs_conv import conv3x3_reference
            return conv3x3_reference(y, wfh.astype(dtype), bf)

        k = plan[0]
        hh, ww = h, w
        y = x.astype(dtype) if cs is not None \
            else nhwc_to_cs(x.astype(dtype), k, s_pad)
        for i, r in enumerate(rs[:-1]):
            # NOTE regrouping BEFORE the stage (r^2 x less copy traffic)
            # was tried and fails to lower: at k=1 the interleave's
            # 32-lane slices hit Mosaic's "offset mismatch on non-concat
            # dimension" — the stage must run with wk a multiple of 128
            y = upsample_cs(y, ws[i], bs[i], ww, k, hh, r)
            hh, ww = hh * r, ww * r
            k_new = cs_plan((b, hh, ww, n))[0]
            y = cs_regroup(y, k, k_new, hh, ww)
            k = k_new
            y = _act(y, i)
        # last stage: plain wide conv with phase-major outputs — the lane
        # interleave (and its backward de-interleave) never happens.
        # PReLU with a scalar alpha is exact on the phase-major channels.
        r = rs[-1]
        y = conv3x3_cs_pre(y, w_pm_cs(ws[-1], n, r), bs[-1].reshape(-1),
                           ww, k, s_valid)
        y = _act(y, len(rs) - 1)
        # final conv as a phase-dense COARSE conv: the fine fk x fk conv
        # becomes a ck x ck coarse conv over r^2*C phase-major channels
        # (pixel shuffle absorbed into the weight scatter; c_out padded
        # to 16)
        wfh = w_hwio_from_cs(wf[None], n, self.channels, fk)[0]
        wpd = w_phase_dense(wfh, r)
        co = wpd.shape[3]
        bpd = jnp.concatenate(
            [jnp.tile(bf, r * r),
             jnp.zeros(co - r * r * self.channels, bf.dtype)])
        y = conv3x3_cs(y, wpd, bpd, ww, k, s_valid)
        return pm_to_nhwc(y, r, self.channels, k, hh, ww)


def _xla_upstage(y, w_arr, b_arr, n, r, dtype):
    """Fallback: one upscale stage via XLA conv + pixel_shuffle using the
    CS-stored params (un-arranged on the fly)."""
    from srtpu.ops.cs_conv import w_ps_hwio
    dn = ('NHWC', 'HWIO', 'NHWC')
    wh = w_ps_hwio(w_arr, n, r).astype(dtype)
    # phase-major bias (r*r, C) -> torch ps channel order c'*r^2 + a*r + b
    bh = jnp.transpose(b_arr, (1, 0)).reshape(-1)
    out = jax.lax.conv_general_dilated(
        y.astype(dtype), wh, (1, 1), 'SAME', dimension_numbers=dn)
    return pixel_shuffle((out.astype(jnp.float32) + bh).astype(dtype), r)


class UpscaleBlock(nn.Module):
    """Sub-pixel upscaling for scale factors {2, 3, 4, 8}.

    Parity: reference models/common.py:112-139 — log2(scale) rounds of
    conv(n_feats -> n_feats*r^2) + pixel shuffle (r=3 for scale 3).
    """

    scale_factor: int = 4
    n_feats: int = 64
    kernel_size: int = 3
    act: Any = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.scale_factor in (2, 3, 4, 8), \
            f'scale_factor must be in {{2,3,4,8}}, got {self.scale_factor}'
        for _ in range(int(math.log2(self.scale_factor))):
            r = 2 if self.scale_factor % 2 == 0 else 3
            x = Conv2d(self.n_feats * r * r, self.kernel_size,
                       dtype=self.dtype)(x)
            x = pixel_shuffle(x, r)
            if self.act is not None:
                act = self.act
                if isinstance(act, type) and issubclass(act, nn.Module):
                    act = act()
                x = act(x)
        return x


def _cubic_kernel(t, a: float):
    """Keys cubic convolution kernel with free parameter a."""
    import numpy as np
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(t <= 1, (a + 2) * t3 - (a + 3) * t2 + 1,
                 np.where(t < 2, a * t3 - 5 * a * t2 + 8 * a * t - 4 * a, 0.0))
    return w


def resize_matrix(in_size: int, out_size: int, a: float = -0.75,
                  antialias: bool = True):
    """Dense (out_size, in_size) bicubic interpolation matrix.

    Matches torch F.interpolate(mode='bicubic', align_corners=False) for
    a=-0.75 and PIL Image.BICUBIC for a=-0.5 (with antialias on downscale).
    Computed in numpy at trace time; applying it is a matmul per axis, which
    maps onto the MXU — the TPU-native form of the reference's pre-upsample
    in SRCNN (reference models/srcnn.py:25-27).
    """
    import numpy as np
    scale = out_size / in_size
    support_scale = max(1.0 / scale, 1.0) if antialias and scale < 1 else 1.0
    support = 2.0 * support_scale
    out_coords = (np.arange(out_size) + 0.5) / scale - 0.5
    left = np.floor(out_coords - support).astype(np.int64) + 1
    n_taps = int(np.ceil(support)) * 2 + 2
    idx = left[:, None] + np.arange(n_taps)[None, :]
    weights = _cubic_kernel((out_coords[:, None] - idx) / support_scale, a)
    if antialias:
        # PIL border convention: out-of-range taps are dropped and the
        # remaining weights renormalized.
        weights = np.where((idx >= 0) & (idx < in_size), weights, 0.0)
    weights = weights / np.maximum(weights.sum(axis=1, keepdims=True), 1e-12)
    # torch border convention (antialias=False): clamp == edge replication.
    idx = np.clip(idx, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(mat, (np.repeat(np.arange(out_size), n_taps), idx.ravel()),
              weights.ravel().astype(np.float32))
    return mat


def bicubic_resize(x: jax.Array, out_hw: tuple[int, int], a: float = -0.75,
                   antialias: bool = True) -> jax.Array:
    """Bicubic resize of NHWC images via two MXU matmuls (static shapes)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    mh = jnp.asarray(resize_matrix(h, oh, a, antialias), dtype=jnp.float32)
    mw = jnp.asarray(resize_matrix(w, ow, a, antialias), dtype=jnp.float32)
    y = jnp.einsum('oh,bhwc->bowc', mh, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum('pw,bhwc->bhpc', mw, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


class CSBNTrunk(nn.Module):
    """SRResNet trunk (BN resblocks + closing conv/BN + global skip) on the
    fused CS kernel path (srtpu.ops.bn_resblock_cs).

    The XLA path pays ~162 layout-copy ops per BN block (profiled, PERF.md
    round 3); here each block is six pallas_calls (3 fwd / 3 bwd) with the
    batch-stat reductions accumulated in-kernel across the sequential grid.
    Same math as [ResBlock(norm='batch', act=PReLU) x n + BasicBlock(
    norm='batch', act=None) + skip] — reference models/srresnet.py:9-36.

    Weights are stored stacked and CS-arranged (L, 3C, 3C) like CSTrunk;
    running stats live in the 'batch_stats' collection (flax BatchNorm
    semantics: momentum 0.9, eps 1e-5, biased batch variance). Training
    mode on unsupported shapes (or off-TPU) falls back to XLA convs with
    identical manual-BN math; eval mode always runs the XLA path with
    running stats (eval images don't fit the packing anyway).
    """

    n_feats: int = 64
    n_resblocks: int = 16
    # REFLECT conv boundaries instead of SAME zero-pad — the SRGAN
    # generator's ReflectionPad2d blocks (reference srgan.py:20-43); the
    # CS kernels compute the mirrored neighbor as the opposite-direction
    # roll (masked selects, no extra MXU work — srtpu.ops.cs_conv).
    reflect: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 emit_cs: bool = False):
        """emit_cs=True returns ``(y, k)`` with y CS-packed when the CS
        path ran (k = lane packing) or ``(y_nhwc, None)`` on the XLA
        fallback — see CSTrunk: the tail consumes the packed form and the
        seam's CS->NHWC->CS round trip disappears."""
        from srtpu.ops.bn_resblock_cs import (bn_close_cs, bn_close_ref,
                                              bn_resblock_cs,
                                              bn_resblock_ref)
        from srtpu.ops.cs_conv import (cs_plan, cs_plan_pad, cs_to_nhwc,
                                       nhwc_to_cs, w_hwio_from_cs)
        n, nb = self.n_feats, self.n_resblocks
        bound = 1.0 / math.sqrt(9 * n)
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        w1 = self.param('w1', torch_uniform_init(bound), (nb, 3 * n, 3 * n))
        b1 = self.param('b1', torch_uniform_init(bound), (nb, n))
        ga1 = self.param('bn1_scale', ones, (nb, n))
        be1 = self.param('bn1_bias', zeros, (nb, n))
        alpha = self.param(
            'alpha', lambda key, shape: jnp.full(shape, 0.25, jnp.float32),
            (nb, 1))
        w2 = self.param('w2', torch_uniform_init(bound), (nb, 3 * n, 3 * n))
        b2 = self.param('b2', torch_uniform_init(bound), (nb, n))
        ga2 = self.param('bn2_scale', ones, (nb, n))
        be2 = self.param('bn2_bias', zeros, (nb, n))
        wc = self.param('close_w', torch_uniform_init(bound),
                        (1, 3 * n, 3 * n))
        bc = self.param('close_b', torch_uniform_init(bound), (1, n))
        gac = self.param('close_bn_scale', ones, (1, n))
        bec = self.param('close_bn_bias', zeros, (1, n))

        rm1 = self.variable('batch_stats', 'mean1',
                            lambda: jnp.zeros((nb, n), jnp.float32))
        rv1 = self.variable('batch_stats', 'var1',
                            lambda: jnp.ones((nb, n), jnp.float32))
        rm2 = self.variable('batch_stats', 'mean2',
                            lambda: jnp.zeros((nb, n), jnp.float32))
        rv2 = self.variable('batch_stats', 'var2',
                            lambda: jnp.ones((nb, n), jnp.float32))
        rmc = self.variable('batch_stats', 'mean_close',
                            lambda: jnp.zeros((1, n), jnp.float32))
        rvc = self.variable('batch_stats', 'var_close',
                            lambda: jnp.ones((1, n), jnp.float32))

        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        # train-only + lane-bound gate (see CSTrunk on the channel cap)
        plan = cs_plan(x.shape) if train and n <= 96 else None
        s_pad = s_valid = None
        if plan is None and train and n <= 96 and not self.reflect:
            # lane-unaligned S (the scale-3 42x42 recipe): dead-lane
            # padded packing — batch stats reduce over s_valid real
            # lanes only (srtpu.ops.bn_resblock_cs). Reflect boundaries
            # (SRGAN) are excluded: the mirror rolls have no pad-boundary
            # logic, and SRGAN's 32x32 LR shapes are always aligned.
            pp = cs_plan_pad(x.shape)
            if pp is not None:
                kp, gp, s_pad = pp
                plan = (kp, gp)
                s_valid = x.shape[1] * x.shape[2] * kp
        from srtpu.ops.cs_conv import log_path
        log_path('CSBNTrunk', x.shape,
                 'xla' if plan is None else
                 ('cs-padded' if s_pad else 'cs'))
        m1, v1, m2, v2 = [], [], [], []

        if plan is None:
            w1h = w_hwio_from_cs(w1, n, n)
            w2h = w_hwio_from_cs(w2, n, n)
            wch = w_hwio_from_cs(wc, n, n)[0]
            u = xd
            for i in range(nb):
                u, st = bn_resblock_ref(
                    u, w1h[i], b1[i], ga1[i], be1[i], alpha[i],
                    w2h[i], b2[i], ga2[i], be2[i], train,
                    rm1.value[i], rv1.value[i], rm2.value[i], rv2.value[i],
                    reflect=self.reflect)
                m1.append(st[0]); v1.append(st[1])
                m2.append(st[2]); v2.append(st[3])
            out, stc = bn_close_ref(u, xd, wch, bc[0], gac[0], bec[0],
                                    train, rmc.value[0], rvc.value[0],
                                    reflect=self.reflect)
        else:
            k, _ = plan
            w_img = x.shape[2]
            xc = nhwc_to_cs(xd, k, s_pad)
            u = xc
            for i in range(nb):
                u, st = bn_resblock_cs(
                    u, w1[i:i + 1], b1[i:i + 1], ga1[i:i + 1],
                    be1[i:i + 1], alpha[i:i + 1], w2[i:i + 1], b2[i:i + 1],
                    ga2[i:i + 1], be2[i:i + 1], w_img, k, self.reflect,
                    s_valid)
                m1.append(st[0]); v1.append(st[1])
                m2.append(st[2]); v2.append(st[3])
            out_cs, stc = bn_close_cs(u, xc, wc, bc, gac, bec, w_img, k,
                                      self.reflect, s_valid)
            out = out_cs if emit_cs else \
                cs_to_nhwc(out_cs, k, x.shape[1], w_img)

        if train and not self.is_initializing():
            mom = 0.9
            upd = lambda ra, batch: mom * ra + (1 - mom) * batch
            rm1.value = upd(rm1.value, jnp.stack(m1))
            rv1.value = upd(rv1.value, jnp.stack(v1))
            rm2.value = upd(rm2.value, jnp.stack(m2))
            rv2.value = upd(rv2.value, jnp.stack(v2))
            rmc.value = upd(rmc.value, stc[0][None])
            rvc.value = upd(rvc.value, stc[1][None])
        if emit_cs:
            return out, (None if plan is None else plan[0])
        return out
