"""Fused WDSR-B block Pallas kernel.

WDSR-B's wide-activation block (reference models/wdsr.py:30-51) is
    a   = relu(x @ W1 + b1)          # 1x1 conv, 6x channel expansion
    v   = a @ W2 + b2                # 1x1 conv, 0.8x linear bottleneck
    out = conv3x3(v, W3) + b3        # spatial conv back to n feats
    out = out * res_scale + x
The 6x-expanded activation ``a`` is the block's dominant tensor; XLA
materializes it (and ``v``) in HBM between ops, ~8x the traffic of reading
x and writing out. This kernel keeps both intermediates resident in VMEM:
HBM traffic drops to read-x + write-out (+weights), and the 1x1 convs are
pure (TB*H*W, C) matmuls — ideal MXU shapes.

Weight normalization (reference wdsr.py:62) is applied OUTSIDE the kernel
(the flax module materializes effective kernels w = g * v/||v||), so the
kernel sees plain dense weights.

Backward: custom VJP rematerializes via XLA ops (exact gradients); the
forward fusion is where the traffic win lives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wdsr_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 scale_ref, out_ref):
    x = x_ref[...]
    tb, h, width, c = x.shape
    xf = x.astype(jnp.float32)
    res_scale = scale_ref[0, 0]

    w1 = w1_ref[...].astype(jnp.float32)   # (C, 6C)
    w2 = w2_ref[...].astype(jnp.float32)   # (6C, L)
    w3 = w3_ref[...].astype(jnp.float32)   # (3, 3, L, C)

    flat = xf.reshape(tb * h * width, c)
    a = jnp.maximum(jnp.dot(flat, w1, preferred_element_type=jnp.float32)
                    + b1_ref[...], 0.0)
    v = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2_ref[...]
    v = v.reshape(tb, h, width, w2.shape[-1])

    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((tb * h * width, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = vp[:, dy:dy + h, dx:dx + width, :]
            acc = acc + jnp.dot(tap.reshape(tb * h * width, -1), w3[dy, dx],
                                preferred_element_type=jnp.float32)
    out = (acc + b3_ref[...]).reshape(tb, h, width, c)
    out_ref[...] = (out * res_scale + xf).astype(x.dtype)


def _tile(b, h, w, c, expand, dtype):
    itemsize = jnp.dtype(dtype).itemsize
    # dominant: the 6x-expanded f32 activation (+ mosaic double buffering)
    per_elem = 2 * (2 * h * w * c * itemsize + 2 * h * w * c * expand * 4)
    tb = 1
    while tb * 2 <= b and b % (tb * 2) == 0 \
            and (tb * 2) * per_elem < 8 * 1024 * 1024:
        tb *= 2
    return tb


def wdsr_block_fused_fwd(x, w1, b1, w2, b2, w3, b3, res_scale=1.0,
                         interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    expand = w1.shape[-1] // c
    tb = _tile(b, h, w, c, expand, x.dtype)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    blk = pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _wdsr_kernel,
        grid=(b // tb,),
        in_specs=[blk, full, full, full, full, full, full,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, scale)


def wdsr_block_reference(x, w1, b1, w2, b2, w3, b3, res_scale=1.0):
    """Unfused XLA path (numerics check + large-shape fallback)."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.einsum('bhwc,cd->bhwd', xf, w1.astype(jnp.float32))
                    + b1, 0.0)
    v = jnp.einsum('bhwd,de->bhwe', a, w2.astype(jnp.float32)) + b2
    out = jax.lax.conv_general_dilated(
        v, w3.astype(jnp.float32), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b3
    return (out * res_scale + xf).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def wdsr_block_fused(x, w1, b1, w2, b2, w3, b3, res_scale=1.0):
    """Differentiable fused WDSR-B block: Pallas forward, XLA backward
    (rematerialized — exact gradients)."""
    return wdsr_block_fused_fwd(x, w1, b1, w2, b2, w3, b3, res_scale)


def _wb_fwd(x, w1, b1, w2, b2, w3, b3, res_scale):
    out = wdsr_block_fused_fwd(x, w1, b1, w2, b2, w3, b3, res_scale)
    return out, (x, w1, b1, w2, b2, w3, b3)


def _wb_bwd(res_scale, residuals, g):
    x, w1, b1, w2, b2, w3, b3 = residuals
    _, vjp = jax.vjp(
        lambda *a: wdsr_block_reference(*a, res_scale=res_scale),
        x, w1, b1, w2, b2, w3, b3)
    return vjp(g)


wdsr_block_fused.defvjp(_wb_fwd, _wb_bwd)


def wdsr_block_fits(x_shape, expand: int, dtype=jnp.float32) -> bool:
    _, h, w, c = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    need = 2 * (2 * h * w * c * itemsize + 2 * h * w * c * expand * 4)
    return need < 8 * 1024 * 1024
