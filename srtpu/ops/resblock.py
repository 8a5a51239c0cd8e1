"""Fused EDSR residual block Pallas kernel:
out = conv3x3(relu(conv3x3(x))) * res_scale + x, one HBM round trip.

The 3x3 'same' convolutions are expressed as nine shifted (H*W, C) x (C, C)
MXU matmuls accumulated in an f32 VMEM register tile — the im2col-free
formulation that keeps the activation resident in VMEM across BOTH convs,
the ReLU, the residual scale and the skip add. XLA fuses elementwise ops
into convs but still materializes the inter-conv activation in HBM; this
kernel removes that round trip (the EDSR hot loop runs 16 such blocks,
reference models/edsr.py:26-29).

Weights are (3, 3, C, C) HWIO, bias (C,). Applies to training-patch shapes
(whole (H, W, C) tile + intermediates fit VMEM); callers fall back to XLA
convs for large eval images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BYTES = 10 * 1024 * 1024


def _conv3x3(x_pad, w, h, width, c_out):
    """x_pad: (H+2, W+2, C); w: (3, 3, C, C_out) -> (H, W, C_out) f32."""
    acc = jnp.zeros((h * width, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_pad[dy:dy + h, dx:dx + width, :]
            acc = acc + jnp.dot(
                tap.reshape(h * width, -1), w[dy, dx],
                preferred_element_type=jnp.float32)
    return acc.reshape(h, width, c_out)


def _resblock_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                     out_ref):
    x = x_ref[0]
    h, width, c = x.shape
    xf = x.astype(jnp.float32)
    res_scale = scale_ref[0, 0]

    pad = ((1, 1), (1, 1), (0, 0))
    w1 = w1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)

    h1 = _conv3x3(jnp.pad(xf, pad), w1, h, width, w1.shape[-1])
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
    h2 = _conv3x3(jnp.pad(h1, pad), w2, h, width, w2.shape[-1])
    h2 = h2 + b2_ref[...]

    out_ref[0] = (h2 * res_scale + xf).astype(x.dtype)


def resblock_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array, res_scale: float = 1.0,
                   interpret: bool | None = None) -> jax.Array:
    """x: (B, H, W, C); w1/w2: (3, 3, C, C) HWIO; b1/b2: (C,).

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (Pallas TPU kernels don't compile on the CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    scale = jnp.asarray([[res_scale]], jnp.float32)
    return pl.pallas_call(
        _resblock_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * w * c * c * 9,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize
            + 2 * 9 * c * c * 4,
            transcendentals=0),
    )(x, w1, b1, w2, b2, scale)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_fused_trainable(x, w1, b1, w2, b2, res_scale=1.0):
    """Differentiable fused resblock: Pallas forward, XLA backward.

    The forward saves one HBM round trip; the backward recomputes the
    inter-conv activation (rematerialization — the standard TPU
    FLOPs-for-bandwidth trade) and uses XLA's exact conv gradients.
    res_scale is static (nondiff).
    """
    return resblock_fused(x, w1, b1, w2, b2, res_scale)


def _rb_fwd(x, w1, b1, w2, b2, res_scale):
    return resblock_fused(x, w1, b1, w2, b2, res_scale), \
        (x, w1, b1, w2, b2)


def _rb_bwd(res_scale, residuals, g):
    # rematerialize the forward with XLA convs and take its exact VJP —
    # the forward's HBM saving stands, the backward matches XLA numerics
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: resblock_reference(*a, res_scale=res_scale),
        x, w1, b1, w2, b2)
    return vjp(g)


resblock_fused_trainable.defvjp(_rb_fwd, _rb_bwd)


def _resblock_kernel_h1(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                        out_ref, h1_ref):
    """Variant that also emits the post-ReLU inter-conv activation, so the
    backward can reuse it instead of rematerializing the forward."""
    x = x_ref[0]
    h, width, c = x.shape
    xf = x.astype(jnp.float32)
    res_scale = scale_ref[0, 0]
    pad = ((1, 1), (1, 1), (0, 0))
    w1 = w1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)
    h1 = _conv3x3(jnp.pad(xf, pad), w1, h, width, w1.shape[-1])
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
    h1_ref[0] = h1.astype(x.dtype)
    h2 = _conv3x3(jnp.pad(h1, pad), w2, h, width, w2.shape[-1])
    out_ref[0] = ((h2 + b2_ref[...]) * res_scale + xf).astype(x.dtype)


def resblock_fused_h1(x, w1, b1, w2, b2, res_scale=1.0,
                      interpret: bool | None = None):
    """Fused forward returning (out, h1)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    scale = jnp.asarray([[res_scale]], jnp.float32)
    blk = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _resblock_kernel_h1,
        grid=(b,),
        in_specs=[blk,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        interpret=interpret,
    )(x, w1, b1, w2, b2, scale)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_fused_v2(x, w1, b1, w2, b2, res_scale=1.0):
    """Fused forward + recompute-free backward (saved h1).

    vs resblock_fused_trainable: trades one extra HBM write in the forward
    (h1, needed by the backward anyway) for skipping the full forward
    recompute in the backward.
    """
    out, _ = resblock_fused_h1(x, w1, b1, w2, b2, res_scale)
    return out


def _rb2_fwd(x, w1, b1, w2, b2, res_scale):
    out, h1 = resblock_fused_h1(x, w1, b1, w2, b2, res_scale)
    return out, (x, w1, w2, h1)


def _rb2_bwd(res_scale, residuals, g):
    x, w1, w2, h1 = residuals
    dn = ('NHWC', 'HWIO', 'NHWC')
    gf = g.astype(jnp.float32) * res_scale
    h1f = h1.astype(jnp.float32)
    xf = x.astype(jnp.float32)

    def conv(inp, w):
        return jax.lax.conv_general_dilated(
            inp, w.astype(jnp.float32), (1, 1), 'SAME',
            dimension_numbers=dn)

    # conv is linear: its vjp doesn't consume the primal output, so the
    # unused forward below is DCE'd by XLA — exact gradients, no recompute
    _, vjp2 = jax.vjp(conv, h1f, w2)
    dh1, dw2 = vjp2(gf)
    db2 = jnp.sum(gf, axis=(0, 1, 2))

    dh1_pre = dh1 * (h1f > 0)  # ReLU mask from the SAVED activation
    _, vjp1 = jax.vjp(conv, xf, w1)
    dx, dw1 = vjp1(dh1_pre)
    dx = dx + g.astype(jnp.float32)  # skip-connection branch
    db1 = jnp.sum(dh1_pre, axis=(0, 1, 2))
    return (dx.astype(x.dtype), dw1.astype(w1.dtype),
            db1.astype(jnp.float32), dw2.astype(w2.dtype),
            db2.astype(jnp.float32))


resblock_fused_v2.defvjp(_rb2_fwd, _rb2_bwd)


def resblock_fits(x_shape, dtype=jnp.float32) -> bool:
    _, h, w, c = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    # x + padded intermediates (f32) + output
    need = (2 * h * w * c * itemsize
            + 3 * (h + 2) * (w + 2) * c * 4)
    return need < _VMEM_BYTES


def resblock_reference(x, w1, b1, w2, b2, res_scale=1.0):
    """Unfused XLA path (numerics check + fallback)."""
    dn = ('NHWC', 'HWIO', 'NHWC')
    xf = x.astype(jnp.float32)
    h1 = jax.lax.conv_general_dilated(xf, w1.astype(jnp.float32), (1, 1),
                                      'SAME', dimension_numbers=dn) + b1
    h1 = jnp.maximum(h1, 0.0)
    h2 = jax.lax.conv_general_dilated(h1, w2.astype(jnp.float32), (1, 1),
                                      'SAME', dimension_numbers=dn) + b2
    return (h2 * res_scale + xf).astype(x.dtype)
