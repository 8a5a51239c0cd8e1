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


def _batch_tile(b: int, h: int, w: int, c: int, dtype,
                tensors: int = 3) -> int:
    """Largest power-of-two batch tile whose working set fits VMEM —
    bigger tiles give the MXU M = tile*H*W rows per matmul. The x2 fudge
    covers Mosaic's double-buffered stack allocations (measured ~2x the
    naive buffer sum; the scoped limit is 16MB)."""
    itemsize = jnp.dtype(dtype).itemsize
    per_elem = 2 * (2 * h * w * c * itemsize
                    + tensors * (h + 2) * (w + 2) * c * 4)
    tb = 1
    while tb * 2 <= b and b % (tb * 2) == 0 \
            and (tb * 2) * per_elem < 8 * 1024 * 1024:
        tb *= 2
    return tb


def _conv3x3(x_pad, w, h, width, c_out):
    """x_pad: (TB, H+2, W+2, C); w: (3, 3, C, C_out) ->
    (TB, H, W, C_out) f32. Batch-tiled: the nine tap matmuls run at
    M = TB*H*W so the MXU sees large operands."""
    tb = x_pad.shape[0]
    acc = jnp.zeros((tb * h * width, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_pad[:, dy:dy + h, dx:dx + width, :]
            acc = acc + jnp.dot(
                tap.reshape(tb * h * width, -1), w[dy, dx],
                preferred_element_type=jnp.float32)
    return acc.reshape(tb, h, width, c_out)


_PAD4 = ((0, 0), (1, 1), (1, 1), (0, 0))


def _resblock_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, scale_ref,
                     out_ref):
    x = x_ref[...]
    _, h, width, c = x.shape
    xf = x.astype(jnp.float32)
    res_scale = scale_ref[0, 0]

    w1 = w1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)

    h1 = _conv3x3(jnp.pad(xf, _PAD4), w1, h, width, w1.shape[-1])
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
    h2 = _conv3x3(jnp.pad(h1, _PAD4), w2, h, width, w2.shape[-1])
    h2 = h2 + b2_ref[...]

    out_ref[...] = (h2 * res_scale + xf).astype(x.dtype)


def resblock_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array, res_scale: float = 1.0,
                   interpret: bool | None = None) -> jax.Array:
    """x: (B, H, W, C); w1/w2: (3, 3, C, C) HWIO; b1/b2: (C,).

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (Pallas TPU kernels don't compile on the CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    tb = _batch_tile(b, h, w, c, x.dtype)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    return pl.pallas_call(
        _resblock_kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
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
    x = x_ref[...]
    _, h, width, c = x.shape
    xf = x.astype(jnp.float32)
    res_scale = scale_ref[0, 0]
    w1 = w1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)
    h1 = _conv3x3(jnp.pad(xf, _PAD4), w1, h, width, w1.shape[-1])
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0)
    h1_ref[...] = h1.astype(x.dtype)
    h2 = _conv3x3(jnp.pad(h1, _PAD4), w2, h, width, w2.shape[-1])
    out_ref[...] = ((h2 + b2_ref[...]) * res_scale + xf).astype(x.dtype)


def resblock_fused_h1(x, w1, b1, w2, b2, res_scale=1.0,
                      interpret: bool | None = None):
    """Fused forward returning (out, h1)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    tb = _batch_tile(b, h, w, c, x.dtype)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    blk = pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _resblock_kernel_h1,
        grid=(b // tb,),
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


def _conv3x3_T(x_pad, w, h, width, c_out):
    """Gradient-style conv: taps flipped, per-tap weights transposed.
    x_pad: (TB, H+2, W+2, C); w: (3, 3, C_out, C) viewed as fwd weights ->
    computes sum_taps shift(x)[flip] @ w[tap]^T, batch-tiled."""
    tb = x_pad.shape[0]
    acc = jnp.zeros((tb * h * width, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = x_pad[:, dy:dy + h, dx:dx + width, :]
            acc = acc + jnp.dot(
                tap.reshape(tb * h * width, -1), w[2 - dy, 2 - dx].T,
                preferred_element_type=jnp.float32)
    return acc.reshape(tb, h, width, c_out)


def _resblock_bwd_kernel(x_ref, h1_ref, g_ref, w1_ref, w2_ref, scale_ref,
                         dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    """Fused resblock backward: one VMEM residency per batch element
    computes dx and accumulates dw1/dw2/db1/db2 across the batch grid.

    Math (out = conv2(relu(conv1(x) + b1)) * s + b2*s? — biases enter
    pre-activation; see resblock_reference):
      gs      = g * res_scale
      db2    += sum(gs)
      dh1     = conv_T(gs, w2) * (h1 > 0)
      db1    += sum(dh1)
      dw2    += h1^T (*) gs      (per-tap correlation)
      dw1    += x^T (*) dh1
      dx      = conv_T(dh1, w1) + g
    """
    b_idx = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    h1 = h1_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    tb, h, width, c = x.shape
    res_scale = scale_ref[0, 0]

    w1 = w1_ref[...].astype(jnp.float32)
    w2 = w2_ref[...].astype(jnp.float32)

    gs = g * res_scale
    gs_pad = jnp.pad(gs, _PAD4)

    dh1 = _conv3x3_T(gs_pad, w2, h, width, c)
    dh1 = dh1 * (h1 > 0)
    dh1_pad = jnp.pad(dh1, _PAD4)

    dx = _conv3x3_T(dh1_pad, w1, h, width, c) + g
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # weight/bias gradients, accumulated over the (sequential) batch grid
    h1_pad = jnp.pad(h1, _PAD4)
    x_pad = jnp.pad(x, _PAD4)
    gs_flat = gs.reshape(tb * h * width, c)
    dh1_flat = dh1.reshape(tb * h * width, c)

    @pl.when(b_idx == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db2_ref[...] += jnp.sum(gs_flat, axis=0, keepdims=True)
    db1_ref[...] += jnp.sum(dh1_flat, axis=0, keepdims=True)
    for dy in range(3):
        for dx_ in range(3):
            h1_tap = h1_pad[:, dy:dy + h, dx_:dx_ + width, :] \
                .reshape(tb * h * width, c)
            dw2_ref[dy, dx_] += jnp.dot(h1_tap.T, gs_flat,
                                        preferred_element_type=jnp.float32)
            x_tap = x_pad[:, dy:dy + h, dx_:dx_ + width, :] \
                .reshape(tb * h * width, c)
            dw1_ref[dy, dx_] += jnp.dot(x_tap.T, dh1_flat,
                                        preferred_element_type=jnp.float32)


def resblock_bwd_fused(x, h1, g, w1, w2, res_scale=1.0,
                       interpret: bool | None = None):
    """Fused backward; returns (dx, dw1, db1, dw2, db2)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    tb = _batch_tile(b, h, w, c, x.dtype, tensors=5)
    scale = jnp.asarray([[res_scale]], jnp.float32)
    blk = pl.BlockSpec((tb, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc_w = pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    acc_b = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _resblock_bwd_kernel,
        grid=(b // tb,),
        in_specs=[blk, blk, blk, full, full,
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, acc_w, acc_b, acc_w, acc_b),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        interpret=interpret,
    )(x, h1, g, w1, w2, scale)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_fused_v3(x, w1, b1, w2, b2, res_scale=1.0):
    """Fully fused resblock: Pallas forward (saved h1) + Pallas backward."""
    out, _ = resblock_fused_h1(x, w1, b1, w2, b2, res_scale)
    return out


def _rb3_fwd(x, w1, b1, w2, b2, res_scale):
    out, h1 = resblock_fused_h1(x, w1, b1, w2, b2, res_scale)
    return out, (x, w1, w2, h1)


def _rb3_bwd(res_scale, residuals, g):
    x, w1, w2, h1 = residuals
    dx, dw1, db1, dw2, db2 = resblock_bwd_fused(x, h1, g, w1, w2, res_scale)
    return (dx, dw1.astype(w1.dtype), db1[0], dw2.astype(w2.dtype), db2[0])


resblock_fused_v3.defvjp(_rb3_fwd, _rb3_bwd)


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
