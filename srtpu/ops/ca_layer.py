"""Fused channel-attention (squeeze-excite) Pallas kernel.

RCAN's CALayer (reference models/rcan.py:10-29) is: global average pool ->
1x1 reduce -> ReLU -> 1x1 expand -> sigmoid -> gate. Unfused, the feature
map is read from HBM twice (once for the pool, once for the gating
multiply) plus the gated write. This kernel performs the whole block in one
VMEM residency per batch element: read x once, compute the gate on-chip
(two tiny MXU matmuls), scale, write once — 1/3 less HBM traffic on the
dominant tensor.

Used for training-patch shapes (whole H x W x C tile fits VMEM); the model
falls back to the unfused XLA path for large eval images.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative VMEM budget for one (H, W, C) block + overheads
_VMEM_BYTES = 8 * 1024 * 1024


def _ca_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[0]  # block is (1, H, W, C)
    h, w, c = x.shape
    xf = x.astype(jnp.float32)
    pooled = jnp.mean(xf.reshape(h * w, c), axis=0, keepdims=True)  # (1, C)
    hidden = jnp.maximum(
        jnp.dot(pooled, w1_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[...], 0.0)
    gate = jax.nn.sigmoid(
        jnp.dot(hidden, w2_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[...])
    out_ref[0] = (xf * gate.reshape(1, 1, c)).astype(x.dtype)


def ca_layer_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """x: (B, H, W, C); w1: (C, C//r); w2: (C//r, C).

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = x.shape
    grid = (b,)
    return pl.pallas_call(
        _ca_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


@jax.custom_vjp
def ca_layer_fused_trainable(x, w1, b1, w2, b2):
    """Differentiable fused CA layer: Pallas forward, XLA backward."""
    return ca_layer_fused(x, w1, b1, w2, b2)


def _ca_fwd(x, w1, b1, w2, b2):
    return ca_layer_fused(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ca_bwd(residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(ca_layer_reference, x, w1, b1, w2, b2)
    return vjp(g)


ca_layer_fused_trainable.defvjp(_ca_fwd, _ca_bwd)


def ca_layer_fits(x_shape, dtype=jnp.float32) -> bool:
    _, h, w, c = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    return 3 * h * w * c * itemsize < _VMEM_BYTES


def ca_layer_reference(x, w1, b1, w2, b2):
    """Unfused XLA reference (numerics check + large-shape fallback)."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    hidden = jnp.maximum(pooled @ w1 + b1, 0.0)
    gate = jax.nn.sigmoid(hidden @ w2 + b2)
    return (x.astype(jnp.float32)
            * gate[:, None, None, :]).astype(x.dtype)
