"""WDSR-B wide-activation block in CS layout — fused Pallas kernels.

The block (reference models/wdsr.py:30-51) is 1x1 expand (C -> 6C) + ReLU,
1x1 linear bottleneck (6C -> L=int(0.8C)), 3x3 conv (L -> C), skip. The 6x
expanded activation dominates HBM traffic when materialized (25 MB/block
at the 128-feat flagship); XLA must materialize it between the matmuls.

Here the whole block runs in ONE kernel per direction with h1 resident in
VMEM. The backward RECOMPUTES h1/h2 in-kernel (two small matmuls — unlike
the round-1 NHWC attempt whose XLA remat re-ran the whole forward,
PERF.md) and chunks the 6C-wide dh1 so no (6C, S) f32 array ever exists.

In CS layout the 1x1 convs are plain matmuls over the lane axis; only the
3x3 conv needs the dx/dy shift machinery (shared with cs_conv). The
bottleneck width L is zero-padded to a 16-multiple Lp; padded rows carry
zero weights/bias so results are exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cs_conv import (_build_x3, _dy_reduce, _gs_roll, _interpret, _stk,
                      w_cs, w_cs_T)


def _pad_rows(a, rows):
    """Zero-pad axis 0 (or the c_out axis of HWIO) up to ``rows``."""
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    cfg = [(0, 0)] * a.ndim
    cfg[0] = (0, pad)
    return jnp.pad(a, cfg)


def wdsr_lp(n_feats: int, linear: float = 0.8) -> tuple[int, int]:
    """(L, Lp): true bottleneck width and its 16-multiple padding."""
    lv = int(n_feats * linear)
    return lv, (lv + 15) // 16 * 16


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                scale_ref, out_ref, h1_ref, x3_ref, *, w_img, wk):
    x = x_ref[0]
    h1 = jnp.maximum(
        jnp.dot(w1_ref[...], x, preferred_element_type=jnp.float32)
        + b1_ref[...], 0.0).astype(x.dtype)
    h1_ref[...] = h1
    h2 = (jnp.dot(w2_ref[...], h1, preferred_element_type=jnp.float32)
          + b2_ref[...]).astype(x.dtype)
    s = x.shape[1]
    _build_x3(h2, x3_ref, s, w_img)
    p = jnp.dot(w3_ref[...], x3_ref[...],
                preferred_element_type=jnp.float32)
    out = (_dy_reduce(p, s, wk) + b3_ref[...]) * scale_ref[0, 0] \
        + x.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3t_ref,
                scale_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3t_ref,
                db3_ref,
                h1_ref, x3_ref, g3_ref, dh2_ref, dxa_ref, *, w_img, wk,
                n_chunks):
    gid = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]
    c, s = x.shape
    e = w1_ref.shape[0]
    ck = e // n_chunks

    @pl.when(gid == 0)
    def _():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref, dw3t_ref, db3_ref):
            ref[...] = jnp.zeros_like(ref)

    # recompute h1 (post-relu) and h2 — two small matmuls, no HBM residual
    h1 = jnp.maximum(
        jnp.dot(w1_ref[...], x, preferred_element_type=jnp.float32)
        + b1_ref[...], 0.0).astype(x.dtype)
    h1_ref[...] = h1
    h2 = (jnp.dot(w2_ref[...], h1, preferred_element_type=jnp.float32)
          + b2_ref[...]).astype(x.dtype)

    gs = (g.astype(jnp.float32) * scale_ref[0, 0]).astype(x.dtype)
    gsf = gs.astype(jnp.float32)

    # conv3 backward: dh2 = convT(gs); dW3 via lane contraction vs x3(h2)
    _build_x3(gs, g3_ref, s, w_img)
    p = jnp.dot(w3t_ref[...], g3_ref[...],
                preferred_element_type=jnp.float32)
    dh2_ref[...] = _dy_reduce(p, s, wk)
    db3_ref[...] += jnp.sum(gsf, axis=1, keepdims=True)

    _build_x3(h2, x3_ref, s, w_img)
    x3 = x3_ref[...]
    for dy in range(3):
        dw3t_ref[dy] += jax.lax.dot_general(
            _gs_roll(gsf.astype(x.dtype), dy, s, wk), x3,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    dh2 = dh2_ref[...]
    dh2b = dh2.astype(x.dtype)
    db2_ref[...] += jnp.sum(dh2, axis=1, keepdims=True)

    # dh1 (e, s) would be 6C wide in f32 — chunk it
    dxa_ref[...] = g.astype(jnp.float32)   # skip term
    for j in range(n_chunks):
        lo = j * ck
        h1j = h1[lo:lo + ck]
        dh1j = jnp.where(
            h1j.astype(jnp.float32) > 0,
            jnp.dot(w2_ref[...][:, lo:lo + ck].T, dh2b,
                    preferred_element_type=jnp.float32), 0.0)
        dh1jb = dh1j.astype(x.dtype)
        dw2_ref[:, lo:lo + ck] += jax.lax.dot_general(
            dh2b, h1j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[lo:lo + ck] += jax.lax.dot_general(
            dh1jb, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[lo:lo + ck] += jnp.sum(dh1j, axis=1, keepdims=True)
        dxa_ref[...] += jnp.dot(w1_ref[...][lo:lo + ck].T, dh1jb,
                                preferred_element_type=jnp.float32)
    dx_ref[0] = dxa_ref[...].astype(dx_ref.dtype)


def _fwd_call(x_cs, w1, b1, w2, b2, w3cs, b3, scale, w_img, k,
              interpret=None):
    g, c, s = x_cs.shape
    e = w1.shape[0]
    lp = w2.shape[0]
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, w_img=w_img, wk=w_img * k),
        grid=(g,),
        in_specs=[blk] + [full] * 6
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((g, c, s), x_cs.dtype),
        scratch_shapes=[pltpu.VMEM((e, s), x_cs.dtype),
                        pltpu.VMEM((3 * lp, s), x_cs.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * g * (e * c + lp * e + 3 * c * 3 * lp),
            bytes_accessed=2 * c * s * g * 2, transcendentals=0),
    )(x_cs, w1, b1, w2, b2, w3cs, b3, scale)


def _bwd_call(x_cs, g_cs, w1, b1, w2, b2, w3t, scale, w_img, k,
              n_chunks, interpret=None):
    g, c, s = x_cs.shape
    e = w1.shape[0]
    lp = w2.shape[0]
    blk = pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_bwd_kernel, w_img=w_img, wk=w_img * k, n_chunks=n_chunks),
        grid=(g,),
        in_specs=[blk, blk] + [full] * 5
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=(blk, acc((e, c)), acc((e, 1)), acc((lp, e)),
                   acc((lp, 1)), acc((3, c, 3 * lp)), acc((c, 1))),
        out_shape=(jax.ShapeDtypeStruct((g, c, s), x_cs.dtype),
                   jax.ShapeDtypeStruct((e, c), jnp.float32),
                   jax.ShapeDtypeStruct((e, 1), jnp.float32),
                   jax.ShapeDtypeStruct((lp, e), jnp.float32),
                   jax.ShapeDtypeStruct((lp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((3, c, 3 * lp), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((e, s), x_cs.dtype),
                        pltpu.VMEM((3 * lp, s), x_cs.dtype),
                        pltpu.VMEM((3 * c, s), x_cs.dtype),
                        pltpu.VMEM((lp, s), jnp.float32),
                        pltpu.VMEM((c, s), jnp.float32)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * g * (e * c + lp * e + 3 * c * 3 * lp),
            bytes_accessed=4 * c * s * g * 2, transcendentals=0),
    )(x_cs, g_cs, w1, b1, w2, b2, w3t, scale)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def wdsr_block_cs(x_cs, w1, b1, w2, b2, w3, b3, res_scale, w_img, k):
    """One WDSR-B block in CS layout. w1 (6C, C); b1 (6C,); w2 (Lp, 6C);
    b2 (Lp,); w3 HWIO (3, 3, Lp, C); b3 (C,). The caller zero-pads the
    bottleneck width L up to the 16-multiple Lp (wdsr_lp) BEFORE calling,
    so gradient shapes match and padding grads flow through jnp.pad.
    All 1x1 weights are the plain (materialized weight-norm) matrices."""
    out, _ = _wdsr_fwd(x_cs, w1, b1, w2, b2, w3, b3, res_scale, w_img, k)
    return out


def _wdsr_fwd(x_cs, w1, b1, w2, b2, w3, b3, res_scale, w_img, k):
    dt = x_cs.dtype
    w1d = w1.astype(dt)
    b1d = b1.astype(jnp.float32)[:, None]
    w2d = w2.astype(dt)
    b2d = b2.astype(jnp.float32)[:, None]
    scale = jnp.asarray([[res_scale]], jnp.float32)
    out = _fwd_call(x_cs, w1d, b1d, w2d, b2d, w_cs(w3).astype(dt),
                    b3.astype(jnp.float32)[:, None], scale, w_img, k)
    return out, (x_cs, w1d, b1d, w2d, b2d, w3)


def _wdsr_vjp_fwd(x_cs, w1, b1, w2, b2, w3, b3, res_scale, w_img, k):
    return _wdsr_fwd(x_cs, w1, b1, w2, b2, w3, b3, res_scale, w_img, k)


def _wdsr_vjp_bwd(res_scale, w_img, k, res, g):
    x_cs, w1d, b1d, w2d, b2d, w3 = res
    e, c = w1d.shape
    lp = w2d.shape[0]
    scale = jnp.asarray([[res_scale]], jnp.float32)
    n_chunks = max(e // 128, 1)
    while e % n_chunks:
        n_chunks -= 1
    dx, dw1, db1, dw2, db2, dw3t, db3 = _bwd_call(
        x_cs, g, w1d, b1d, w2d, b2d, w_cs_T(w3).astype(x_cs.dtype),
        scale, w_img, k, n_chunks)
    # (3, C, 3*Lp) [(dy),(c_out),(dx,c_in)] -> HWIO (3, 3, Lp, C)
    dw3_hwio = dw3t.reshape(3, c, 3, lp).transpose(0, 2, 3, 1)
    return dx, dw1, db1[:, 0], dw2, db2[:, 0], dw3_hwio, db3[:, 0]


wdsr_block_cs.defvjp(_wdsr_vjp_fwd, _wdsr_vjp_bwd)
