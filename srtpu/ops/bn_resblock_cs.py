"""Fused CS-layout BatchNorm resblocks for SRResNet (and SRGAN's generator).

SRResNet's hot loop is ``conv-BN-PReLU-conv-BN + skip`` (reference
models/srresnet.py:9-36, models/common.py:74-109 with norm='batch'); on the
XLA path each BN breaks the conv chain into separate fusions with layout
copies between them — profiled at ~162 extra copy ops per block and 6.95
ms/step vs EDSR's 2.25 at the same trunk width (PERF.md round 3).

These kernels run the trunk in the transposed channel-sublane (CS) layout
(see cs_conv.py): per block the forward is THREE pallas_calls

  F1: conv1                          -> y1   + per-channel sum/sumsq accums
  F2: norm1 + PReLU + conv2          -> y2   + sum/sumsq accums
  F3: norm2 + skip                   -> out

with the batch statistics reduced ACROSS the sequential Mosaic grid into
(C, 1) accumulators in-kernel — the only XLA-level glue between kernels is
(C, 1)-sized arithmetic (finalizing mean/var into the affine a*y + c and
the running-stat update). The backward mirrors it:

  B1: partial sums  S_g, S_g*xhat2   (BN2's reduction terms)
  B2: BN2 grad -> convT(W2) -> PReLU'/BN1 partial sums + dW2/db2/dalpha
  B3: BN1 grad -> convT(W1) + skip  -> du, dW1/db1

Residuals are the raw conv outputs y1/y2 (bf16); xhat and the PReLU input
are recomputed in-kernel from them (two VPU ops), so the backward reads no
more HBM than the plain resblock's.

BatchNorm semantics match flax nn.BatchNorm(momentum=0.9, eps=1e-5) with
f32 stat reductions over the stored (compute-dtype) values: biased batch
variance, ra' = 0.9 ra + 0.1 batch (torch-equivalent, reference uses
nn.BatchNorm2d defaults). PReLU is torch nn.PReLU() — one shared alpha,
grad summed over channels and positions.

Weights are stored stacked and CS-arranged (L, 3C, 3C) like CSTrunk; every
block invocation passes XLA-level ``w[l:l+1]`` slices so one Mosaic compile
serves all L blocks (the kernel-dedupe rule, PERF.md round 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cs_conv import (_build_g3_reflect_T, _build_x3, _build_x3_reflect,
                      _cp, _dy_reduce, _dy_reduce_reflect,
                      _dy_reduce_reflect_T, _gs_roll, _gs_roll_reflect,
                      _interpret, _stk, _zpad, w_cs_T_from_cs)

EPS = 1e-5


def _blk(c, s):
    return pl.BlockSpec((1, c, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _vec():
    """(C, 1) f32 vector input, fully resident."""
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _acc(c):
    """(C, 1) f32 accumulator output shared by every grid step."""
    return pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _accw(c):
    return pl.BlockSpec((3, c, 3 * c), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _bld(reflect):
    """(conv input builder, conv row reduce) for the boundary mode."""
    if reflect:
        return _build_x3_reflect, _dy_reduce_reflect
    return (lambda x, ref, s, w: _build_x3(x, ref, s, w)), \
        (lambda p, s, wk: _dy_reduce(p, s, wk))


def _bld_t(reflect):
    """(convT input builder, convT row reduce) for the boundary mode."""
    if reflect:
        return _build_g3_reflect_T, _dy_reduce_reflect_T
    return (lambda g, ref, s, w: _build_x3(g, ref, s, w)), \
        (lambda p, s, wk: _dy_reduce(p, s, wk))


def _gsr(reflect):
    return _gs_roll_reflect if reflect else \
        (lambda gf, dy, s, wk: _gs_roll(gf, dy, s, wk))


def _f1_kernel(u_ref, w_ref, b_ref, y_ref, sm_ref, sq_ref, x3_ref,
               *, w_img, wk, reflect=False, s_valid=None):
    """conv(u) -> y; accumulate per-channel sum / sum-of-squares of y.

    s_valid (dead-lane padded plans, cs_plan_pad): outputs are re-zeroed
    on the pad tail — the bias add would otherwise leave b on dead lanes
    and poison both the next conv's boundary reads and the stat sums.
    """
    gid = pl.program_id(0)
    u = u_ref[0]
    c, s = u.shape
    build, reduce_ = _bld(reflect)
    build(u, x3_ref, s, w_img)
    p = jnp.dot(w_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    y = _zpad(reduce_(p, s, wk) + b_ref[0], s_valid).astype(y_ref.dtype)
    y_ref[0] = y

    @pl.when(gid == 0)
    def _():
        sm_ref[...] = jnp.zeros_like(sm_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    yf = y.astype(jnp.float32)      # stats of the STORED values (bf16)
    sm_ref[...] += jnp.sum(yf, axis=1, keepdims=True)
    sq_ref[...] += jnp.sum(yf * yf, axis=1, keepdims=True)


def _f2_kernel(y1_ref, a1_ref, c1_ref, al_ref, w_ref, b_ref,
               y2_ref, sm_ref, sq_ref, x3_ref, *, w_img, wk, reflect=False,
               s_valid=None):
    """h1 = prelu(a1*y1 + c1); conv(h1) -> y2; accumulate y2 stats."""
    gid = pl.program_id(0)
    y1 = y1_ref[0]
    c, s = y1.shape
    z = a1_ref[...] * y1.astype(jnp.float32) + c1_ref[...]
    # z = c1 on dead lanes (y1's pad tail is zero but c1 is a constant):
    # re-zero h1 so the conv's boundary reads keep SAME-pad semantics
    h1 = _zpad(jnp.where(z >= 0, z, al_ref[...] * z),
               s_valid).astype(y1.dtype)
    build, reduce_ = _bld(reflect)
    build(h1, x3_ref, s, w_img)
    p = jnp.dot(w_ref[0], x3_ref[...], preferred_element_type=jnp.float32)
    y2 = _zpad(reduce_(p, s, wk) + b_ref[0], s_valid).astype(y2_ref.dtype)
    y2_ref[0] = y2

    @pl.when(gid == 0)
    def _():
        sm_ref[...] = jnp.zeros_like(sm_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    yf = y2.astype(jnp.float32)
    sm_ref[...] += jnp.sum(yf, axis=1, keepdims=True)
    sq_ref[...] += jnp.sum(yf * yf, axis=1, keepdims=True)


def _f3_kernel(y2_ref, a2_ref, c2_ref, u_ref, out_ref, *, s_valid=None):
    """out = a2*y2 + c2 + u (the block skip)."""
    y2 = y2_ref[0]
    out = a2_ref[...] * y2.astype(jnp.float32) + c2_ref[...] \
        + u_ref[0].astype(jnp.float32)
    out_ref[0] = _zpad(out, s_valid).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _b1_kernel(g_ref, y_ref, mean_ref, inv_ref, sg_ref, sgx_ref):
    """Accumulate S_g = sum g and S_gx = sum g * xhat (xhat recomputed)."""
    gid = pl.program_id(0)
    g = g_ref[0].astype(jnp.float32)
    xhat = (y_ref[0].astype(jnp.float32) - mean_ref[...]) * inv_ref[...]

    @pl.when(gid == 0)
    def _():
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgx_ref[...] = jnp.zeros_like(sgx_ref)

    sg_ref[...] += jnp.sum(g, axis=1, keepdims=True)
    sgx_ref[...] += jnp.sum(g * xhat, axis=1, keepdims=True)


def _b2_kernel(g_ref, y2_ref, y1_ref, mean2_ref, inv2_ref, coef2_ref,
               t1_ref, t2_ref, a1_ref, c1_ref, al_ref, w2t_ref,
               mean1_ref, inv1_ref,
               dz_ref, dw2t_ref, db2_ref, dal_ref, sdz_ref, sdzx_ref,
               s3_ref, *, w_img, wk, reflect=False, s_valid=None):
    """BN2 backward -> convT(W2) -> PReLU backward; dW2/db2/dalpha accums
    and BN1's reduction terms (S_dz, S_dz*xhat1)."""
    gid = pl.program_id(0)
    g = g_ref[0].astype(jnp.float32)
    y1 = y1_ref[0]
    c, s = y1.shape

    # dy2 = coef2 * (g - t1 - xhat2 * t2); the -t1/-xhat2*t2 constants are
    # nonzero on dead lanes even though g is zero there — re-zero before
    # the convT / the dW rolls / the db sum
    xhat2 = (y2_ref[0].astype(jnp.float32) - mean2_ref[...]) * inv2_ref[...]
    dy2 = _zpad(coef2_ref[...] * (g - t1_ref[...] - xhat2 * t2_ref[...]),
                s_valid)
    dy2c = dy2.astype(y1.dtype)

    @pl.when(gid == 0)
    def _():
        dw2t_ref[...] = jnp.zeros_like(dw2t_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dal_ref[...] = jnp.zeros_like(dal_ref)
        sdz_ref[...] = jnp.zeros_like(sdz_ref)
        sdzx_ref[...] = jnp.zeros_like(sdzx_ref)

    # dh1 = convT(dy2, W2); the dy row-reduce can roll valid partials
    # into the first dead row — re-zero
    build_t, reduce_t = _bld_t(reflect)
    build_t(dy2c, s3_ref, s, w_img)
    p = jnp.dot(w2t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    dh1 = _zpad(reduce_t(p, s, wk), s_valid)

    # PReLU backward: z = a1*y1 + c1; h1 = where(z>=0, z, al*z)
    z = a1_ref[...] * y1.astype(jnp.float32) + c1_ref[...]
    dz = jnp.where(z >= 0, dh1, al_ref[...] * dh1)
    dz_ref[0] = dz.astype(dz_ref.dtype)
    dal_ref[...] += jnp.sum(jnp.where(z >= 0, 0.0, dh1 * z),
                            axis=1, keepdims=True)

    # BN1's reduction terms (from the STORED dz values, matching B3's read)
    dzs = dz_ref[0].astype(jnp.float32)
    xhat1 = (y1.astype(jnp.float32) - mean1_ref[...]) * inv1_ref[...]
    sdz_ref[...] += jnp.sum(dzs, axis=1, keepdims=True)
    sdzx_ref[...] += jnp.sum(dzs * xhat1, axis=1, keepdims=True)

    # dW2[dy] = roll(dy2, dy) @ H3^T ; db2 = sum dy2 (h1 recomputed —
    # re-zeroed on the pad tail exactly as F2 stored it)
    h1 = _zpad(jnp.where(z >= 0, z, al_ref[...] * z),
               s_valid).astype(y1.dtype)
    build, _ = _bld(reflect)
    gs = _gsr(reflect)
    build(h1, s3_ref, s, w_img)
    h3 = s3_ref[...]
    for dy in range(3):
        dr = gs(dy2.astype(y1.dtype), dy, s, wk)
        dw2t_ref[dy] += jax.lax.dot_general(
            dr, h3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy2, axis=1, keepdims=True)


def _b3_kernel(dz_ref, y1_ref, mean1_ref, inv1_ref, coef1_ref,
               t1_ref, t2_ref, u_ref, g_ref, w1t_ref,
               du_ref, dw1t_ref, db1_ref, s3_ref, *, w_img, wk, skip,
               reflect=False, s_valid=None):
    """BN1 backward -> convT(W1) (+ skip grad) -> du; dW1/db1 accums."""
    gid = pl.program_id(0)
    dz = dz_ref[0].astype(jnp.float32)
    u = u_ref[0]
    c, s = u.shape

    xhat1 = (y1_ref[0].astype(jnp.float32) - mean1_ref[...]) * inv1_ref[...]
    dy1 = _zpad(coef1_ref[...] * (dz - t1_ref[...] - xhat1 * t2_ref[...]),
                s_valid)
    dy1c = dy1.astype(u.dtype)

    @pl.when(gid == 0)
    def _():
        dw1t_ref[...] = jnp.zeros_like(dw1t_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    build_t, reduce_t = _bld_t(reflect)
    build_t(dy1c, s3_ref, s, w_img)
    p = jnp.dot(w1t_ref[0], s3_ref[...], preferred_element_type=jnp.float32)
    du = _zpad(reduce_t(p, s, wk), s_valid)
    if skip:
        du = du + g_ref[0].astype(jnp.float32)
    du_ref[0] = du.astype(du_ref.dtype)

    build, _ = _bld(reflect)
    gs = _gsr(reflect)
    build(u, s3_ref, s, w_img)
    u3 = s3_ref[...]
    for dy in range(3):
        dr = gs(dy1.astype(u.dtype), dy, s, wk)
        dw1t_ref[dy] += jax.lax.dot_general(
            dr, u3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dy1, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _conv_stats_call(kernel, args, g, c, s, dtype, n_vec, interpret):
    """Shared wrapper for F1/F2: (y, sum, sumsq) outputs + x3 scratch."""
    return pl.pallas_call(
        kernel,
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[_blk(c, s)] + [_vec()] * n_vec
        + [_stk(0, (3 * c, 3 * c)), _stk(0, (c, 1))],
        out_specs=(_blk(c, s), _acc(c), _acc(c)),
        out_shape=(jax.ShapeDtypeStruct((g, c, s), dtype),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * c * s * g,
            bytes_accessed=2 * c * s * g * 2, transcendentals=0),
    )(*args)


def f1_conv_stats(u, ws, bs, w_img, k, interpret=None, reflect=False,
                  s_valid=None):
    g, c, s = u.shape
    return _conv_stats_call(
        partial(_f1_kernel, w_img=w_img, wk=w_img * k, reflect=reflect,
                s_valid=s_valid),
        (u, ws, bs), g, c, s, u.dtype, 0, interpret)


def f2_norm_act_conv_stats(y1, a1, c1, al, ws, bs, w_img, k, interpret=None,
                           reflect=False, s_valid=None):
    g, c, s = y1.shape
    return _conv_stats_call(
        partial(_f2_kernel, w_img=w_img, wk=w_img * k, reflect=reflect,
                s_valid=s_valid),
        (y1, a1, c1, al, ws, bs), g, c, s, y1.dtype, 3, interpret)


def f3_norm_skip(y2, a2, c2, u, interpret=None, s_valid=None):
    g, c, s = y2.shape
    return pl.pallas_call(
        partial(_f3_kernel, s_valid=s_valid),
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[_blk(c, s), _vec(), _vec(), _blk(c, s)],
        out_specs=_blk(c, s),
        out_shape=jax.ShapeDtypeStruct((g, c, s), y2.dtype),
        interpret=_interpret(interpret),
    )(y2, a2, c2, u)


def b1_sums(gout, y, mean, inv, interpret=None):
    g, c, s = gout.shape
    return pl.pallas_call(
        _b1_kernel,
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[_blk(c, s), _blk(c, s), _vec(), _vec()],
        out_specs=(_acc(c), _acc(c)),
        out_shape=(jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        interpret=_interpret(interpret),
    )(gout, y, mean, inv)


def b2_call(gout, y2, y1, mean2, inv2, coef2, t1, t2, a1, c1, al, w2ts,
            mean1, inv1, w_img, k, interpret=None, reflect=False,
            s_valid=None):
    g, c, s = gout.shape
    return pl.pallas_call(
        partial(_b2_kernel, w_img=w_img, wk=w_img * k, reflect=reflect,
                s_valid=s_valid),
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[_blk(c, s), _blk(c, s), _blk(c, s)]
        + [_vec()] * 8 + [_stk(0, (3 * c, 3 * c))] + [_vec()] * 2,
        out_specs=(_blk(c, s), _accw(c), _acc(c), _acc(c), _acc(c), _acc(c)),
        out_shape=(jax.ShapeDtypeStruct((g, c, s), gout.dtype),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), gout.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g,
            bytes_accessed=4 * c * s * g * 2, transcendentals=0),
    )(gout, y2, y1, mean2, inv2, coef2, t1, t2, a1, c1, al, w2ts,
      mean1, inv1)


def b3_call(dz, y1, mean1, inv1, coef1, t1, t2, u, gout, w1ts, w_img, k,
            skip=True, interpret=None, reflect=False, s_valid=None):
    g, c, s = dz.shape
    return pl.pallas_call(
        partial(_b3_kernel, w_img=w_img, wk=w_img * k, skip=skip,
                reflect=reflect, s_valid=s_valid),
        grid=(g,),
        compiler_params=_cp(),
        in_specs=[_blk(c, s), _blk(c, s)] + [_vec()] * 5
        + [_blk(c, s), _blk(c, s), _stk(0, (3 * c, 3 * c))],
        out_specs=(_blk(c, s), _accw(c), _acc(c)),
        out_shape=(jax.ShapeDtypeStruct((g, c, s), dz.dtype),
                   jax.ShapeDtypeStruct((3, c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3 * c, s), dz.dtype)],
        interpret=_interpret(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * c * c * s * g,
            bytes_accessed=4 * c * s * g * 2, transcendentals=0),
    )(dz, y1, mean1, inv1, coef1, t1, t2, u, gout, w1ts)


# ---------------------------------------------------------------------------
# stat finalization glue (XLA level, (C, 1)-sized)
# ---------------------------------------------------------------------------


def _finalize(sm, sq, m, gamma, beta):
    """sum/sumsq -> (mean, var, inv_std, a, c) with BN(y) = a*y + c."""
    mean = sm / m
    var = jnp.maximum(sq / m - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    a = gamma * inv
    c = beta - mean * a
    return mean, var, inv, a, c


def _col(v):
    """(C,) f32 -> (C, 1) f32 kernel vector."""
    return v.astype(jnp.float32).reshape(-1, 1)


# ---------------------------------------------------------------------------
# per-block custom-VJP primitives
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def bn_resblock_cs(u, w1, b1, ga1, be1, alpha, w2, b2, ga2, be2, w_img, k,
                   reflect=False, s_valid=None):
    """One SRResNet resblock in CS layout, training mode.

    u (G, C, S); w1/w2 CS-arranged (1, 3C, 3C) slices of the stacked
    trunk weights; b/gamma/beta (1, C); alpha (1, 1) shared PReLU slope.
    Returns (out, (mean1, var1, mean2, var2)) — the batch stats feed the
    module's running-average update and are NOT differentiated through
    (their cotangents are ignored; they only flow into mutable state).
    ``reflect=True`` runs both convs with REFLECT boundaries (SRGAN's
    generator block, reference srgan.py:20-33) instead of SAME zero-pad.
    ``s_valid``: dead-lane padded packing (cs_plan_pad) — batch stats
    reduce over the g*s_valid REAL elements only and every kernel write
    re-zeroes the pad tail; not supported together with reflect (the
    mirror rolls would need pad-boundary mirror logic nobody needs:
    SRGAN's 32x32 LR shapes are always lane-aligned).
    """
    out, _, stats = _bn_rb_fwd(u, w1, b1, ga1, be1, alpha, w2, b2, ga2,
                               be2, w_img, k, reflect, s_valid)
    return out, stats


def _bn_rb_fwd(u, w1, b1, ga1, be1, alpha, w2, b2, ga2, be2, w_img, k,
               reflect=False, s_valid=None):
    if reflect and s_valid is not None:
        raise ValueError('bn_resblock_cs: reflect boundaries are not '
                         'supported on dead-lane padded plans (s_valid)')
    g, c, s = u.shape
    m = jnp.float32(g * (s if s_valid is None else s_valid))
    dt = u.dtype
    al = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(1, 1), (c, 1))

    y1, sm1, sq1 = f1_conv_stats(u, w1.astype(dt), _col(b1[0])[None], w_img,
                                 k, reflect=reflect, s_valid=s_valid)
    mean1, var1, inv1, a1, c1 = _finalize(sm1, sq1, m, _col(ga1[0]),
                                          _col(be1[0]))
    y2, sm2, sq2 = f2_norm_act_conv_stats(y1, a1, c1, al, w2.astype(dt),
                                          _col(b2[0])[None], w_img, k,
                                          reflect=reflect, s_valid=s_valid)
    mean2, var2, inv2, a2, c2 = _finalize(sm2, sq2, m, _col(ga2[0]),
                                          _col(be2[0]))
    out = f3_norm_skip(y2, a2, c2, u, s_valid=s_valid)
    saved = (u, y1, y2, mean1, inv1, mean2, inv2, w1, ga1, be1, alpha,
             w2, ga2, be2, a1, c1)
    stats = (mean1[:, 0], var1[:, 0], mean2[:, 0], var2[:, 0])
    return out, saved, stats


def _bn_rb_vjp_fwd(u, w1, b1, ga1, be1, alpha, w2, b2, ga2, be2, w_img, k,
                   reflect, s_valid):
    out, saved, stats = _bn_rb_fwd(u, w1, b1, ga1, be1, alpha, w2, b2,
                                   ga2, be2, w_img, k, reflect, s_valid)
    return (out, stats), saved


def _bn_rb_vjp_bwd(w_img, k, reflect, s_valid, saved, gs):
    gout = gs[0]           # stat cotangents (gs[1]) are state-only: ignored
    (u, y1, y2, mean1, inv1, mean2, inv2, w1, ga1, be1, alpha,
     w2, ga2, be2, a1, c1) = saved
    g, c, s = u.shape
    m = jnp.float32(g * (s if s_valid is None else s_valid))
    dt = u.dtype
    al = jnp.broadcast_to(alpha.astype(jnp.float32).reshape(1, 1), (c, 1))
    w1ts = w_cs_T_from_cs(w1.astype(dt), c, c)
    w2ts = w_cs_T_from_cs(w2.astype(dt), c, c)

    sg2, sgx2 = b1_sums(gout, y2, mean2, inv2)
    coef2 = _col(ga2[0]) * inv2
    dz, dw2t, db2, dal, sdz, sdzx = b2_call(
        gout, y2, y1, mean2, inv2, coef2, sg2 / m, sgx2 / m, a1, c1, al,
        w2ts, mean1, inv1, w_img, k, reflect=reflect, s_valid=s_valid)
    coef1 = _col(ga1[0]) * inv1
    du, dw1t, db1 = b3_call(dz, y1, mean1, inv1, coef1, sdz / m, sdzx / m,
                            u, gout, w1ts, w_img, k, skip=True,
                            reflect=reflect, s_valid=s_valid)

    wd = w1.dtype
    return (du,
            dw1t.reshape(1, 3 * c, 3 * c).astype(wd),
            db1[None, :, 0].astype(wd),
            sdzx[None, :, 0].astype(wd),      # dgamma1
            sdz[None, :, 0].astype(wd),       # dbeta1
            jnp.sum(dal).reshape(1, 1).astype(alpha.dtype),
            dw2t.reshape(1, 3 * c, 3 * c).astype(wd),
            db2[None, :, 0].astype(wd),
            sgx2[None, :, 0].astype(wd),      # dgamma2
            sg2[None, :, 0].astype(wd))       # dbeta2


bn_resblock_cs.defvjp(_bn_rb_vjp_fwd, _bn_rb_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def bn_close_cs(u, x_skip, wc, bc, gac, bec, w_img, k, reflect=False,
                s_valid=None):
    """Closing conv + BN + global skip: out = BN(conv(u)) + x_skip.

    Reference models/srresnet.py:27-30 (BasicBlock norm='batch' act=None
    followed by the trunk skip). wc is a (1, 3C, 3C) CS slice.
    ``reflect=True``: REFLECT conv boundary (SRGAN, srgan.py:40-43).
    ``s_valid``: dead-lane padded packing — see bn_resblock_cs.
    """
    out, _, stats = _bn_close_fwd(u, x_skip, wc, bc, gac, bec, w_img, k,
                                  reflect, s_valid)
    return out, stats


def _bn_close_fwd(u, x_skip, wc, bc, gac, bec, w_img, k, reflect=False,
                  s_valid=None):
    if reflect and s_valid is not None:
        raise ValueError('bn_close_cs: reflect boundaries are not '
                         'supported on dead-lane padded plans (s_valid)')
    g, c, s = u.shape
    m = jnp.float32(g * (s if s_valid is None else s_valid))
    dt = u.dtype
    y, sm, sq = f1_conv_stats(u, wc.astype(dt), _col(bc[0])[None], w_img, k,
                              reflect=reflect, s_valid=s_valid)
    mean, var, inv, a, cc = _finalize(sm, sq, m, _col(gac[0]), _col(bec[0]))
    out = f3_norm_skip(y, a, cc, x_skip, s_valid=s_valid)
    return out, (u, y, mean, inv, wc, gac), (mean[:, 0], var[:, 0])


def _bn_close_vjp_fwd(u, x_skip, wc, bc, gac, bec, w_img, k, reflect,
                      s_valid):
    out, saved, stats = _bn_close_fwd(u, x_skip, wc, bc, gac, bec, w_img, k,
                                      reflect, s_valid)
    return (out, stats), saved


def _bn_close_vjp_bwd(w_img, k, reflect, s_valid, saved, gs):
    gout = gs[0]
    u, y, mean, inv, wc, gac = saved
    g, c, s = u.shape
    m = jnp.float32(g * (s if s_valid is None else s_valid))
    dt = u.dtype
    wts = w_cs_T_from_cs(wc.astype(dt), c, c)

    sg, sgx = b1_sums(gout, y, mean, inv)
    coef = _col(gac[0]) * inv
    # B3 with dz := gout and no skip add (x_skip's grad is gout itself)
    du, dwt, db = b3_call(gout, y, mean, inv, coef, sg / m, sgx / m,
                          u, gout, wts, w_img, k, skip=False,
                          reflect=reflect, s_valid=s_valid)
    wd = wc.dtype
    return (du, gout,
            dwt.reshape(1, 3 * c, 3 * c).astype(wd),
            db[None, :, 0].astype(wd),
            sgx[None, :, 0].astype(wd),
            sg[None, :, 0].astype(wd))


bn_close_cs.defvjp(_bn_close_vjp_fwd, _bn_close_vjp_bwd)


# ---------------------------------------------------------------------------
# XLA reference (fallback path + parity oracle)
# ---------------------------------------------------------------------------


def bn_apply_ref(y, mean, var, gamma, beta):
    """BN normalization, NHWC, f32 stats already computed."""
    inv = jax.lax.rsqrt(var + EPS)
    a = (gamma * inv).astype(jnp.float32)
    c = (beta - mean * gamma * inv).astype(jnp.float32)
    return (a * y.astype(jnp.float32) + c).astype(y.dtype)


def bn_stats_ref(y):
    """Biased batch stats over (N, H, W) in f32 (flax force_float32)."""
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2)) - mean * mean, 0.0)
    return mean, var


def bn_resblock_ref(u, w1h, b1, ga1, be1, alpha, w2h, b2, ga2, be2,
                    train, rm1, rv1, rm2, rv2, reflect=False):
    """NHWC XLA reference of the CS block (same math, lax convs).

    In eval mode the running stats rm/rv are used instead of batch stats.
    Returns (out, (mean1, var1, mean2, var2)). ``reflect=True`` uses
    ReflectionPad2d boundaries (SRGAN generator, reference srgan.py:20-33).
    """
    from .cs_conv import conv3x3_reference, conv3x3_reflect_reference
    conv = conv3x3_reflect_reference if reflect else conv3x3_reference
    dt = u.dtype
    y1 = conv(u, w1h.astype(dt), b1)
    if train:
        mean1, var1 = bn_stats_ref(y1)
    else:
        mean1, var1 = rm1, rv1
    h1 = bn_apply_ref(y1, mean1, var1, ga1, be1)
    h1 = jnp.where(h1 >= 0, h1,
                   alpha.astype(jnp.float32).reshape(()) * h1).astype(dt)
    y2 = conv(h1, w2h.astype(dt), b2)
    if train:
        mean2, var2 = bn_stats_ref(y2)
    else:
        mean2, var2 = rm2, rv2
    out = bn_apply_ref(y2, mean2, var2, ga2, be2) + u
    return out, (mean1, var1, mean2, var2)


def bn_close_ref(u, x_skip, wch, bc, gac, bec, train, rmc, rvc,
                 reflect=False):
    from .cs_conv import conv3x3_reference, conv3x3_reflect_reference
    conv = conv3x3_reflect_reference if reflect else conv3x3_reference
    y = conv(u, wch.astype(u.dtype), bc)
    if train:
        mean, var = bn_stats_ref(y)
    else:
        mean, var = rmc, rvc
    return bn_apply_ref(y, mean, var, gac, bec) + x_skip, (mean, var)
