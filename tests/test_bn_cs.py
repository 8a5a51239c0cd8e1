"""Fused CS-layout BatchNorm resblocks (SRResNet trunk): parity + grads.

Interpret mode on the CPU backend (conftest sets SRTPU_CS_OFF_TPU=1); the
same kernels compile via Mosaic on TPU. Reference semantics:
models/srresnet.py:9-36 + models/common.py:74-109 (norm='batch').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.ops.bn_resblock_cs import (bn_close_cs, bn_close_ref,
                                      bn_resblock_cs, bn_resblock_ref)
from srtpu.ops.cs_conv import cs_plan, cs_to_nhwc, nhwc_to_cs, w_hwio_from_cs


@pytest.fixture(autouse=True)
def cs_kernels_interpret(monkeypatch):
    """Opt in to interpret-mode CS kernels on the CPU backend: cs_plan is
    TPU-gated in production, and conftest no longer sets the flag
    globally (the zoo defaults use_pallas='cs', so a global flag would
    drag every default-model test through ~100x-slower interpret
    kernels)."""
    monkeypatch.setenv('SRTPU_CS_OFF_TPU', '1')



@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(11)
    B, H, W, C = 4, 8, 8, 16

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    x = mk(B, H, W, C, s=1.0)
    p = dict(w1=mk(1, 3 * C, 3 * C), b1=mk(1, C),
             ga1=1.0 + mk(1, C), be1=mk(1, C),
             alpha=jnp.asarray([[0.25]], jnp.float32),
             w2=mk(1, 3 * C, 3 * C), b2=mk(1, C),
             ga2=1.0 + mk(1, C), be2=mk(1, C))
    return x, p


def _ref_args(p, C):
    w1h = w_hwio_from_cs(p['w1'], C, C)[0]
    w2h = w_hwio_from_cs(p['w2'], C, C)[0]
    return (w1h, p['b1'][0], p['ga1'][0], p['be1'][0], p['alpha'][0],
            w2h, p['b2'][0], p['ga2'][0], p['be2'][0])


def test_bn_resblock_fwd_parity(data):
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    out_cs, st = bn_resblock_cs(
        nhwc_to_cs(x, k), p['w1'], p['b1'], p['ga1'], p['be1'], p['alpha'],
        p['w2'], p['b2'], p['ga2'], p['be2'], x.shape[2], k)
    got = cs_to_nhwc(out_cs, k, x.shape[1], x.shape[2])

    a = _ref_args(p, C)
    ref, st_ref = bn_resblock_ref(x, *a, True, None, None, None, None)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    for s_cs, s_rf in zip(st, st_ref):
        np.testing.assert_allclose(s_cs, s_rf, atol=1e-4)


def test_bn_resblock_grads_match_xla(data):
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    keys = ('w1', 'b1', 'ga1', 'be1', 'alpha', 'w2', 'b2', 'ga2', 'be2')

    def loss_cs(inp):
        xc, pp = inp
        out, _ = bn_resblock_cs(xc, *[pp[kk] for kk in keys],
                                x.shape[2], k)
        return jnp.sum(jnp.sin(out))

    def loss_ref(inp):
        xx, pp = inp
        w1h = w_hwio_from_cs(pp['w1'], C, C)[0]
        w2h = w_hwio_from_cs(pp['w2'], C, C)[0]
        out, _ = bn_resblock_ref(
            xx, w1h, pp['b1'][0], pp['ga1'][0], pp['be1'][0],
            pp['alpha'][0], w2h, pp['b2'][0], pp['ga2'][0], pp['be2'][0],
            True, None, None, None, None)
        return jnp.sum(jnp.sin(nhwc_to_cs(out, k)))

    g_cs = jax.grad(loss_cs)((x_cs, p))
    g_rf = jax.grad(loss_ref)((x, p))
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k), atol=2e-3)
    for kk in keys:
        np.testing.assert_allclose(
            g_cs[1][kk], g_rf[1][kk], atol=2e-3,
            err_msg=f'grad mismatch for {kk}')


def test_bn_resblock_reflect_fwd_parity(data):
    """reflect=True: ReflectionPad2d boundaries (SRGAN generator,
    reference srgan.py:20-33) — fwd + batch stats vs the XLA reflect
    oracle."""
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    out_cs, st = bn_resblock_cs(
        nhwc_to_cs(x, k), p['w1'], p['b1'], p['ga1'], p['be1'], p['alpha'],
        p['w2'], p['b2'], p['ga2'], p['be2'], x.shape[2], k, True)
    got = cs_to_nhwc(out_cs, k, x.shape[1], x.shape[2])

    a = _ref_args(p, C)
    ref, st_ref = bn_resblock_ref(x, *a, True, None, None, None, None,
                                  reflect=True)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    for s_cs, s_rf in zip(st, st_ref):
        np.testing.assert_allclose(s_cs, s_rf, atol=1e-4)
    # and the reflect output differs from zero-pad at the border
    zp, _ = bn_resblock_ref(x, *a, True, None, None, None, None)
    assert float(jnp.max(jnp.abs(ref - zp))) > 1e-3


def test_bn_resblock_reflect_grads_match_xla(data):
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    keys = ('w1', 'b1', 'ga1', 'be1', 'alpha', 'w2', 'b2', 'ga2', 'be2')

    def loss_cs(inp):
        xc, pp = inp
        out, _ = bn_resblock_cs(xc, *[pp[kk] for kk in keys],
                                x.shape[2], k, True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(inp):
        xx, pp = inp
        w1h = w_hwio_from_cs(pp['w1'], C, C)[0]
        w2h = w_hwio_from_cs(pp['w2'], C, C)[0]
        out, _ = bn_resblock_ref(
            xx, w1h, pp['b1'][0], pp['ga1'][0], pp['be1'][0],
            pp['alpha'][0], w2h, pp['b2'][0], pp['ga2'][0], pp['be2'][0],
            True, None, None, None, None, reflect=True)
        return jnp.sum(jnp.sin(nhwc_to_cs(out, k)))

    g_cs = jax.grad(loss_cs)((x_cs, p))
    g_rf = jax.grad(loss_ref)((x, p))
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k), atol=2e-3)
    for kk in keys:
        np.testing.assert_allclose(
            g_cs[1][kk], g_rf[1][kk], atol=2e-3,
            err_msg=f'grad mismatch for {kk}')


def test_bn_close_reflect_parity_and_grads(data):
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    skip = jnp.flip(x, axis=1)
    skip_cs = nhwc_to_cs(skip, k)

    def loss_cs(inp):
        xc, sc, w, b, ga, be = inp
        out, _ = bn_close_cs(xc, sc, w, b, ga, be, x.shape[2], k, True)
        return jnp.sum(jnp.cos(out))

    def loss_ref(inp):
        xx, ss, w, b, ga, be = inp
        wch = w_hwio_from_cs(w, C, C)[0]
        out, _ = bn_close_ref(xx, ss, wch, b[0], ga[0], be[0],
                              True, None, None, reflect=True)
        return jnp.sum(jnp.cos(nhwc_to_cs(out, k)))

    args_cs = (x_cs, skip_cs, p['w1'], p['b1'], p['ga1'], p['be1'])
    args_rf = (x, skip, p['w1'], p['b1'], p['ga1'], p['be1'])
    np.testing.assert_allclose(loss_cs(args_cs), loss_ref(args_rf),
                               atol=1e-3)
    g_cs = jax.grad(loss_cs)(args_cs)
    g_rf = jax.grad(loss_ref)(args_rf)
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k), atol=2e-3)
    np.testing.assert_allclose(g_cs[1], nhwc_to_cs(g_rf[1], k), atol=2e-3)
    for a, b in zip(g_cs[2:], g_rf[2:]):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_reflect_reference_matches_torch_reflectionpad():
    """Pin conv3x3_reflect_reference to torch ReflectionPad2d + Conv2d
    (the reference generator's conv_block, srgan.py:20-27)."""
    import torch

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 4, 8)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(8) * 0.1).astype(np.float32)

    from srtpu.ops.cs_conv import conv3x3_reflect_reference
    got = conv3x3_reflect_reference(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(b))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    pad = torch.nn.ReflectionPad2d(1)
    ref = torch.nn.functional.conv2d(pad(xt), wt, torch.from_numpy(b))
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_bn_close_parity_and_grads(data):
    x, p = data
    C = x.shape[-1]
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    skip = jnp.flip(x, axis=1)
    skip_cs = nhwc_to_cs(skip, k)

    def loss_cs(inp):
        xc, sc, w, b, ga, be = inp
        out, _ = bn_close_cs(xc, sc, w, b, ga, be, x.shape[2], k)
        return jnp.sum(jnp.cos(out))

    def loss_ref(inp):
        xx, ss, w, b, ga, be = inp
        wch = w_hwio_from_cs(w, C, C)[0]
        out, _ = bn_close_ref(xx, ss, wch, b[0], ga[0], be[0],
                              True, None, None)
        return jnp.sum(jnp.cos(nhwc_to_cs(out, k)))

    args_cs = (x_cs, skip_cs, p['w1'], p['b1'], p['ga1'], p['be1'])
    args_rf = (x, skip, p['w1'], p['b1'], p['ga1'], p['be1'])
    np.testing.assert_allclose(loss_cs(args_cs), loss_ref(args_rf),
                               atol=1e-3)
    g_cs = jax.grad(loss_cs)(args_cs)
    g_rf = jax.grad(loss_ref)(args_rf)
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k), atol=2e-3)
    np.testing.assert_allclose(g_cs[1], nhwc_to_cs(g_rf[1], k), atol=2e-3)
    for a, b in zip(g_cs[2:], g_rf[2:]):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_ref_block_matches_flax_batchnorm(data):
    """Pin bn_resblock_ref's manual BN to nn.BatchNorm semantics."""
    from flax import linen as nn

    x, p = data
    C = x.shape[-1]
    w1h = w_hwio_from_cs(p['w1'], C, C)[0]
    w2h = w_hwio_from_cs(p['w2'], C, C)[0]

    class FlaxBlock(nn.Module):
        @nn.compact
        def __call__(self, u):
            from srtpu.ops.cs_conv import conv3x3_reference
            y1 = conv3x3_reference(u, w1h, p['b1'][0])
            h = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5)(y1)
            h = jnp.where(h >= 0, h, p['alpha'][0, 0] * h)
            y2 = conv3x3_reference(h, w2h, p['b2'][0])
            h2 = nn.BatchNorm(use_running_average=False, momentum=0.9,
                              epsilon=1e-5)(y2)
            return h2 + u

    mod = FlaxBlock()
    vs = mod.init(jax.random.PRNGKey(0), x)
    # inject our gamma/beta
    params = jax.tree_util.tree_map(lambda a: a, vs['params'])
    params['BatchNorm_0']['scale'] = p['ga1'][0]
    params['BatchNorm_0']['bias'] = p['be1'][0]
    params['BatchNorm_1']['scale'] = p['ga2'][0]
    params['BatchNorm_1']['bias'] = p['be2'][0]
    ref_flax, updated = mod.apply(
        {'params': params, 'batch_stats': vs['batch_stats']}, x,
        mutable=['batch_stats'])

    got, st = bn_resblock_ref(x, *_ref_args(p, C), True,
                              None, None, None, None)
    np.testing.assert_allclose(got, ref_flax, atol=1e-4)
    # flax running update: 0.9*ra + 0.1*batch (init ra: mean 0 / var 1)
    np.testing.assert_allclose(
        updated['batch_stats']['BatchNorm_0']['mean'], 0.1 * st[0],
        atol=1e-5)
    np.testing.assert_allclose(
        updated['batch_stats']['BatchNorm_0']['var'], 0.9 + 0.1 * st[1],
        atol=1e-5)


def test_csbn_trunk_cs_matches_fallback(monkeypatch):
    """CSBNTrunk: CS kernel path == XLA fallback path, fwd + running
    stats, on the same params."""
    from srtpu.models.common import CSBNTrunk
    from srtpu.ops import cs_conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), jnp.float32)
    trunk = CSBNTrunk(n_feats=16, n_resblocks=2)
    vs = trunk.init(jax.random.PRNGKey(1), x, train=True)

    out_cs, upd_cs = trunk.apply(vs, x, train=True,
                                 mutable=['batch_stats'])
    monkeypatch.setattr(cs_conv, 'cs_plan', lambda shape: None)
    out_rf, upd_rf = trunk.apply(vs, x, train=True,
                                 mutable=['batch_stats'])
    np.testing.assert_allclose(out_cs, out_rf, atol=2e-4)
    for kk in upd_cs['batch_stats']:
        np.testing.assert_allclose(upd_cs['batch_stats'][kk],
                                   upd_rf['batch_stats'][kk], atol=1e-4,
                                   err_msg=kk)


def test_csbn_trunk_reflect_cs_matches_fallback(monkeypatch):
    """CSBNTrunk(reflect=True): CS kernel path == XLA reflect fallback
    (the SRGAN generator trunk, reference srgan.py:20-43)."""
    from srtpu.models.common import CSBNTrunk
    from srtpu.ops import cs_conv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), jnp.float32)
    trunk = CSBNTrunk(n_feats=16, n_resblocks=2, reflect=True)
    vs = trunk.init(jax.random.PRNGKey(1), x, train=True)

    out_cs, upd_cs = trunk.apply(vs, x, train=True,
                                 mutable=['batch_stats'])
    monkeypatch.setattr(cs_conv, 'cs_plan', lambda shape: None)
    out_rf, upd_rf = trunk.apply(vs, x, train=True,
                                 mutable=['batch_stats'])
    np.testing.assert_allclose(out_cs, out_rf, atol=2e-4)
    for kk in upd_cs['batch_stats']:
        np.testing.assert_allclose(upd_cs['batch_stats'][kk],
                                   upd_rf['batch_stats'][kk], atol=1e-4,
                                   err_msg=kk)


@pytest.mark.slow
def test_srresnet_cs_train_step():
    """SRResNet(use_pallas='cs') end-to-end: fit one step, loss finite,
    batch_stats move, eval path runs."""
    from srtpu.models import create_model

    model = create_model('SRResNet', scale_factor=2, n_feats=16,
                         n_resblocks=2, use_pallas='cs')
    rng = np.random.default_rng(5)
    lr_img = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr_img = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    vs = model.init(jax.random.PRNGKey(2), lr_img, train=True)

    def loss_fn(params):
        sr, upd = model.apply(
            {'params': params, 'batch_stats': vs['batch_stats']},
            lr_img, train=True, mutable=['batch_stats'])
        return jnp.mean(jnp.abs(sr - hr_img)), upd

    (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        vs['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.any(np.abs(g) > 0) for g in leaves)
    # running stats moved off init
    bs = upd['batch_stats']['CSBNTrunk_0']
    assert float(jnp.max(jnp.abs(bs['mean1']))) > 0

    # eval path (running stats, XLA) produces the right output shape
    sr_eval = model.apply(
        {'params': vs['params'], 'batch_stats': upd['batch_stats']},
        lr_img, train=False)
    assert sr_eval.shape == hr_img.shape


# ---------------------------------------------------------------------------
# dead-lane padded packings (cs_plan_pad): the scale-3 BN trunk
# ---------------------------------------------------------------------------
#
# 42x42 LR (scale-3) shapes have S = H*W*k that is never a 128 multiple;
# cs_plan_pad packs with a zero-padded dead-lane tail. For BN the batch
# statistics must reduce over the g*s_valid REAL elements only — a naive
# mean over the padded lane axis would bias mean/var by the tail zeros.
# Pinned here on an unaligned 6x6 shape against the XLA reference.


@pytest.fixture(scope='module')
def pad_bn_data():
    rng = np.random.default_rng(17)
    B, H, W, C = 4, 6, 6, 16

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    x = mk(B, H, W, C, s=1.0)
    p = dict(w1=mk(1, 3 * C, 3 * C), b1=mk(1, C),
             ga1=1.0 + mk(1, C), be1=mk(1, C),
             alpha=jnp.asarray([[0.25]], jnp.float32),
             w2=mk(1, 3 * C, 3 * C), b2=mk(1, C),
             ga2=1.0 + mk(1, C), be2=mk(1, C))
    return x, p


def test_bn_resblock_padded_fwd_and_stats(pad_bn_data):
    from srtpu.ops.cs_conv import cs_plan_pad
    x, p = pad_bn_data
    C = x.shape[-1]
    assert cs_plan(x.shape) is None
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = 6 * 6 * k
    out_cs, st = bn_resblock_cs(
        nhwc_to_cs(x, k, s_pad), p['w1'], p['b1'], p['ga1'], p['be1'],
        p['alpha'], p['w2'], p['b2'], p['ga2'], p['be2'], x.shape[2], k,
        False, s_valid)
    # the pad-tail invariant: dead lanes of the output are zero
    np.testing.assert_array_equal(np.asarray(out_cs[:, :, s_valid:]), 0)
    got = cs_to_nhwc(out_cs, k, x.shape[1], x.shape[2])

    a = _ref_args(p, C)
    ref, st_ref = bn_resblock_ref(x, *a, True, None, None, None, None)
    np.testing.assert_allclose(got, ref, atol=2e-4)
    # batch stats: mean/var over REAL elements only (masked reductions)
    for s_cs, s_rf in zip(st, st_ref):
        np.testing.assert_allclose(s_cs, s_rf, atol=1e-4)


def test_bn_resblock_padded_grads_match_xla(pad_bn_data):
    from srtpu.ops.cs_conv import cs_plan_pad
    x, p = pad_bn_data
    C = x.shape[-1]
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = 6 * 6 * k
    x_cs = nhwc_to_cs(x, k, s_pad)
    keys = ('w1', 'b1', 'ga1', 'be1', 'alpha', 'w2', 'b2', 'ga2', 'be2')

    # NOTE: the loss converts CS -> NHWC first — the production contract
    # (cs_to_nhwc's VJP, and every CS kernel's zpadded dx) is that
    # cotangents entering the backward are zero on the pad tail; sin()
    # applied to the raw padded buffer would inject cos(0)=1 there.
    def loss_cs(inp):
        xc, pp = inp
        out, _ = bn_resblock_cs(xc, *[pp[kk] for kk in keys],
                                x.shape[2], k, False, s_valid)
        return jnp.sum(jnp.sin(cs_to_nhwc(out, k, x.shape[1], x.shape[2])))

    def loss_ref(inp):
        xx, pp = inp
        w1h = w_hwio_from_cs(pp['w1'], C, C)[0]
        w2h = w_hwio_from_cs(pp['w2'], C, C)[0]
        out, _ = bn_resblock_ref(
            xx, w1h, pp['b1'][0], pp['ga1'][0], pp['be1'][0],
            pp['alpha'][0], w2h, pp['b2'][0], pp['ga2'][0], pp['be2'][0],
            True, None, None, None, None)
        return jnp.sum(jnp.sin(out))

    g_cs = jax.grad(loss_cs)((x_cs, p))
    g_rf = jax.grad(loss_ref)((x, p))
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k, s_pad),
                               atol=2e-3)
    for kk in keys:
        np.testing.assert_allclose(
            g_cs[1][kk], g_rf[1][kk], atol=2e-3,
            err_msg=f'grad mismatch for {kk}')


def test_bn_close_padded_matches_ref(pad_bn_data):
    from srtpu.ops.bn_resblock_cs import bn_close_ref
    from srtpu.ops.cs_conv import cs_plan_pad
    x, p = pad_bn_data
    C = x.shape[-1]
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = 6 * 6 * k
    rng = np.random.default_rng(18)
    skip = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    w, b = p['w1'], p['b1']
    ga, be = p['ga1'], p['be1']

    def loss_cs(x_, sk_):
        out, st = bn_close_cs(nhwc_to_cs(x_, k, s_pad),
                              nhwc_to_cs(sk_, k, s_pad), w, b, ga, be,
                              x.shape[2], k, False, s_valid)
        # CS -> NHWC first: cotangents must be zero on the pad tail (the
        # production contract, see the grads test above)
        return jnp.sum(jnp.sin(cs_to_nhwc(out, k, x.shape[1],
                                          x.shape[2]))), st

    def loss_ref(x_, sk_):
        wh = w_hwio_from_cs(w, C, C)[0]
        out, st = bn_close_ref(x_, sk_, wh, b[0], ga[0], be[0], True,
                               None, None)
        return jnp.sum(jnp.sin(out)), st

    (v_cs, st_cs), g_cs = jax.value_and_grad(
        loss_cs, argnums=(0, 1), has_aux=True)(x, skip)
    (v_rf, st_rf), g_rf = jax.value_and_grad(
        loss_ref, argnums=(0, 1), has_aux=True)(x, skip)
    np.testing.assert_allclose(v_cs, v_rf, rtol=1e-5)
    for a, b_ in zip(st_cs, st_rf):
        np.testing.assert_allclose(a, b_, atol=1e-4)
    for a, b_ in zip(g_cs, g_rf):
        np.testing.assert_allclose(a, b_, atol=2e-3)


def test_csbn_trunk_padded_path_consulted_and_matches(monkeypatch):
    """CSBNTrunk on an unaligned shape takes the cs_plan_pad path (the
    scale-3 SRResNet recipe) and matches the XLA fallback in values,
    batch stats, and gradients."""
    from srtpu.models.common import CSBNTrunk
    from srtpu.ops import cs_conv

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 16)), jnp.float32)
    trunk = CSBNTrunk(n_feats=16, n_resblocks=2)
    vs = trunk.init(jax.random.PRNGKey(1), x, train=True)

    taken = []
    real = cs_conv.cs_plan_pad
    monkeypatch.setattr(cs_conv, 'cs_plan_pad',
                        lambda s: taken.append(s) or real(s))

    def loss(params, use_cs):
        if not use_cs:
            monkeypatch.setattr(cs_conv, 'cs_plan_pad', lambda s: None)
        else:
            monkeypatch.setattr(cs_conv, 'cs_plan_pad',
                                lambda s: taken.append(s) or real(s))
        out, upd = trunk.apply(
            {'params': params, 'batch_stats': vs['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return jnp.sum(jnp.sin(out)), upd

    (v_cs, upd_cs), g_cs = jax.value_and_grad(
        loss, has_aux=True)(vs['params'], True)
    assert taken, 'padded CS path was not consulted'
    (v_rf, upd_rf), g_rf = jax.value_and_grad(
        loss, has_aux=True)(vs['params'], False)
    np.testing.assert_allclose(v_cs, v_rf, rtol=5e-5)
    for kk in upd_cs['batch_stats']:
        np.testing.assert_allclose(upd_cs['batch_stats'][kk],
                                   upd_rf['batch_stats'][kk], atol=1e-4,
                                   err_msg=kk)
    flat_cs = jax.tree_util.tree_leaves_with_path(g_cs)
    flat_rf = jax.tree_util.tree_leaves(g_rf)
    for (path, a), b in zip(flat_cs, flat_rf):
        np.testing.assert_allclose(a, b, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))
