"""Pallas kernel numerics vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from srtpu.ops import (ca_layer_fits, ca_layer_fused, ca_layer_reference,
                       resblock_fits, resblock_fused, resblock_reference)


def test_ca_layer_matches_reference():
    rng = np.random.default_rng(0)
    b, h, w, c, r = 2, 16, 16, 64, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, c // r)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c // r) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c // r, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    fused = ca_layer_fused(x, w1, b1, w2, b2, interpret=True)
    ref = ca_layer_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ca_layer_fits_guard():
    assert ca_layer_fits((16, 32, 32, 64))
    assert not ca_layer_fits((1, 2048, 2048, 64))


def test_resblock_matches_reference():
    rng = np.random.default_rng(1)
    b, h, w, c = 2, 16, 16, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    fused = resblock_fused(x, w1, b1, w2, b2, res_scale=0.5,
                           interpret=True)
    ref = resblock_reference(x, w1, b1, w2, b2, res_scale=0.5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_resblock_bf16():
    rng = np.random.default_rng(2)
    b, h, w, c = 1, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros(c, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros(c, jnp.float32)
    fused = resblock_fused(x, w1, b1, w2, b2, interpret=True)
    ref = resblock_reference(x, w1, b1, w2, b2)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_resblock_fits_guard():
    assert resblock_fits((16, 32, 32, 64))
    assert not resblock_fits((1, 1024, 1024, 64))


def test_resblock_trainable_grads_match_reference():
    from srtpu.ops.resblock import resblock_fused_trainable
    rng = np.random.default_rng(3)
    b, h, w, c = 1, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    def loss_fused(args):
        return jnp.sum(resblock_fused_trainable(*args, 0.5) ** 2)

    def loss_ref(args):
        return jnp.sum(resblock_reference(*args, res_scale=0.5) ** 2)

    g_fused = jax.grad(loss_fused)((x, w1, b1, w2, b2))
    g_ref = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_ca_trainable_grads_match_reference():
    from srtpu.ops.ca_layer import ca_layer_fused_trainable
    rng = np.random.default_rng(4)
    b, h, w, c, r = 1, 8, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, c // r)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c // r) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c // r, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    g_fused = jax.grad(lambda a: jnp.sum(
        ca_layer_fused_trainable(*a) ** 2))((x, w1, b1, w2, b2))
    g_ref = jax.grad(lambda a: jnp.sum(
        ca_layer_reference(*a) ** 2))((x, w1, b1, w2, b2))
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_edsr_use_pallas_matches_standard_forward_shape():
    from srtpu.models import create_model
    m = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=1,
                     use_pallas=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 8, 8, 3))
    v = m.init(rng, x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 16, 3)

    # trains: gradient flows through the fused kernel
    hr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    g = jax.grad(lambda p: jnp.mean(jnp.abs(
        m.apply({'params': p}, x) - hr)))(v['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_resblock_v2_forward_and_grads_match_reference():
    from srtpu.ops.resblock import resblock_fused_v2
    rng = np.random.default_rng(5)
    b, h, w, c = 2, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    out = resblock_fused_v2(x, w1, b1, w2, b2, 0.5)
    ref = resblock_reference(x, w1, b1, w2, b2, res_scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    g_v2 = jax.grad(lambda a: jnp.sum(
        resblock_fused_v2(*a, 0.5) ** 2))((x, w1, b1, w2, b2))
    g_ref = jax.grad(lambda a: jnp.sum(
        resblock_reference(*a, res_scale=0.5) ** 2))((x, w1, b1, w2, b2))
    for got, want in zip(g_v2, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_resblock_v3_fully_fused_grads_match_reference():
    from srtpu.ops.resblock import resblock_fused_v3
    rng = np.random.default_rng(6)
    b, h, w, c = 3, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    out = resblock_fused_v3(x, w1, b1, w2, b2, 0.5)
    ref = resblock_reference(x, w1, b1, w2, b2, res_scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    g_v3 = jax.grad(lambda a: jnp.sum(
        resblock_fused_v3(*a, 0.5) * jnp.cos(
            jnp.arange(out.size).reshape(out.shape) / 7.0)))(
                (x, w1, b1, w2, b2))
    g_ref = jax.grad(lambda a: jnp.sum(
        resblock_reference(*a, res_scale=0.5) * jnp.cos(
            jnp.arange(out.size).reshape(out.shape) / 7.0)))(
                (x, w1, b1, w2, b2))
    for got, want in zip(g_v3, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-4)


def test_wdsr_block_fused_matches_reference():
    from srtpu.ops.wdsr_block import wdsr_block_fused, wdsr_block_reference
    rng = np.random.default_rng(7)
    b, h, w, c = 2, 8, 8, 16
    L = int(0.8 * c)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 6 * c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(6 * c) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((6 * c, L)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(L) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, L, c)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    out = wdsr_block_fused(x, w1, b1, w2, b2, w3, b3, 0.8)
    ref = wdsr_block_reference(x, w1, b1, w2, b2, w3, b3, res_scale=0.8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    args = (x, w1, b1, w2, b2, w3, b3)
    g_f = jax.grad(lambda a: jnp.sum(wdsr_block_fused(*a, 0.8) ** 2))(args)
    g_r = jax.grad(lambda a: jnp.sum(
        wdsr_block_reference(*a, res_scale=0.8) ** 2))(args)
    for got, want in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-4)
