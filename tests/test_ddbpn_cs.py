"""DDBPN on the CS kernel path: builders, cross-tree parity, gradients.

The back-projection convs (reference models/ddbpn.py:10-24 — stride-r
conv / transposed conv, kernel {6,8,12}, padding 2) lower to 3x3 coarse
convs over phase-major channels (srtpu/ops/ddbpn_cs.py). Runs in Pallas
interpret mode on the CPU test backend (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.models.common import Conv2d, ConvTranspose2d
from srtpu.models.ddbpn import DDBPN
from srtpu.ops.cs_conv import conv3x3_reference
from srtpu.ops.ddbpn_cs import (_PROJ_PARAMS, convert_params_xla_to_cs,
                                nhwc_to_pm, pm_to_nhwc_fine, w_down_pd,
                                w_up_pm)


@pytest.fixture(autouse=True)
def cs_kernels_interpret(monkeypatch):
    """Opt in to interpret-mode CS kernels on the CPU backend: cs_plan is
    TPU-gated in production, and conftest no longer sets the flag
    globally (the zoo defaults use_pallas='cs', so a global flag would
    drag every default-model test through ~100x-slower interpret
    kernels)."""
    monkeypatch.setenv('SRTPU_CS_OFF_TPU', '1')



@pytest.mark.parametrize('r', [2, 4, 8])
def test_projection_builders_match_modules(r):
    """w_up_pm / w_down_pd: the coarse phase-major formulation equals the
    flax ConvTranspose2d / strided Conv2d modules exactly."""
    rng = np.random.RandomState(3)
    k, s, p = _PROJ_PARAMS[r]
    B, h, w, C, Co = 2, 8, 8, 16, 12

    x = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
    m = ConvTranspose2d(Co, k, strides=s, padding=p)
    vs = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(vs, x)
    out = pm_to_nhwc_fine(conv3x3_reference(
        x, w_up_pm(vs['params']['kernel'], r),
        jnp.tile(vs['params']['bias'], r * r)), r)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    xf = jnp.asarray(rng.randn(B, h * r, w * r, C), jnp.float32)
    m2 = Conv2d(Co, k, strides=s, padding=p)
    vs2 = m2.init(jax.random.PRNGKey(1), xf)
    ref2 = m2.apply(vs2, xf)
    out2 = conv3x3_reference(nhwc_to_pm(xf, r),
                             w_down_pd(vs2['params']['kernel'], r),
                             vs2['params']['bias'])
    np.testing.assert_allclose(out2, ref2, atol=1e-5)


@pytest.fixture(scope='module')
def ddbpn_pair():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    kw = dict(scale_factor=4, n0=32, nr=16, depth=4)
    m_x = DDBPN(use_pallas=False, **kw)
    vs = m_x.init(jax.random.PRNGKey(0), x)
    m_c = DDBPN(use_pallas='cs', **kw)
    p_cs = convert_params_xla_to_cs(vs['params'], 4, 16, 4)
    return x, m_x, vs['params'], m_c, p_cs


@pytest.mark.slow
def test_ddbpn_cs_cross_tree_parity(ddbpn_pair):
    """DDBPN(use_pallas='cs') with converted params == the XLA branch,
    on BOTH the kernel path and the NHWC fallback."""
    from srtpu.ops import cs_conv
    x, m_x, p_x, m_c, p_cs = ddbpn_pair
    ref = m_x.apply({'params': p_x}, x)

    # converted tree matches a fresh CS init structurally
    init_cs = m_c.init(jax.random.PRNGKey(1), x)['params']
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.shape(a) == jnp.shape(b), init_cs, p_cs))

    out_cs = m_c.apply({'params': p_cs}, x)
    np.testing.assert_allclose(out_cs, ref, atol=1e-5)
    orig = cs_conv.cs_plan
    try:
        cs_conv.cs_plan = lambda shape: None
        out_rf = m_c.apply({'params': p_cs}, x)
    finally:
        cs_conv.cs_plan = orig
    np.testing.assert_allclose(out_rf, ref, atol=1e-5)


@pytest.mark.slow
def test_ddbpn_cs_grads_match_fallback(ddbpn_pair):
    """Kernel-path gradients == fallback gradients on the same params,
    and dead-tap (masked) weight slots get exactly zero gradient."""
    from srtpu.ops import cs_conv
    from srtpu.ops.ddbpn_cs import up_mask_cs
    x, _, _, m_c, p_cs = ddbpn_pair
    rng = np.random.default_rng(9)
    gt = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)

    def loss(p):
        return jnp.mean(jnp.abs(m_c.apply({'params': p}, x) - gt))

    g_cs = jax.grad(loss)(p_cs)
    orig = cs_conv.cs_plan
    try:
        cs_conv.cs_plan = lambda shape: None
        g_rf = jax.grad(loss)(p_cs)
    finally:
        cs_conv.cs_plan = orig
    for pth, a in jax.tree_util.tree_leaves_with_path(g_cs):
        b = g_rf
        for kp in pth:
            b = b[kp.key]
        np.testing.assert_allclose(a, b, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(pth))
    dead = up_mask_cs(4, 16, 16) == 0
    ga0 = np.asarray(g_cs['CSDenseProjection_0']['a0_kernel'])
    assert np.all(ga0[dead] == 0)
    assert np.any(ga0[~dead] != 0)


@pytest.mark.slow
def test_ddbpn_cs_train_step():
    """DDBPN(use_pallas='cs') end-to-end: one value_and_grad step,
    finite loss and grads."""
    from srtpu.models import create_model

    model = create_model('DDBPN', scale_factor=2, n0=16, nr=16, depth=3,
                         use_pallas='cs')
    rng = np.random.default_rng(5)
    lr_img = jnp.asarray(rng.random((4, 8, 8, 3)), jnp.float32)
    hr_img = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    vs = model.init(jax.random.PRNGKey(2), lr_img, train=True)

    def loss_fn(params):
        sr = model.apply({'params': params}, lr_img, train=True)
        return jnp.mean(jnp.abs(sr - hr_img))

    loss, grads = jax.value_and_grad(loss_fn)(vs['params'])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.any(np.abs(g) > 0) for g in leaves)
