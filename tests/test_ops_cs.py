"""CS-layout (channel-sublane) conv kernels: parity + gradients vs XLA.

Runs in Pallas interpret mode on the CPU test backend (tests/conftest.py);
the same code compiles via Mosaic on TPU. End-to-end TPU numbers: PERF.md
round 2 (5.25k vs 4.45k patches/s on the EDSR-baseline train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.ops.cs_conv import (conv3x3_cs, conv3x3_reference, cs_plan,
                               cs_to_nhwc, nhwc_to_cs, resblock_cs)


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
    rng = np.random.default_rng(7)
    B, H, W, C = 4, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _rb_ref(x, w1, b1, w2, b2, s=0.7):
    h1 = jnp.maximum(conv3x3_reference(x, w1, b1), 0)
    return conv3x3_reference(h1, w2, b2) * s + x


def test_layout_roundtrip(data):
    x = data[0]
    k, g = cs_plan(x.shape)
    assert g * k == x.shape[0]
    x_cs = nhwc_to_cs(x, k)
    assert x_cs.shape == (g, x.shape[3], x.shape[1] * x.shape[2] * k)
    np.testing.assert_array_equal(cs_to_nhwc(x_cs, k, 8, 8), x)


def test_conv_fwd_parity(data):
    x, w1, b1, *_ = data
    k, _ = cs_plan(x.shape)
    got = cs_to_nhwc(conv3x3_cs(nhwc_to_cs(x, k), w1, b1, 8, k), k, 8, 8)
    ref = conv3x3_reference(x, w1, b1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_resblock_fwd_parity(data):
    x, w1, b1, w2, b2 = data
    k, _ = cs_plan(x.shape)
    got = cs_to_nhwc(resblock_cs(nhwc_to_cs(x, k), w1, b1, w2, b2,
                                 0.7, 8, k), k, 8, 8)
    np.testing.assert_allclose(got, _rb_ref(x, w1, b1, w2, b2), atol=1e-4)


def test_conv_grads_match_xla(data):
    x, w1, b1, *_ = data
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)

    def loss_cs(p):
        return jnp.sum(jnp.sin(conv3x3_cs(x_cs, p[0], p[1], 8, k)))

    def loss_ref(p):
        return jnp.sum(jnp.sin(nhwc_to_cs(conv3x3_reference(x, *p), k)))

    g_cs = jax.grad(loss_cs)((w1, b1))
    g_rf = jax.grad(loss_ref)((w1, b1))
    for a, b in zip(g_cs, g_rf):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_resblock_grads_match_xla(data):
    x, w1, b1, w2, b2 = data
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)

    def loss_cs(inp):
        return jnp.sum(jnp.cos(resblock_cs(inp[0], *inp[1:], 0.7, 8, k)))

    def loss_ref(inp):
        return jnp.sum(jnp.cos(nhwc_to_cs(_rb_ref(*inp), k)))

    g_cs = jax.grad(loss_cs)((x_cs, w1, b1, w2, b2))
    g_rf = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    np.testing.assert_allclose(g_cs[0], nhwc_to_cs(g_rf[0], k), atol=1e-3)
    for a, b in zip(g_cs[1:], g_rf[1:]):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_packed_lane_rows(data):
    """k>1 (several images per lane-row) keeps seam masks correct.
    (8, 8, 4, 16) -> k=8, S=256: lane-tile aligned — cs_plan now refuses
    unaligned S outright (Mosaic rejects those kernels on real TPUs)."""
    _, w1, b1, w2, b2 = data
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 8, 4, 16)), jnp.float32)
    k, _ = cs_plan(x.shape)
    assert k > 1
    got = cs_to_nhwc(resblock_cs(nhwc_to_cs(x, k), w1, b1, w2, b2,
                                 1.0, 4, k), k, 8, 4)
    np.testing.assert_allclose(got, _rb_ref(x, w1, b1, w2, b2, 1.0),
                               atol=1e-4)


def test_cs_plan_refuses_unaligned_lanes():
    """S = H*W*k must be a 128-multiple: Mosaic pads roll/mask pieces to
    mismatched lane offsets otherwise and rejects the kernel at compile
    (seen on real TPU at scale 3: 42x42 LR -> S=3528). cs_plan must
    return None so models fall back to XLA convs."""
    assert cs_plan((16, 42, 42, 64)) is None
    assert cs_plan((16, 32, 32, 64)) == (4, 4)


@pytest.mark.slow
def test_trunk_cs_matches_blockwise(data):
    """trunk_cs (stacked weights, trunk-level VJP) == sequential
    resblock_cs, values and gradients."""
    from srtpu.ops.cs_conv import trunk_cs
    x, w1, b1, w2, b2 = data
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    rng = np.random.default_rng(5)
    w1b = jnp.asarray(rng.standard_normal((2, 3, 3, 16, 16)) * 0.1,
                      jnp.float32)
    b1b = jnp.asarray(rng.standard_normal((2, 16)) * 0.1, jnp.float32)
    w2b = jnp.asarray(rng.standard_normal((2, 3, 3, 16, 16)) * 0.1,
                      jnp.float32)
    b2b = jnp.asarray(rng.standard_normal((2, 16)) * 0.1, jnp.float32)

    from srtpu.ops.cs_conv import w_cs_batch

    def f_trunk(inp):
        xc, w1_, b1_, w2_, b2_ = inp
        return jnp.sum(jnp.sin(trunk_cs(
            xc, w_cs_batch(w1_), b1_, w_cs_batch(w2_), b2_, 0.7, 8, k)))

    def f_blocks(inp):
        xc, w1_, b1_, w2_, b2_ = inp
        for i in range(2):
            xc = resblock_cs(xc, w1_[i], b1_[i], w2_[i], b2_[i], 0.7, 8, k)
        return jnp.sum(jnp.sin(xc))

    args = (x_cs, w1b, b1b, w2b, b2b)
    np.testing.assert_allclose(f_trunk(args), f_blocks(args), rtol=1e-5)
    g_t = jax.grad(f_trunk)(args)
    g_b = jax.grad(f_blocks)(args)
    for a, b in zip(g_t, g_b):
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.slow
def test_resgroup_ca_cs_matches_xla(data):
    """RCAN residual group (fused pairs + CS-layout channel attention,
    group-level VJP with hand-derived CA gradients) vs plain XLA math."""
    from srtpu.ops.cs_conv import (ca_gate_reference, resgroup_ca_cs,
                                   w_cs_batch, w_hwio_from_cs)
    rng = np.random.default_rng(9)
    B, H, W, C, L, R = 4, 8, 8, 16, 2, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    w1 = w_cs_batch(mk(L, 3, 3, C, C))
    b1, b2 = mk(L, C), mk(L, C)
    w2 = w_cs_batch(mk(L, 3, 3, C, C))
    wd, bd = mk(L, C, C // R), mk(L, C // R)
    wu, bu = mk(L, C // R, C, s=0.5), mk(L, C)
    wc = w_cs_batch(mk(1, 3, 3, C, C))[0]
    bc = mk(C)
    args = (x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc)

    def f_cs(a):
        return jnp.sum(jnp.sin(resgroup_ca_cs(*a, H, W, k)))

    def f_ref(a):
        xc, w1_, b1_, w2_, b2_, wd_, bd_, wu_, bu_, wc_, bc_ = a
        xn = cs_to_nhwc(xc, k, H, W)
        w1h, w2h = w_hwio_from_cs(w1_, C, C), w_hwio_from_cs(w2_, C, C)
        wch = w_hwio_from_cs(wc_[None], C, C)[0]
        res = xn
        for i in range(L):
            r = jnp.maximum(conv3x3_reference(res, w1h[i], b1_[i]), 0)
            r = conv3x3_reference(r, w2h[i], b2_[i])
            r = ca_gate_reference(r, wd_[i], bd_[i], wu_[i], bu_[i])
            res = res + r
        out = conv3x3_reference(res, wch, bc_) + xn
        return jnp.sum(jnp.sin(nhwc_to_cs(out, k)))

    np.testing.assert_allclose(f_cs(args), f_ref(args), rtol=1e-4)
    g_cs = jax.grad(f_cs)(args)
    g_rf = jax.grad(f_ref)(args)
    names = ['dx', 'dw1', 'db1', 'dw2', 'db2', 'dwd', 'dbd', 'dwu',
             'dbu', 'dwc', 'dbc']
    for nm, a, b in zip(names, g_cs, g_rf):
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=nm)


@pytest.mark.slow
def test_rcan_cs_matches_default():
    """RCAN(use_pallas='cs') == the XLA branch given identical params."""
    from srtpu.models import create_model
    from srtpu.ops.cs_conv import w_cs_batch
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    kw = dict(scale_factor=2, n_feats=16, n_resblocks=2, n_resgroups=2,
              reduction=4)
    m_ref = create_model('RCAN', use_pallas=False, **kw)
    m_cs = create_model('RCAN', use_pallas='cs', **kw)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)
    p_cs = m_cs.init(jax.random.PRNGKey(0), x)
    pr = p_ref['params']
    pc = jax.tree_util.tree_map(lambda v: v, p_cs)

    for gi in range(2):
        rg, cg = pr[f'ResidualGroup_{gi}'], pc['params'][f'CSResidualGroup_{gi}']
        cg['w1'] = w_cs_batch(jnp.stack(
            [rg[f'RCAB_{i}']['Conv2d_0']['kernel'] for i in range(2)]))
        cg['b1'] = jnp.stack(
            [rg[f'RCAB_{i}']['Conv2d_0']['bias'] for i in range(2)])
        cg['w2'] = w_cs_batch(jnp.stack(
            [rg[f'RCAB_{i}']['Conv2d_1']['kernel'] for i in range(2)]))
        cg['b2'] = jnp.stack(
            [rg[f'RCAB_{i}']['Conv2d_1']['bias'] for i in range(2)])
        cg['wd'] = jnp.stack(
            [rg[f'RCAB_{i}']['CALayer_0']['Conv2d_0']['kernel'][0, 0]
             for i in range(2)])
        cg['bd'] = jnp.stack(
            [rg[f'RCAB_{i}']['CALayer_0']['Conv2d_0']['bias']
             for i in range(2)])
        cg['wu'] = jnp.stack(
            [rg[f'RCAB_{i}']['CALayer_0']['Conv2d_1']['kernel'][0, 0]
             for i in range(2)])
        cg['bu'] = jnp.stack(
            [rg[f'RCAB_{i}']['CALayer_0']['Conv2d_1']['bias']
             for i in range(2)])
        cg['wc'] = w_cs_batch(rg['Conv2d_0']['kernel'][None])[0]
        cg['bc'] = rg['Conv2d_0']['bias']
    pc['params']['Conv2d_0'] = pr['Conv2d_0']
    pc['params']['trunk_close_kernel'] = w_cs_batch(
        pr['Conv2d_1']['kernel'][None])[0]
    pc['params']['trunk_close_bias'] = pr['Conv2d_1']['bias']
    pc['params']['UpscaleBlock_0'] = pr['UpscaleBlock_0']
    pc['params']['Conv2d_1'] = pr['Conv2d_2']

    out_ref = m_ref.apply(p_ref, x)
    out_cs = m_cs.apply(pc, x)
    np.testing.assert_allclose(out_cs, out_ref, atol=1e-4)


@pytest.mark.slow
def test_upsample_cs_matches_conv_plus_shuffle():
    """Fused CS conv+pixel-shuffle == XLA conv + torch-order shuffle,
    values and gradients, for r=2 and r=3."""
    from srtpu.models.common import pixel_shuffle
    from srtpu.ops.cs_conv import upsample_cs, w_ps_cs, w_ps_hwio
    rng = np.random.default_rng(21)
    B, H, W, C = 4, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    for r in (2, 3):
        wh = jnp.asarray(rng.standard_normal((3, 3, C, C * r * r)) * 0.1,
                         jnp.float32)
        bh = jnp.asarray(rng.standard_normal((C * r * r,)) * 0.1,
                         jnp.float32)
        w_arr = w_ps_cs(wh, r)
        np.testing.assert_allclose(w_ps_hwio(w_arr, C, r), wh)  # roundtrip
        # phase-major bias: phase (a*r+b), channel c'
        b_arr = bh.reshape(C, r * r).T

        def f_cs(a):
            w_, b_ = a
            y = upsample_cs(x_cs, w_, b_, W, k, H, r)
            return y

        def f_ref(a):
            w_, b_ = a
            out = conv3x3_reference(x, w_ps_hwio(w_, C, r),
                                    jnp.transpose(b_, (1, 0)).reshape(-1))
            return nhwc_to_cs(pixel_shuffle(out, r), k)

        args = (w_arr, b_arr)
        y_cs = f_cs(args)
        y_rf = f_ref(args)
        np.testing.assert_allclose(y_cs, y_rf, atol=1e-4, err_msg=f'r={r}')

        g_cs = jax.grad(lambda a: jnp.sum(jnp.sin(f_cs(a))))(args)
        g_rf = jax.grad(lambda a: jnp.sum(jnp.sin(f_ref(a))))(args)
        for a, b in zip(g_cs, g_rf):
            np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f'r={r}')


# NOTE hw must satisfy the interleave alignment gate r*w*k % 128 == 0 for
# scales with interleave stages (4 and 8), else the tail silently takes
# the XLA fallback and the test compares the fallback to itself — the
# pm_calls spy below guards against exactly that (it caught the original
# hw=8 x4 case being vacuous).
@pytest.mark.parametrize('scale,n,hw', [(2, 16, 8), (3, 64, 8), (4, 16, 16),
                                        (8, 16, 16)])
@pytest.mark.slow
def test_cs_tail_phase_major_matches_fallback(monkeypatch, scale, n, hw):
    """CSUpscaleTail's CS path (phase-major last stage + phase-dense
    coarse final conv, pixel shuffle absorbed into the weights) vs its
    own XLA fallback (conv + pixel_shuffle + fine conv): values and all
    parameter gradients. scale=3 exercises r=3 phase geometry and the
    chunked wide-c paths (c_in = 9*64 = 576); scale=8 chains TWO lane
    interleave stages + regroups before the phase-major last stage
    (hw=16 so the r*w*k % 128 interleave alignment gate passes)."""
    import srtpu.ops.cs_conv as cs_mod
    from srtpu.models.common import CSUpscaleTail
    rng = np.random.default_rng(77)
    x = jnp.asarray(rng.standard_normal((4, hw, hw, n)) * 0.5, jnp.float32)
    m = CSUpscaleTail(scale_factor=scale, n_feats=n, channels=3)
    params = m.init(jax.random.PRNGKey(3), x)

    # spy: the pm-stage weight arrangement only runs on the CS path — a
    # gate regression would otherwise silently compare fallback to itself
    pm_calls = []
    real_w_pm_cs = cs_mod.w_pm_cs
    monkeypatch.setattr(cs_mod, 'w_pm_cs',
                        lambda *a: pm_calls.append(1) or real_w_pm_cs(*a))

    out_cs = m.apply(params, x)
    assert pm_calls, 'CS path was not taken (gate regression?)'
    g_cs = jax.grad(
        lambda p: jnp.sum(jnp.sin(m.apply(p, x))))(params)

    real_plan = cs_mod.cs_plan
    monkeypatch.setattr(cs_mod, 'cs_plan', lambda shape: None)
    out_ref = m.apply(params, x)
    g_ref = jax.grad(
        lambda p: jnp.sum(jnp.sin(m.apply(p, x))))(params)
    monkeypatch.setattr(cs_mod, 'cs_plan', real_plan)

    assert out_cs.shape == (4, hw * scale, hw * scale, 3)
    np.testing.assert_allclose(out_cs, out_ref, atol=2e-4)
    flat_cs = jax.tree_util.tree_leaves_with_path(g_cs)
    flat_rf = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    for path, leaf in flat_cs:
        np.testing.assert_allclose(
            leaf, flat_rf[path], atol=5e-3, rtol=1e-5,
            err_msg=f'scale={scale} grad {jax.tree_util.keystr(path)}')


@pytest.mark.parametrize('trunk', ['cs', 'cs2'])
@pytest.mark.slow
def test_rdn_trunk_cs_matches_xla(data, trunk):
    """RDN dense blocks vs plain XLA math: values and every gradient.
    'cs' = per-layer kernels (round 2); 'cs2' = fused whole-RDB kernels
    (round 3, the shipped path)."""
    from srtpu.ops.cs_conv import (conv3x3_reference, rdn_trunk_cs,
                                   rdn_trunk_cs2, w_cs_batch,
                                   w_hwio_from_cs)
    rng = np.random.default_rng(31)
    B, H, W = 4, 8, 8
    G0, C, D = 16, 3, 2
    x = jnp.asarray(rng.standard_normal((B, H, W, G0)), jnp.float32)
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    ws = tuple(w_cs_batch(mk(D, 3, 3, G0 * (i + 1), G0))
               for i in range(C))
    bs = tuple(mk(D, G0) for _ in range(C))
    wfs = mk(D, G0, G0 * (C + 1))
    bfs = mk(D, G0)
    args = (x_cs, ws, bs, wfs, bfs)

    trunk_fn = rdn_trunk_cs if trunk == 'cs' else rdn_trunk_cs2

    def f_cs(a):
        outs = trunk_fn(a[0], a[1], a[2], a[3], a[4], W, k)
        return sum(jnp.sum(jnp.sin(o * (j + 1))) for j, o in enumerate(outs))

    def f_ref(a):
        xc, ws_, bs_, wfs_, bfs_ = a
        xn = cs_to_nhwc(xc, k, H, W)
        whs = [w_hwio_from_cs(ws_[i], G0 * (i + 1), G0) for i in range(C)]
        acc, xcur = 0.0, xn
        for l in range(D):
            feats = xcur
            for i in range(C):
                o = conv3x3_reference(feats, whs[i][l], bs_[i][l])
                feats = jnp.concatenate([feats, jnp.maximum(o, 0)], axis=-1)
            fused = jnp.einsum('bhwc,oc->bhwo', feats, wfs_[l]) + bfs_[l]
            xcur = fused + xcur
            acc = acc + jnp.sum(jnp.sin(nhwc_to_cs(xcur, k) * (l + 1)))
        return acc

    np.testing.assert_allclose(f_cs(args), f_ref(args), rtol=1e-4)
    g_cs = jax.grad(f_cs)(args)
    g_rf = jax.grad(f_ref)(args)
    flat_cs = jax.tree_util.tree_leaves(g_cs)
    flat_rf = jax.tree_util.tree_leaves(g_rf)
    assert len(flat_cs) == len(flat_rf)
    for a, b in zip(flat_cs, flat_rf):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_wide_cin_conv_bwd_chunked():
    """Rectangular conv backward with c_in>128 (the chunked convT/dW path
    used by RDN-B's wide dense layers) matches XLA gradients."""
    from srtpu.ops.cs_conv import conv3x3_cs_pre, w_cs
    rng = np.random.default_rng(41)
    B, H, W, CI, CO = 2, 8, 8, 192, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, CI)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CI, CO)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((CO,)) * 0.1, jnp.float32)
    k, _ = cs_plan((B, H, W, 16))
    x_cs = nhwc_to_cs(x, k)

    def f_cs(a):
        return jnp.sum(jnp.sin(conv3x3_cs_pre(x_cs if a[2] is None else a[2],
                                              w_cs(a[0]), a[1], W, k)))

    def f_ref(a):
        return jnp.sum(jnp.sin(nhwc_to_cs(
            conv3x3_reference(x, a[0], a[1]), k)))

    np.testing.assert_allclose(f_cs((w, b, None)), f_ref((w, b)), rtol=1e-4)
    g_cs = jax.grad(lambda a: f_cs((a[0], a[1], a[2])))((w, b, x_cs))
    g_rf = jax.grad(lambda a: f_ref(a))((w, b))
    np.testing.assert_allclose(g_cs[0], g_rf[0], atol=2e-3)
    np.testing.assert_allclose(g_cs[1], g_rf[1], atol=2e-3)
    # dx through the chunked convT
    gx = jax.grad(lambda xc: jnp.sum(jnp.sin(
        conv3x3_cs_pre(xc, w_cs(w), b, W, k))))(x_cs)
    gx_ref = jax.grad(lambda xn: jnp.sum(jnp.sin(nhwc_to_cs(
        conv3x3_reference(xn, w, b), k))))(x)
    np.testing.assert_allclose(gx, nhwc_to_cs(gx_ref, k), atol=2e-3)


@pytest.mark.slow
def test_rdn_cs_matches_default(monkeypatch):
    """RDN(use_pallas='cs') == RDN(use_pallas=False) given identical
    params ('cs' is the model default since round 3)."""
    import srtpu.models.rdn as rdn_mod
    from srtpu.models import create_model
    from srtpu.ops.cs_conv import w_cs, w_cs_batch
    monkeypatch.setitem(rdn_mod.RDN_CONFIGS, 'T', (2, 2, 16))
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    kw = dict(scale_factor=2, rdn_config='T', growth0=16)
    m_ref = create_model('RDN', use_pallas=False, **kw)
    m_cs = create_model('RDN', use_pallas='cs', **kw)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)
    p_cs = m_cs.init(jax.random.PRNGKey(0), x)
    pr = p_ref['params']
    pc = jax.tree_util.tree_map(lambda v: v, p_cs)
    cp = pc['params']

    cp['Conv2d_0'] = pr['Conv2d_0']                       # f1 / SFE1
    cp['sfe2_kernel'] = w_cs(pr['Conv2d_1']['kernel'])
    cp['sfe2_bias'] = pr['Conv2d_1']['bias']
    D, C, G = 2, 2, 16
    for i in range(C):
        cp[f'dense{i}_kernel'] = w_cs_batch(jnp.stack(
            [pr[f'_RDB_{l}'][f'Conv2d_{i}']['kernel'] for l in range(D)]))
        cp[f'dense{i}_bias'] = jnp.stack(
            [pr[f'_RDB_{l}'][f'Conv2d_{i}']['bias'] for l in range(D)])
    cp['lff_kernel'] = jnp.stack(
        [pr[f'_RDB_{l}'][f'Conv2d_{C}']['kernel'][0, 0].T
         for l in range(D)])
    cp['lff_bias'] = jnp.stack(
        [pr[f'_RDB_{l}'][f'Conv2d_{C}']['bias'] for l in range(D)])
    cp['gff1_kernel'] = pr['Conv2d_2']['kernel'][0, 0].T
    cp['gff1_bias'] = pr['Conv2d_2']['bias']
    cp['gff2_kernel'] = w_cs(pr['Conv2d_3']['kernel'])
    cp['gff2_bias'] = pr['Conv2d_3']['bias']
    # tail convs: same module order in both branches after the trunk
    for nc, nr in [('Conv2d_1', 'Conv2d_4'), ('Conv2d_2', 'Conv2d_5')]:
        if nr in pr:
            cp[nc] = pr[nr]

    out_ref = m_ref.apply(p_ref, x)
    out_cs = m_cs.apply(pc, x)
    np.testing.assert_allclose(out_cs, out_ref, atol=1e-4)


def test_cs_plan_fallbacks():
    assert cs_plan((16, 32, 32, 64)) == (4, 4)       # flagship shape
    assert cs_plan((1, 200, 200, 64)) is None        # too big for VMEM
    assert cs_plan((2, 8, 8, 12)) is None            # C % 16 != 0
    k, g = cs_plan((16, 64, 64, 64))                 # x2 LR patches
    assert k * g == 16 and k >= 1


def test_dead_lane_padding_rejects_wide_kernels():
    """cs_plan_pad's one-dead-row guarantee covers only kk=3's dy=+/-1
    taps; a kk>=5 conv with s_valid set would wrap valid data into valid
    lanes — the kernels must refuse rather than silently corrupt."""
    from srtpu.ops.cs_conv import conv3x3_cs_bwd, conv3x3_cs_fwd
    x = jnp.zeros((1, 16, 256), jnp.float32)
    w5 = jnp.zeros((5 * 16, 5 * 16), jnp.float32)
    b = jnp.zeros((16, 1), jnp.float32)
    with pytest.raises(ValueError, match='kk=3'):
        conv3x3_cs_fwd(x, w5, b, 16, 1, kk=5, s_valid=224)
    with pytest.raises(ValueError, match='kk=3'):
        conv3x3_cs_bwd(x, x, w5, 16, 1, kk=5, s_valid=224)
    # kk=3 with s_valid stays accepted (the live padded path)
    from srtpu.ops.cs_conv import cs_plan_pad
    plan = cs_plan_pad((4, 42, 42, 16))
    assert plan is not None and plan[2] % 128 == 0


def test_edsr_cs_matches_default():
    """EDSR(use_pallas='cs') == the XLA branch given identical param values."""
    from srtpu.models import create_model
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    kw = dict(scale_factor=2, n_feats=16, n_resblocks=2)
    m_ref = create_model('EDSR', use_pallas=False, **kw)
    m_cs = create_model('EDSR', use_pallas='cs', **kw)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)
    p_cs = m_cs.init(jax.random.PRNGKey(0), x)

    # graft the reference param values into the CS tree
    pr = p_ref['params']
    pc = jax.tree_util.tree_map(lambda v: v, p_cs)  # copy
    from srtpu.ops.cs_conv import w_cs_batch
    trunk = pc['params']['CSTrunk_0']
    trunk['w1'] = w_cs_batch(jnp.stack(
        [pr[f'ResBlock_{i}']['Conv2d_0']['kernel'] for i in range(2)]))
    trunk['b1'] = jnp.stack(
        [pr[f'ResBlock_{i}']['Conv2d_0']['bias'] for i in range(2)])
    trunk['w2'] = w_cs_batch(jnp.stack(
        [pr[f'ResBlock_{i}']['Conv2d_1']['kernel'] for i in range(2)]))
    trunk['b2'] = jnp.stack(
        [pr[f'ResBlock_{i}']['Conv2d_1']['bias'] for i in range(2)])
    trunk['close_kernel'] = pr['Conv2d_1']['kernel']
    trunk['close_bias'] = pr['Conv2d_1']['bias']
    pc['params']['Conv2d_0'] = pr['Conv2d_0']
    # tail: UpscaleBlock conv -> phase-major CS; final conv -> CS
    from srtpu.ops.cs_conv import w_cs as _w_cs
    from srtpu.ops.cs_conv import w_ps_cs
    tail = pc['params']['CSUpscaleTail_0']
    up = pr['UpscaleBlock_0']['Conv2d_0']
    tail['up0_kernel'] = w_ps_cs(up['kernel'], 2)
    tail['up0_bias'] = up['bias'].reshape(16, 4).T
    fin = pr['Conv2d_2']
    tail['final_kernel'] = _w_cs(fin['kernel'])
    tail['final_bias'] = fin['bias']

    out_ref = m_ref.apply(p_ref, x)
    out_cs = m_cs.apply(pc, x)
    np.testing.assert_allclose(out_cs, out_ref, atol=1e-4)


@pytest.mark.parametrize('c', [16, 64])
def test_wdsr_block_cs_matches_xla(c):
    """WDSR-B fused CS block (1x1 expand + relu + 1x1 linear + 3x3 conv
    + skip, one kernel per direction, in-kernel h1 recompute backward)
    vs explicit XLA math: values and all gradients. c=64 exercises the
    chunked dh1 path (6C = 384 -> 3 chunks)."""
    from srtpu.ops.cs_conv import (conv3x3_reference, cs_plan_s,
                                   cs_to_nhwc, nhwc_to_cs)
    from srtpu.ops.wdsr_cs import wdsr_block_cs, wdsr_lp

    rng = np.random.default_rng(51)
    B, H, W = 2, 8, 8
    e = 6 * c
    lv, lp = wdsr_lp(c)
    x = jnp.asarray(rng.standard_normal((B, H, W, c)) * 0.5, jnp.float32)

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    w1, b1 = mk(e, c), mk(e)
    w2, b2 = mk(lv, e), mk(lv)
    w3, b3 = mk(3, 3, lv, c), mk(c)
    rs = 0.8
    k, _ = cs_plan_s(x.shape, 1024, 1088)
    args = (x, w1, b1, w2, b2, w3, b3)

    def f_cs(a):
        xn, w1_, b1_, w2_, b2_, w3_, b3_ = a
        w2p = jnp.pad(w2_, ((0, lp - lv), (0, 0)))
        b2p = jnp.pad(b2_, (0, lp - lv))
        w3p = jnp.pad(w3_, ((0, 0), (0, 0), (0, lp - lv), (0, 0)))
        out = wdsr_block_cs(nhwc_to_cs(xn, k), w1_, b1_, w2p, b2p,
                            w3p, b3_, rs, W, k)
        return jnp.sum(jnp.sin(cs_to_nhwc(out, k, H, W)))

    def f_ref(a):
        xn, w1_, b1_, w2_, b2_, w3_, b3_ = a
        h1 = jax.nn.relu(xn @ w1_.T + b1_)
        h2 = h1 @ w2_.T + b2_
        res = conv3x3_reference(h2, w3_, b3_)
        return jnp.sum(jnp.sin(res * rs + xn))

    np.testing.assert_allclose(f_cs(args), f_ref(args), rtol=2e-4)
    g_cs = jax.grad(f_cs)(args)
    g_rf = jax.grad(f_ref)(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_cs),
                    jax.tree_util.tree_leaves(g_rf)):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_wdsr_model_cs_matches_xla_fallback():
    """WDSR(use_pallas='cs') kernels == the same model's XLA fallback math
    (identical param tree) — the product guarantee that train (kernels)
    and large-image eval (fallback) agree."""
    from srtpu.models import create_model

    rng = np.random.default_rng(52)
    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    kw = dict(scale_factor=2, block_type='B', n_feats=64, n_resblocks=2)
    m = create_model('WDSR', use_pallas='cs', **kw)
    params = m.init(jax.random.PRNGKey(0), x)['params']
    y_kernel = m.apply({'params': params}, x)

    # force the fallback by making the plan fail (env off)
    import os
    os.environ['SRTPU_CS_OFF_TPU'] = '0'
    try:
        y_fallback = m.apply({'params': params}, x)
    finally:
        os.environ['SRTPU_CS_OFF_TPU'] = '1'
    np.testing.assert_allclose(np.asarray(y_kernel),
                               np.asarray(y_fallback), atol=2e-5)


@pytest.mark.slow
def test_trunk_mega_matches_trunk(data):
    """Mega-trunk (one pallas_call per direction, grid (G, L)) is
    value- and gradient-identical to the per-block trunk_cs."""
    from srtpu.ops.cs_conv import trunk_cs, trunk_cs_mega, w_cs_batch

    x, w1, b1, w2, b2 = data
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)
    L = 3
    rng = np.random.default_rng(17)
    w1s = w_cs_batch(jnp.asarray(
        rng.standard_normal((L, 3, 3, 16, 16)) * 0.1, jnp.float32))
    b1s = jnp.asarray(rng.standard_normal((L, 16)) * 0.1, jnp.float32)
    w2s = w_cs_batch(jnp.asarray(
        rng.standard_normal((L, 3, 3, 16, 16)) * 0.1, jnp.float32))
    b2s = jnp.asarray(rng.standard_normal((L, 16)) * 0.1, jnp.float32)

    def loss(fn, inp):
        return jnp.sum(jnp.sin(fn(*inp, 0.3, 8, k)))

    args = (x_cs, w1s, b1s, w2s, b2s)
    np.testing.assert_allclose(loss(trunk_cs_mega, args),
                               loss(trunk_cs, args), atol=1e-4)
    g_mega = jax.grad(lambda a: loss(trunk_cs_mega, a))(args)
    g_ref = jax.grad(lambda a: loss(trunk_cs, a))(args)
    for a, b in zip(g_mega, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_aligned_shift_path():
    """wk % 128 == 0 takes the zero-fill concat fast path — parity with
    the masked-roll path on an aligned shape (w_img*k = 128)."""
    rng = np.random.default_rng(23)
    B, H, W, C = 8, 8, 16, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    k, _ = cs_plan(x.shape)
    assert (W * k) % 128 == 0, f'want aligned wk, got {W * k}'

    def loss_cs(p):
        return jnp.sum(jnp.sin(conv3x3_cs(nhwc_to_cs(x, k), p[0], p[1],
                                          W, k)))

    def loss_ref(p):
        return jnp.sum(jnp.sin(nhwc_to_cs(conv3x3_reference(x, *p), k)))

    np.testing.assert_allclose(loss_cs((w1, b1)), loss_ref((w1, b1)),
                               atol=1e-3)
    g_cs = jax.grad(loss_cs)((w1, b1))
    g_rf = jax.grad(loss_ref)((w1, b1))
    for a, b in zip(g_cs, g_rf):
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.parametrize('kk,c_in,c_out', [(5, 16, 32), (9, 16, 16),
                                           (5, 256, 16)])
def test_conv_kxk_cs_parity(kk, c_in, c_out):
    """Generalized kxk CS conv (tap count inferred from HWIO weight):
    values + all gradients vs the XLA SAME conv, incl. the wide-c_in
    chunked backward (c=256). Serves the SRResNet 9x9 output conv
    (reference models/srresnet.py:33) via the 5x5 phase-dense lowering."""
    rng = np.random.default_rng(29)
    B, H, W = 4, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, c_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kk, kk, c_in, c_out)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((c_out,)) * 0.1, jnp.float32)
    k, _ = cs_plan(x.shape)
    xc = nhwc_to_cs(x, k)
    gt = jnp.asarray(rng.standard_normal((B, H, W, c_out)), jnp.float32)

    def loss_cs(xc, w, b):
        return jnp.sum(cs_to_nhwc(conv3x3_cs(xc, w, b, W, k), k, H, W) * gt)

    def loss_rf(x, w, b):
        return jnp.sum(conv3x3_reference(x, w, b) * gt)

    np.testing.assert_allclose(loss_cs(xc, w, b), loss_rf(x, w, b),
                               rtol=1e-5)
    gc = jax.grad(loss_cs, (0, 1, 2))(xc, w, b)
    gr = jax.grad(loss_rf, (0, 1, 2))(x, w, b)
    np.testing.assert_allclose(cs_to_nhwc(gc[0], k, H, W), gr[0], atol=1e-4)
    np.testing.assert_allclose(gc[1], gr[1], atol=1e-3)
    np.testing.assert_allclose(gc[2], gr[2], atol=1e-3)


@pytest.mark.parametrize('fk,r', [(9, 2), (9, 3), (3, 4)])
def test_phase_dense_general(fk, r):
    """w_phase_dense for general fine kernel sizes: the fk x fk fine conv
    over an r-phase-major layout == ck x ck coarse conv (5x5 for the
    SRResNet 9x9/r=2 case; the EDSR 3x3/r=4 case unchanged)."""
    from srtpu.ops.cs_conv import pm_to_nhwc, w_phase_dense

    rng = np.random.default_rng(31)
    B, H, W, C, ch = 4, 8, 8, 64, 3
    fine = jnp.asarray(rng.standard_normal((B, H * r, W * r, C)),
                       jnp.float32)
    wf = jnp.asarray(rng.standard_normal((fk, fk, C, ch)) * 0.1,
                     jnp.float32)
    bf = jnp.asarray(rng.standard_normal((ch,)), jnp.float32)
    k, g = cs_plan((B, H, W, r * r * C))
    y = fine.reshape(g, k, H, r, W, r, C)
    y_pm = jnp.transpose(y, (0, 3, 5, 6, 2, 1, 4)) \
        .reshape(g, r * r * C, H * k * W)
    wpd = w_phase_dense(wf, r)
    bpd = jnp.concatenate(
        [jnp.tile(bf, r * r),
         jnp.zeros(wpd.shape[3] - r * r * ch, bf.dtype)])
    out = pm_to_nhwc(conv3x3_cs(y_pm, wpd, bpd, W, k), r, ch, k, H, W)
    np.testing.assert_allclose(out, conv3x3_reference(fine, wf, bf),
                               atol=1e-4)


@pytest.mark.slow
def test_cs_upscale_tail_srresnet_parity(monkeypatch):
    """CSUpscaleTail(act=PReLU, final_ksize=9) — the SRResNet tail — CS
    kernel path == XLA fallback on the same params, fwd + grads (two-stage
    x4: interleave stage + PReLU, phase-major stage + PReLU, 9x9 output
    conv as a 5x5 phase-dense coarse conv)."""
    from srtpu.models.common import CSUpscaleTail, PReLU
    from srtpu.ops import cs_conv

    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 16)), jnp.float32)
    tail = CSUpscaleTail(scale_factor=4, n_feats=16, channels=3,
                         act=PReLU, final_ksize=9)
    vs = tail.init(jax.random.PRNGKey(0), x)
    assert 'up0_alpha' in vs['params'] and 'up1_alpha' in vs['params']
    pm_calls = []
    real_w_pm_cs = cs_conv.w_pm_cs
    monkeypatch.setattr(cs_conv, 'w_pm_cs',
                        lambda *a: pm_calls.append(1) or real_w_pm_cs(*a))
    out_cs = tail.apply(vs, x)
    assert pm_calls, 'CS path was not taken (gate regression?)'
    gt = jnp.asarray(rng.standard_normal(out_cs.shape), jnp.float32)

    def loss(p):
        return jnp.sum(tail.apply({'params': p}, x) * gt)

    g_cs = jax.grad(loss)(vs['params'])
    monkeypatch.setattr(cs_conv, 'cs_plan', lambda shape: None)
    out_rf = tail.apply(vs, x)
    g_rf = jax.grad(loss)(vs['params'])
    np.testing.assert_allclose(out_cs, out_rf, atol=1e-5)
    for pth, a in jax.tree_util.tree_leaves_with_path(g_cs):
        b = g_rf
        for kp in pth:
            b = b[kp.key]
        np.testing.assert_allclose(a, b, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(pth))

def test_cs_trunk_wide_channels_use_xla_fallback(monkeypatch):
    """cs_plan has no upper channel bound, but CSTrunk must not route
    full-lane configs (n_feats > 96) onto the CS kernels: the mega
    backward's resident (L, 3C, 3C) f32 dW accumulators blow the 40 MB
    Mosaic VMEM budget at e.g. EDSR-full 256f/32b (151 MB), and at
    full lanes XLA wins anyway (WDSR-B 128f negative, PERF.md)."""
    import srtpu.ops.cs_conv as cs

    def boom(*a, **k):
        raise AssertionError('CS kernels must not run at wide channels')

    monkeypatch.setattr(cs, 'trunk_cs_mega', boom)
    monkeypatch.setattr(cs, 'trunk_cs', boom)
    from srtpu.models.common import CSTrunk
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 128)),
                    jnp.float32)
    m = CSTrunk(n_feats=128, n_resblocks=2)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)   # must take the XLA fallback
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_cs_trunk_per_block_budget_fallback(monkeypatch):
    """Over the mega accumulator budget the trunk routes to the per-block
    trunk_cs path — identical math, block-sized working sets."""
    import srtpu.models.common as common
    from srtpu.models.common import CSTrunk
    x = jnp.asarray(np.random.default_rng(1).random((2, 8, 8, 16)),
                    jnp.float32)
    m = CSTrunk(n_feats=16, n_resblocks=2)
    p = m.init(jax.random.PRNGKey(0), x)
    out_mega = m.apply(p, x)

    def loss(params, mod=m):
        return jnp.sum(jnp.sin(mod.apply(params, x)))

    g_mega = jax.grad(loss)(p)
    monkeypatch.setattr(common, '_MEGA_ACC_BUDGET', 0)
    out_blocks = m.apply(p, x)
    g_blocks = jax.grad(loss)(p)
    np.testing.assert_allclose(np.asarray(out_blocks),
                               np.asarray(out_mega), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_blocks),
                    jax.tree_util.tree_leaves(g_mega)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# dead-lane padded packings (cs_plan_pad): lane-unaligned S support
# ---------------------------------------------------------------------------
#
# Scale-3 shapes (42x42 LR) have S = H*W*k that is NEVER a 128 multiple,
# which Mosaic rejects (PERF.md round 3). cs_plan_pad packs with a
# zero-padded dead-lane tail instead; kernels re-zero the tail on every
# output write so SAME-padding semantics stay exact across chained
# kernels. These tests pin values AND gradients against the XLA
# reference on an unaligned 6x6 shape (S = 144 -> padded 256).


@pytest.fixture(scope='module')
def pad_data():
    rng = np.random.default_rng(11)
    B, H, W, C = 4, 6, 6, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_cs_plan_pad_shapes(pad_data):
    from srtpu.ops.cs_conv import cs_plan_pad
    x = pad_data[0]
    assert cs_plan(x.shape) is None          # 144*k never 128-aligned
    k, g, s_pad = cs_plan_pad(x.shape)
    assert g * k == x.shape[0]
    s_real = 6 * 6 * k
    assert s_pad % 128 == 0 and s_pad >= s_real + 6 * k
    # aligned shapes must NOT take the padded path
    assert cs_plan_pad((16, 8, 8, 16)) is None


def test_padded_layout_roundtrip(pad_data):
    from srtpu.ops.cs_conv import cs_plan_pad
    x = pad_data[0]
    k, g, s_pad = cs_plan_pad(x.shape)
    x_cs = nhwc_to_cs(x, k, s_pad)
    assert x_cs.shape == (g, x.shape[3], s_pad)
    np.testing.assert_array_equal(np.asarray(x_cs[:, :, 6 * 6 * k:]), 0)
    np.testing.assert_array_equal(cs_to_nhwc(x_cs, k, 6, 6), x)


def test_padded_conv_fwd_and_grads(pad_data):
    from srtpu.ops.cs_conv import cs_plan_pad
    x, w1, b1, *_ = pad_data
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = 6 * 6 * k

    def f_cs(x_, w_, b_):
        y = conv3x3_cs(nhwc_to_cs(x_, k, s_pad), w_, b_, 6, k, s_valid)
        return cs_to_nhwc(y, k, 6, 6)

    got = f_cs(x, w1, b1)
    ref = conv3x3_reference(x, w1, b1)
    np.testing.assert_allclose(got, ref, atol=1e-4)

    loss_cs = lambda *a: jnp.sum(jnp.sin(f_cs(*a)))
    loss_ref = lambda *a: jnp.sum(jnp.sin(conv3x3_reference(*a)))
    g_cs = jax.grad(loss_cs, argnums=(0, 1, 2))(x, w1, b1)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, b1)
    for a, b in zip(g_cs, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize('mega', [False, True])
def test_padded_trunk_matches_xla(pad_data, mega):
    from srtpu.ops.cs_conv import (cs_plan_pad, trunk_cs, trunk_cs_mega,
                                   w_cs)
    x, w1, b1, w2, b2 = pad_data
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = 6 * 6 * k
    w1s = w_cs(w1)[None]
    w2s = w_cs(w2)[None]
    trunk = trunk_cs_mega if mega else trunk_cs

    def f_cs(x_, w1s_, b1_, w2s_, b2_):
        y = trunk(nhwc_to_cs(x_, k, s_pad), w1s_, b1_[None], w2s_,
                  b2_[None], 0.7, 6, k, s_valid)
        return cs_to_nhwc(y, k, 6, 6)

    got = f_cs(x, w1s, b1, w2s, b2)
    ref = _rb_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(got, ref, atol=1e-4)

    loss_cs = lambda *a: jnp.sum(jnp.sin(f_cs(*a)))
    g_cs = jax.grad(loss_cs, argnums=(0, 2, 4))(x, w1s, b1, w2s, b2)

    def loss_ref(x_, b1_, b2_):
        return jnp.sum(jnp.sin(_rb_ref(x_, w1, b1_, w2, b2_)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, b1, b2)
    for a, b in zip(g_cs, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_padded_tail_fk1_falls_back_to_xla(monkeypatch):
    """final_ksize=1 computes a coarse tap span ck=1; the padded-path gate
    must NOT admit it (the kernels reject s_valid with kk != 3), so an
    unaligned shape routes to the XLA fallback instead of crashing at
    trace time (round-4 review finding)."""
    import srtpu.ops.cs_conv as cs
    from srtpu.models.common import CSUpscaleTail
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 6, 6, 64)) * 0.3,
        jnp.float32)
    m = CSUpscaleTail(scale_factor=2, n_feats=64, final_ksize=1)
    p = m.init(jax.random.PRNGKey(0), x)
    assert cs.cs_plan(x.shape) is None       # unaligned: plain plan fails
    called = []
    real = cs.cs_plan_pad
    monkeypatch.setattr(cs, 'cs_plan_pad',
                        lambda s: called.append(1) or real(s))
    out = m.apply(p, x)                      # must not raise
    assert out.shape == (4, 12, 12, 3)
    assert not called, 'fk=1 must not consult the padded path (ck != 3)'


@pytest.mark.slow
def test_padded_tail_x3_matches_xla_fallback(monkeypatch):
    """CSUpscaleTail at scale 3 on a lane-unaligned shape (the canonical
    x3 recipe class: S never 128-aligned) takes the dead-lane padded
    kernel path — single pm stage + phase-dense 3x3 final conv, both
    honoring s_valid — and matches the XLA fallback in values and
    gradients (VERDICT round 3 #3: no more x3 CS gap)."""
    import srtpu.ops.cs_conv as cs
    from srtpu.models.common import CSUpscaleTail
    # n_feats=64: the x3 pm stage needs r^2*C % 64 == 0
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((4, 6, 6, 64)) * 0.3,
        jnp.float32)
    m = CSUpscaleTail(scale_factor=3, n_feats=64)
    p = m.init(jax.random.PRNGKey(0), x)

    assert cs.cs_plan(x.shape) is None       # unaligned: plain plan fails
    taken = []
    real = cs.cs_plan_pad
    monkeypatch.setattr(cs, 'cs_plan_pad',
                        lambda s: taken.append(1) or real(s))
    out_cs = m.apply(p, x)
    assert taken, 'padded CS tail path was not consulted'
    assert out_cs.shape == (4, 18, 18, 3)

    monkeypatch.setattr(cs, 'cs_plan_pad', lambda s: None)
    out_xla = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_cs), np.asarray(out_xla),
                               atol=1e-4)

    monkeypatch.setattr(cs, 'cs_plan_pad', real)
    g_cs = jax.grad(lambda q: jnp.sum(jnp.sin(m.apply(q, x))))(p)
    monkeypatch.setattr(cs, 'cs_plan_pad', lambda s: None)
    g_xla = jax.grad(lambda q: jnp.sum(jnp.sin(m.apply(q, x))))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_cs),
                    jax.tree_util.tree_leaves(g_xla)):
        # rtol covers the large-magnitude bias grads (~1e3), where f32
        # accumulation order alone moves the last few ulps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_padded_seam_x3_edsr_end_to_end(monkeypatch):
    """EDSR x3 (default use_pallas='cs') on an unaligned shape runs the
    padded trunk AND the padded tail through the emit_cs seam — the CS
    buffer (with its dead-lane tail) passes trunk->tail without an
    NHWC round trip — and matches the XLA formulation."""
    import srtpu.ops.cs_conv as cs
    from srtpu.models import create_model
    x = jnp.asarray(
        np.random.default_rng(9).random((4, 6, 6, 3)), jnp.float32)
    kw = dict(scale_factor=3, n_feats=64, n_resblocks=1)
    m_cs = create_model('EDSR', **kw)           # default 'cs'
    p = m_cs.init(jax.random.PRNGKey(0), x)

    converts = []
    real_to_nhwc = cs.cs_to_nhwc
    monkeypatch.setattr(cs, 'cs_to_nhwc',
                        lambda *a: converts.append(1) or real_to_nhwc(*a))
    out_cs = m_cs.apply(p, x)
    assert out_cs.shape == (4, 18, 18, 3)
    assert not converts, 'seam fell back to an NHWC round trip'

    # XLA formulation with identical param VALUES via the layout converter
    monkeypatch.setattr(cs, 'cs_plan_pad', lambda s: None)
    monkeypatch.setattr(cs, 'cs_plan', lambda s, *a: None)
    out_xla = m_cs.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_cs), np.asarray(out_xla),
                               atol=2e-4)


def test_padded_cs_trunk_module_matches_xla_fallback(monkeypatch):
    """CSTrunk on an unaligned shape takes the padded CS path and matches
    the XLA fallback (same params) in values and gradients."""
    import srtpu.ops.cs_conv as cs
    from srtpu.models.common import CSTrunk
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 6, 6, 16)),
                    jnp.float32)
    m = CSTrunk(n_feats=16, n_resblocks=2, res_scale=0.8)
    p = m.init(jax.random.PRNGKey(0), x)

    taken = []
    real = cs.cs_plan_pad
    monkeypatch.setattr(cs, 'cs_plan_pad',
                        lambda s: taken.append(1) or real(s))
    out_cs = m.apply(p, x)
    assert taken, 'padded CS path was not consulted'

    monkeypatch.setattr(cs, 'cs_plan_pad', lambda s: None)
    out_xla = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_cs), np.asarray(out_xla),
                               atol=1e-4)

    monkeypatch.setattr(cs, 'cs_plan_pad', real)
    g_cs = jax.grad(lambda q: jnp.sum(jnp.sin(m.apply(q, x))))(p)
    monkeypatch.setattr(cs, 'cs_plan_pad', lambda s: None)
    g_xla = jax.grad(lambda q: jnp.sum(jnp.sin(m.apply(q, x))))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_cs),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_path_log_records_gate_decisions(monkeypatch):
    """cs_conv.PATH_LOG: every CS module records which path its gate took
    at trace time — tools/scale_sweep.py and the zoo x scale table read
    this instead of inferring fallbacks from throughput (VERDICT r4 #8)."""
    import jax
    import jax.numpy as jnp

    from srtpu.models import create_model
    from srtpu.ops import cs_conv

    x = jnp.zeros((2, 8, 8, 3))

    monkeypatch.setenv('SRTPU_CS_OFF_TPU', '1')
    cs_conv.PATH_LOG.clear()
    model = create_model('EDSR', scale_factor=2, n_feats=16, n_resblocks=1)
    model.init(jax.random.PRNGKey(0), x)
    assert cs_conv.PATH_LOG.get(('CSTrunk', (2, 8, 8, 16))) == 'cs'
    assert cs_conv.PATH_LOG.get(('CSUpscaleTail', (2, 8, 8, 16))) == 'cs'

    monkeypatch.delenv('SRTPU_CS_OFF_TPU')
    cs_conv.PATH_LOG.clear()
    model.init(jax.random.PRNGKey(0), x)
    assert cs_conv.PATH_LOG.get(('CSTrunk', (2, 8, 8, 16))) == 'xla'
    assert cs_conv.PATH_LOG.get(('CSUpscaleTail', (2, 8, 8, 16))) == 'xla'


def test_resgroup_ca_cs_padded_matches_xla():
    """RCAN residual group on a dead-lane padded plan (cs_plan_pad, the
    scale-3 42x42 recipe class): the CA segment pools must mask the pad
    tail out of every per-image mean and use the REAL pixel count —
    values and all gradients vs plain XLA math on an unaligned 6x6."""
    from srtpu.ops.cs_conv import (ca_gate_reference, cs_plan_pad,
                                   resgroup_ca_cs, w_cs_batch,
                                   w_hwio_from_cs)
    rng = np.random.default_rng(21)
    B, H, W, C, L, R = 4, 6, 6, 16, 2, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    assert cs_plan(x.shape) is None
    k, _, s_pad = cs_plan_pad(x.shape)
    s_valid = H * W * k
    x_cs = nhwc_to_cs(x, k, s_pad)

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    w1 = w_cs_batch(mk(L, 3, 3, C, C))
    b1, b2 = mk(L, C), mk(L, C)
    w2 = w_cs_batch(mk(L, 3, 3, C, C))
    wd, bd = mk(L, C, C // R), mk(L, C // R)
    wu, bu = mk(L, C // R, C, s=0.5), mk(L, C)
    wc = w_cs_batch(mk(1, 3, 3, C, C))[0]
    bc = mk(C)
    args = (x_cs, w1, b1, w2, b2, wd, bd, wu, bu, wc, bc)

    # loss converts CS -> NHWC first: the production contract is that
    # cotangents entering CS backward kernels are zero on the pad tail
    # (cs_to_nhwc's VJP / every kernel's zpadded dx maintain it)
    def f_cs(a):
        out = resgroup_ca_cs(*a, H, W, k, s_valid)
        return jnp.sum(jnp.sin(cs_to_nhwc(out, k, H, W)))

    def f_ref(a):
        xc, w1_, b1_, w2_, b2_, wd_, bd_, wu_, bu_, wc_, bc_ = a
        xn = cs_to_nhwc(xc, k, H, W)
        w1h, w2h = w_hwio_from_cs(w1_, C, C), w_hwio_from_cs(w2_, C, C)
        wch = w_hwio_from_cs(wc_[None], C, C)[0]
        res = xn
        for i in range(L):
            r = jnp.maximum(conv3x3_reference(res, w1h[i], b1_[i]), 0)
            r = conv3x3_reference(r, w2h[i], b2_[i])
            r = ca_gate_reference(r, wd_[i], bd_[i], wu_[i], bu_[i])
            res = res + r
        out = conv3x3_reference(res, wch, bc_) + xn
        return jnp.sum(jnp.sin(out))

    np.testing.assert_allclose(f_cs(args), f_ref(args), rtol=1e-4)
    g_cs = jax.grad(f_cs)(args)
    g_rf = jax.grad(f_ref)(args)
    names = ['dx', 'dw1', 'db1', 'dw2', 'db2', 'dwd', 'dbd', 'dwu',
             'dbu', 'dwc', 'dbc']
    for nm, a, b in zip(names, g_cs, g_rf):
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=nm)


def test_rcan_trunk_padded_path_consulted_and_matches(monkeypatch):
    """RCAN._cs_trunk on an unaligned shape takes cs_plan_pad (the x3
    recipe) and matches the XLA fallback in values and gradients."""
    from srtpu.models import create_model
    from srtpu.ops import cs_conv

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.random((4, 6, 6, 3)), jnp.float32)
    m = create_model('RCAN', scale_factor=2, n_feats=16, n_resblocks=2,
                     n_resgroups=1, reduction=4, use_pallas='cs')
    p = m.init(jax.random.PRNGKey(0), x)

    taken = []
    real = cs_conv.cs_plan_pad

    def loss(params, use_cs):
        if use_cs:
            monkeypatch.setattr(cs_conv, 'cs_plan_pad',
                                lambda s: taken.append(s) or real(s))
        else:
            monkeypatch.setattr(cs_conv, 'cs_plan_pad', lambda s: None)
        return jnp.sum(jnp.sin(m.apply(params, x)))

    v_cs, g_cs = jax.value_and_grad(loss)(p, True)
    assert taken, 'padded CS path was not consulted'
    v_rf, g_rf = jax.value_and_grad(loss)(p, False)
    np.testing.assert_allclose(v_cs, v_rf, rtol=1e-5)
    flat_cs = jax.tree_util.tree_leaves_with_path(g_cs)
    flat_rf = jax.tree_util.tree_leaves(g_rf)
    for (path, a), b in zip(flat_cs, flat_rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_rdn_grid_trunk_matches_calls():
    """Round-5 grid-over-blocks trunk (rdn_trunk_cat_cs: one forward
    kernel for all D blocks, scalar-prefetch backward off the buf stack)
    == the shipped per-block-call path (rdn_trunk_cs2 + concat), values
    and every gradient."""
    from srtpu.ops.cs_conv import (rdn_trunk_cat_cs, rdn_trunk_cs2,
                                   w_cs_batch)
    rng = np.random.default_rng(33)
    B, H, W = 4, 8, 8
    G0, C, D = 16, 3, 2
    x = jnp.asarray(rng.standard_normal((B, H, W, G0)), jnp.float32)
    k, _ = cs_plan(x.shape)
    x_cs = nhwc_to_cs(x, k)

    def mk(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    ws = tuple(w_cs_batch(mk(D, 3, 3, G0 * (i + 1), G0))
               for i in range(C))
    bs = tuple(mk(D, G0) for _ in range(C))
    wfs = mk(D, G0, G0 * (C + 1))
    bfs = mk(D, G0)
    args = (x_cs, ws, bs, wfs, bfs)
    # weight the cat rows asymmetrically so every block's cotangent slice
    # differs (exercises the in-kernel ct_cat block select)
    row_w = jnp.arange(1, D * G0 + 1, dtype=jnp.float32)[None, :, None]

    def f_grid(a):
        cat = rdn_trunk_cat_cs(a[0], a[1], a[2], a[3], a[4], W, k)
        return jnp.sum(jnp.sin(cat) * row_w)

    def f_calls(a):
        outs = rdn_trunk_cs2(a[0], a[1], a[2], a[3], a[4], W, k)
        cat = jnp.concatenate(outs, axis=1)
        return jnp.sum(jnp.sin(cat) * row_w)

    np.testing.assert_allclose(f_grid(args), f_calls(args), rtol=1e-5)
    g_g = jax.tree_util.tree_leaves(jax.grad(f_grid)(args))
    g_c = jax.tree_util.tree_leaves(jax.grad(f_calls)(args))
    assert len(g_g) == len(g_c)
    for a, b in zip(g_g, g_c):
        np.testing.assert_allclose(a, b, atol=1e-4)
