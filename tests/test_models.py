"""Shape/param/grad tests for the model zoo.

Test strategy per SURVEY.md §4: the reference has no tests; we create shape
tests for all 8 families x supported scales, param-count cross-checks against
the reference architecture formulas, and gradient-flow smoke tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.models import (available_models, create_model, param_count,
                          pixel_shuffle, pixel_unshuffle)


def _init_and_apply(model, lr_shape, train=False):
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(lr_shape, jnp.float32)
    variables = model.init(rng, x, train=train)
    y = model.apply(variables, x, train=train,
                    mutable=['batch_stats'] if 'batch_stats' in variables else False)
    if isinstance(y, tuple):
        y = y[0]
    return variables, y


SCALES = {
    'SRCNN': (2, 3, 4, 8),
    'EDSR': (2, 3, 4, 8),
    'SRResNet': (2, 3, 4, 8),
    'SRGAN': (2, 4),
    'WDSR': (2, 3, 4, 8),
    'RCAN': (2, 4),
    'RDN': (2, 3, 4),
    'DDBPN': (2, 4, 8),
}

# small overrides so tests stay fast on 1 CPU core
SMALL = {
    'EDSR': dict(n_resblocks=2, n_feats=8),
    'SRResNet': dict(n_resblocks=2, n_feats=8),
    'SRGAN': dict(n_blocks=2, ngf=8, ndf=8),
    'WDSR': dict(n_resblocks=2, n_feats=8),
    'RCAN': dict(n_resblocks=2, n_resgroups=2, n_feats=16, reduction=4),
    'RDN': dict(rdn_config='A', growth0=16),
    'DDBPN': dict(n0=16, nr=8, depth=3),
}


def test_registry_lists_all_families():
    assert available_models() == ['DDBPN', 'EDSR', 'RCAN', 'RDN', 'SRCNN',
                                  'SRGAN', 'SRResNet', 'WDSR']


def _slow_if(name, heavy):
    """Mark heavy parametrizations slow (full lane: make test)."""
    return pytest.param(name, marks=pytest.mark.slow) if name in heavy \
        else name


@pytest.mark.parametrize(
    'name', [_slow_if(n, {'DDBPN', 'WDSR', 'RDN'}) for n in sorted(SCALES)])
def test_model_shapes(name):
    for scale in SCALES[name]:
        model = create_model(name, scale_factor=scale, channels=3,
                             **SMALL.get(name, {}))
        h = w = 24 if scale != 8 else 8
        _, y = _init_and_apply(model, (1, h, w, 3), train=False)
        assert y.shape == (1, h * scale, w * scale, 3), \
            f'{name} x{scale}: got {y.shape}'


def test_edsr_baseline_param_count():
    # EDSR-baseline (16 resblocks, 64 feats, x4) must match the reference
    # architecture exactly: 1,517,571 params (computed from
    # reference models/edsr.py:13-38 + common.py layer shapes).
    model = create_model('EDSR', scale_factor=4, n_feats=64, n_resblocks=16)
    variables, _ = _init_and_apply(model, (1, 8, 8, 3))
    assert param_count(variables['params']) == 1_517_571


def test_srcnn_param_count():
    # 9x9x3x64+64 + 1x1x64x32+32 + 5x5x32x3+3 = 20,099
    # (reference models/srcnn.py:16-22)
    model = create_model('SRCNN', scale_factor=2)
    variables, _ = _init_and_apply(model, (1, 8, 8, 3))
    assert param_count(variables['params']) == 20_099


def test_rcan_param_count_formula():
    # RCAN tiny config, computed by hand from reference rcan.py:
    # head: 3*3*3*16+16; groups: 2 * (2 RCABs + closing conv);
    # RCAB = 2x(3*3*16*16+16) + CA(16->4: 16*4+4; 4->16: 4*16+16);
    # body close: 3*3*16*16+16; tail: x4 = 2x(3*3*16*64+64) + 3*3*16*3+3
    n, red = 16, 4
    conv33 = 3 * 3 * n * n + n
    ca = n * (n // red) + n // red + (n // red) * n + n
    rcab = 2 * conv33 + ca
    group = 2 * rcab + conv33
    head = 3 * 3 * 3 * n + n
    tail = 2 * (3 * 3 * n * (4 * n) + 4 * n) + 3 * 3 * n * 3 + 3
    expected = head + 2 * group + conv33 + tail
    model = create_model('RCAN', scale_factor=4, n_feats=16, n_resblocks=2,
                         n_resgroups=2, reduction=4)
    variables, _ = _init_and_apply(model, (1, 8, 8, 3))
    assert param_count(variables['params']) == expected


def test_pixel_shuffle_roundtrip_and_torch_semantics():
    x = jnp.arange(2 * 3 * 3 * 8, dtype=jnp.float32).reshape(2, 3, 3, 8)
    y = pixel_shuffle(x, 2)
    assert y.shape == (2, 6, 6, 2)
    assert jnp.allclose(pixel_unshuffle(y, 2), x)
    # torch ordering: out[b, h*r+i, w*r+j, c] == in[b, h, w, c*r*r + i*r + j]
    b, h, w, c, r, i, j = 1, 2, 1, 1, 2, 1, 0
    assert y[b, h * r + i, w * r + j, c] == x[b, h, w, c * r * r + i * r + j]


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip('torch')
    x = np.random.rand(2, 4, 5, 3 * 4).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_gradients_flow():
    model = create_model('EDSR', scale_factor=2, n_resblocks=1, n_feats=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    variables = model.init(rng, x)

    def loss_fn(params):
        sr = model.apply({'params': params}, x)
        return jnp.mean(jnp.abs(sr - hr))

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    assert any(jnp.any(g != 0) for g in leaves)


def test_bicubic_resize_matches_torch_upsample():
    torch = pytest.importorskip('torch')
    from srtpu.models import bicubic_resize
    x = np.random.rand(1, 7, 9, 3).astype(np.float32)
    ours = np.asarray(bicubic_resize(jnp.asarray(x), (14, 18), a=-0.75,
                                     antialias=False))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode='bicubic').permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_bicubic_downscale_matches_pil():
    from PIL import Image
    from srtpu.models import bicubic_resize
    rng = np.random.default_rng(0)
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    pil = np.asarray(Image.fromarray(img).resize((24, 16), Image.BICUBIC),
                     dtype=np.float32) / 255.0
    x = img.astype(np.float32)[None] / 255.0
    ours = np.asarray(bicubic_resize(jnp.asarray(x), (16, 24), a=-0.5,
                                     antialias=True))[0]
    np.testing.assert_allclose(ours, pil, atol=2e-2)


def test_srgan_discriminator_output():
    from srtpu.models import SRGANDiscriminator
    d = SRGANDiscriminator(ndf=8)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    variables = d.init(rng, x, train=True)
    y, _ = d.apply(variables, x, train=True, mutable=['batch_stats'])
    assert y.shape == (2, 1, 1, 1)
    assert jnp.all((y >= 0) & (y <= 1))


def test_wdsr_b_param_count_formula():
    # Hand-derived from reference wdsr.py (weight-norm adds one g scalar
    # per output channel): n_feats=8, n_resblocks=2, scale 2, 3ch.
    n, blocks, scale = 8, 2, 2
    out_feats = scale * scale * 3
    def wn_conv(cin, cout, k):
        return k * k * cin * cout + cout + cout  # kernel + g + bias
    head = wn_conv(3, n, 3)
    block_b = (wn_conv(n, 6 * n, 1) + wn_conv(6 * n, int(0.8 * n), 1)
               + wn_conv(int(0.8 * n), n, 3))
    tail = wn_conv(n, out_feats, 3)
    skip = wn_conv(3, out_feats, 5)
    expected = head + blocks * block_b + tail + skip

    model = create_model('WDSR', scale_factor=scale, n_feats=n,
                         n_resblocks=blocks, block_type='B')
    variables, _ = _init_and_apply(model, (1, 8, 8, 3))
    assert param_count(variables['params']) == expected


def test_rdn_param_count_formula():
    # reference rdn.py config A=(20,6,32) with G0, kernel 3, scale 2 —
    # computed from an independent layer-by-layer ledger.
    D, C, G = 20, 6, 32
    G0, k, scale, ch = 16, 3, 2, 3
    def conv(cin, cout, kk=k):
        return kk * kk * cin * cout + cout
    total = conv(ch, G0) + conv(G0, G0)           # SFENet1/2
    for _ in range(D):                             # RDBs
        cin = G0
        for _ in range(C):
            total += conv(cin, G)
            cin += G
        total += conv(cin, G0, 1)                  # local fusion 1x1
    total += conv(D * G0, G0, 1) + conv(G0, G0)    # global fusion
    total += conv(G0, G * scale * scale) + conv(G, ch)  # UPNet x2
    model = create_model('RDN', scale_factor=scale, rdn_config='A',
                         growth0=G0)
    variables, _ = _init_and_apply(model, (1, 8, 8, 3))
    assert param_count(variables['params']) == total


@pytest.mark.parametrize(
    'name', [_slow_if(n, {'WDSR', 'RDN'})
             for n in ['WDSR', 'RCAN', 'RDN', 'DDBPN', 'SRResNet']])
def test_gradients_flow_all_models(name):
    model = create_model(name, scale_factor=2, channels=3,
                         **SMALL.get(name, {}))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 8, 8, 3))
    hr = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    variables = model.init(rng, x, train=True)

    def loss_fn(params):
        v = {'params': params}
        if 'batch_stats' in variables:
            v['batch_stats'] = variables['batch_stats']
            sr, _ = model.apply(v, x, train=True, mutable=['batch_stats'])
        else:
            sr = model.apply(v, x, train=True)
        return jnp.mean(jnp.abs(sr - hr))

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves), name
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.5, f'{name}: too many dead grads'
