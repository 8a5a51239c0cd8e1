"""Golden-value parity vs torch for the conv primitives.

torch (CPU) is available in the image, so the building blocks can be
checked against the exact reference semantics: same-padded conv,
ConvTranspose2d geometry/values, weight-norm conv, PReLU, and MeanShift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from srtpu.models import Conv2d, ConvTranspose2d, PReLU, WNConv2d
from srtpu.models.common import mean_shift


def _run_flax(module, x_nhwc, params):
    return np.asarray(module.apply({'params': params},
                                   jnp.asarray(x_nhwc)))


def test_conv2d_same_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 11, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32) * 0.2
    b = rng.standard_normal(7).astype(np.float32)

    ours = _run_flax(Conv2d(7, 3, padding='same'), x,
                     {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)})

    tconv = torch.nn.Conv2d(5, 7, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w).permute(3, 2, 0, 1))
        tconv.bias.copy_(torch.from_numpy(b))
        theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_conv2d_strided_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 12, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32) * 0.2

    ours = _run_flax(Conv2d(6, 3, strides=2, padding=1, use_bias=False), x,
                     {'kernel': jnp.asarray(w)})
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w).permute(3, 2, 0, 1))
        theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape == (1, 6, 6, 6)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize('scale,k,p', [(2, 6, 2), (4, 8, 2), (8, 12, 2)])
def test_conv_transpose_matches_torch(scale, k, p):
    """DDBPN projection conv geometry (reference ddbpn.py:10-24)."""
    rng = np.random.default_rng(scale)
    x = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    # torch ConvTranspose2d weight layout: (in, out, kh, kw)
    w_t = rng.standard_normal((3, 4, k, k)).astype(np.float32) * 0.1
    b = rng.standard_normal(4).astype(np.float32)

    # ours stores HWOI
    w_ours = np.transpose(w_t, (2, 3, 1, 0))
    ours = _run_flax(ConvTranspose2d(4, k, strides=scale, padding=p), x,
                     {'kernel': jnp.asarray(w_ours), 'bias': jnp.asarray(b)})

    tconv = torch.nn.ConvTranspose2d(3, 4, k, stride=scale, padding=p)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w_t))
        tconv.bias.copy_(torch.from_numpy(b))
        theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape == (1, 5 * scale, 5 * scale, 4)
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_wnconv_matches_torch_weight_norm():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    v = rng.standard_normal((3, 3, 4, 6)).astype(np.float32) * 0.3
    g = rng.standard_normal(6).astype(np.float32) ** 2 + 0.5
    b = rng.standard_normal(6).astype(np.float32)

    ours = _run_flax(WNConv2d(6, 3), x,
                     {'v': jnp.asarray(v), 'g': jnp.asarray(g),
                      'bias': jnp.asarray(b)})

    tconv = torch.nn.Conv2d(4, 6, 3, padding=1)
    tconv = torch.nn.utils.weight_norm(tconv)
    with torch.no_grad():
        tconv.weight_v.copy_(torch.from_numpy(v).permute(3, 2, 0, 1))
        tconv.weight_g.copy_(torch.from_numpy(g).reshape(6, 1, 1, 1))
        tconv.bias.copy_(torch.from_numpy(b))
        theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_wnconv_init_identity():
    """g initialized to ||v|| so initial forward equals the plain conv
    (torch weight_norm init parity, reference wdsr.py:62)."""
    m = WNConv2d(6, 3)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 8, 8, 4)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)['params']
    v = np.asarray(params['v'])
    g = np.asarray(params['g'])
    np.testing.assert_allclose(g, np.linalg.norm(
        v.reshape(-1, 6), axis=0), rtol=1e-5)


def test_prelu_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    alpha = rng.random(3).astype(np.float32)

    ours = _run_flax(PReLU(num_parameters=3), x,
                     {'alpha': jnp.asarray(alpha)})
    tp = torch.nn.PReLU(3)
    with torch.no_grad():
        tp.weight.copy_(torch.from_numpy(alpha))
        theirs = tp(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mean_shift_matches_reference_semantics():
    """MeanShift conv semantics: sign=-1 -> (x - mean)/std; sign=+1 ->
    x/std + mean/std (reference common.py:58-71 with std=1)."""
    x = jnp.asarray(np.random.default_rng(6).random((1, 4, 4, 3)),
                    jnp.float32)
    mean = jnp.asarray([0.4488, 0.4371, 0.4040])
    np.testing.assert_allclose(np.asarray(mean_shift(x, -1)),
                               np.asarray(x - mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean_shift(x, 1)),
                               np.asarray(x + mean), atol=1e-6)
    # round trip
    np.testing.assert_allclose(np.asarray(mean_shift(mean_shift(x, -1), 1)),
                               np.asarray(x), atol=1e-6)


def test_gaussian_blur_matches_torch_conv():
    from srtpu.utils.imgops import gaussian_blur2d, _gaussian_1d
    rng = np.random.default_rng(7)
    x = rng.random((1, 12, 12, 1)).astype(np.float32)
    ours = np.asarray(gaussian_blur2d(jnp.asarray(x), (5, 5), (1.0, 1.0),
                                      'reflect'))
    g1 = _gaussian_1d(5, 1.0)
    k2 = np.outer(g1, g1)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = torch.nn.functional.pad(xt, (2, 2, 2, 2), mode='reflect')
    theirs = torch.nn.functional.conv2d(
        xt, torch.from_numpy(k2)[None, None]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


# ---------------------------------------------------------------- FLIP golden


def _reference_flip_module():
    """Load the reference NVIDIA FLIP implementation
    (/root/reference/losses/flip.py) as a CPU oracle: its hard-coded
    `.cuda()` / device='cuda' calls are neutralized so the published
    algorithm runs on the CPU torch in this image."""
    import importlib.util
    import sys
    sys.dont_write_bytecode = True
    spec = importlib.util.spec_from_file_location(
        'ref_flip', '/root/reference/losses/flip.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _CpuTorch:
    def __enter__(self):
        self._cuda = torch.Tensor.cuda
        self._zeros = torch.zeros
        torch.Tensor.cuda = lambda t, *a, **k: t
        zeros = self._zeros

        def zeros_cpu(*a, **k):
            k.pop('device', None)
            return zeros(*a, **k)

        torch.zeros = zeros_cpu
        return self

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._cuda
        torch.zeros = self._zeros


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_flip_matches_reference_random(seed):
    from srtpu.losses.flip import flip
    ref_mod = _reference_flip_module()
    rng = np.random.default_rng(seed)
    h, w = 40 + seed, 48 - seed
    sr = rng.random((1, h, w, 3)).astype(np.float32)
    hr = np.clip(sr + 0.15 * rng.standard_normal((1, h, w, 3)), 0, 1) \
        .astype(np.float32)

    ours = float(flip(jnp.asarray(hr), jnp.asarray(sr)))
    with _CpuTorch():
        model = ref_mod.FLIP()
        theirs = float(model.forward(
            torch.from_numpy(sr).permute(0, 3, 1, 2),
            torch.from_numpy(hr).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_flip_matches_reference_structured():
    """Structured (smooth + edge) content, where the feature pipeline's
    edge/point detectors dominate the error."""
    from srtpu.losses.flip import flip
    ref_mod = _reference_flip_module()
    rng = np.random.default_rng(7)
    base = np.kron(rng.random((6, 8, 3)), np.ones((8, 8, 1)))
    hr = base[None].astype(np.float32)
    sr = np.clip(hr + 0.05, 0, 1)
    sr[:, 20:28, :, :] = 0.0  # hard edge difference

    ours = float(flip(jnp.asarray(hr), jnp.asarray(sr)))
    with _CpuTorch():
        theirs = float(ref_mod.FLIP().forward(
            torch.from_numpy(sr).permute(0, 3, 1, 2),
            torch.from_numpy(hr).permute(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# ------------------------------------------------- full-model forward parity


def _reference_model_zoo():
    """Load the reference torch model graphs (models/{common,edsr,wdsr,
    rcan}.py) standalone: SRModel (a LightningModule, srmodel.py:67) is
    replaced by a minimal nn.Module stub carrying the two attributes the
    concrete models read (_scale_factor, _channels) — lightning is not
    installed and is irrelevant to forward parity."""
    import importlib.util
    import sys
    import types
    sys.dont_write_bytecode = True
    if 'refmodels.rcan' in sys.modules:
        return {k.split('.')[1]: sys.modules[k] for k in
                ('refmodels.common', 'refmodels.edsr', 'refmodels.wdsr',
                 'refmodels.rcan')}
    pkg = types.ModuleType('refmodels')
    pkg.__path__ = ['/root/reference/models']
    sys.modules['refmodels'] = pkg
    srmodel = types.ModuleType('refmodels.srmodel')

    class SRModel(torch.nn.Module):
        def __init__(self, scale_factor=4, channels=3, **kw):
            super().__init__()
            self._scale_factor = scale_factor
            self._channels = channels

        @property
        def device(self):
            return torch.device('cpu')

    srmodel.SRModel = SRModel
    sys.modules['refmodels.srmodel'] = srmodel
    out = {}
    for name in ('common', 'edsr', 'wdsr', 'rcan'):
        spec = importlib.util.spec_from_file_location(
            f'refmodels.{name}', f'/root/reference/models/{name}.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f'refmodels.{name}'] = mod
        spec.loader.exec_module(mod)
        out[name] = mod
    return out


def _oihw_to_hwio(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _conv(sd, prefix):
    return {'kernel': _oihw_to_hwio(sd[f'{prefix}.weight']),
            'bias': jnp.asarray(sd[f'{prefix}.bias'].numpy())}


def _wnconv(sd, prefix):
    return {'v': _oihw_to_hwio(sd[f'{prefix}.weight_v']),
            'g': jnp.asarray(sd[f'{prefix}.weight_g'].numpy().reshape(-1)),
            'bias': jnp.asarray(sd[f'{prefix}.bias'].numpy())}


def _upscale(sd, prefix, scale):
    rounds = 1 if scale == 3 else int(np.log2(scale))
    return {f'Conv2d_{k}': _conv(sd, f'{prefix}.{2 * k}')
            for k in range(rounds)}


def _forward_pair(flax_model, params, torch_model, seed=0, lr_hw=(12, 16)):
    rng = np.random.default_rng(seed)
    x = rng.random((1, *lr_hw, 3)).astype(np.float32)
    ours = np.asarray(flax_model.apply({'params': params}, jnp.asarray(x)))
    with torch.no_grad():
        torch_model.eval()
        theirs = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    return ours, theirs


@pytest.mark.parametrize('scale', [2, 4])
def test_edsr_full_model_matches_torch(scale):
    """Forward parity vs the reference EDSR graph (models/edsr.py:9-54)."""
    from srtpu.models import create_model
    zoo = _reference_model_zoo()
    n_feats, n_resblocks = 8, 2
    tm = zoo['edsr'].EDSR(n_feats=n_feats, n_resblocks=n_resblocks,
                          scale_factor=scale)
    sd = tm.state_dict()
    params = {'Conv2d_0': _conv(sd, 'head.0'),
              'Conv2d_1': _conv(sd, f'body.{n_resblocks}'),
              'Conv2d_2': _conv(sd, 'tail.1'),
              'UpscaleBlock_0': _upscale(sd, 'tail.0', scale)}
    for i in range(n_resblocks):
        params[f'ResBlock_{i}'] = {'Conv2d_0': _conv(sd, f'body.{i}.body.0'),
                                   'Conv2d_1': _conv(sd, f'body.{i}.body.2')}
    fm = create_model('EDSR', scale_factor=scale, n_feats=n_feats,
                      n_resblocks=n_resblocks, use_pallas=False)
    ours, theirs = _forward_pair(fm, params, tm)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_wdsr_b_full_model_matches_torch():
    """Forward parity vs the reference WDSR-B graph (models/wdsr.py:54-117):
    weight-normed convs, 6x-expand blocks, learned 5x5 skip + pixel
    shuffle, manual DIV2K rgb_mean shift."""
    from srtpu.models import create_model
    zoo = _reference_model_zoo()
    n_feats, n_resblocks, scale = 8, 2, 2
    tm = zoo['wdsr'].WDSR(type='B', n_feats=n_feats,
                          n_resblocks=n_resblocks, scale_factor=scale)
    sd = tm.state_dict()
    params = {'WNConv2d_0': _wnconv(sd, 'skip.0'),
              'WNConv2d_1': _wnconv(sd, 'head.0'),
              'WNConv2d_2': _wnconv(sd, 'tail.0')}
    assert params['WNConv2d_0']['v'].shape[:2] == (5, 5)  # skip is the 5x5
    for i in range(n_resblocks):
        params[f'_BlockB_{i}'] = {
            'WNConv2d_0': _wnconv(sd, f'body.{i}.body.0'),
            'WNConv2d_1': _wnconv(sd, f'body.{i}.body.2'),
            'WNConv2d_2': _wnconv(sd, f'body.{i}.body.3')}
    fm = create_model('WDSR', scale_factor=scale, n_feats=n_feats,
                      n_resblocks=n_resblocks, block_type='b')
    ours, theirs = _forward_pair(fm, params, tm)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_rcan_full_model_matches_torch():
    """Forward parity vs the reference RCAN graph (models/rcan.py:78-129):
    residual-in-residual groups with channel attention."""
    from srtpu.models import create_model
    zoo = _reference_model_zoo()
    n_feats, n_groups, n_blocks, red, scale = 16, 2, 2, 4, 2
    tm = zoo['rcan'].RCAN(n_feats=n_feats, n_resgroups=n_groups,
                          n_resblocks=n_blocks, reduction=red,
                          scale_factor=scale)
    sd = tm.state_dict()
    params = {'Conv2d_0': _conv(sd, 'head.0'),
              'Conv2d_1': _conv(sd, f'body.{n_groups}'),
              'Conv2d_2': _conv(sd, 'tail.1'),
              'UpscaleBlock_0': _upscale(sd, 'tail.0', scale)}
    for g in range(n_groups):
        grp = {'Conv2d_0': _conv(sd, f'body.{g}.body.{n_blocks}')}
        for b in range(n_blocks):
            grp[f'RCAB_{b}'] = {
                'Conv2d_0': _conv(sd, f'body.{g}.body.{b}.body.0'),
                'Conv2d_1': _conv(sd, f'body.{g}.body.{b}.body.2'),
                'CALayer_0': {
                    'Conv2d_0': _conv(
                        sd, f'body.{g}.body.{b}.body.3.conv_du.0'),
                    'Conv2d_1': _conv(
                        sd, f'body.{g}.body.{b}.body.3.conv_du.2')}}
        params[f'ResidualGroup_{g}'] = grp
    fm = create_model('RCAN', scale_factor=scale, n_feats=n_feats,
                      n_resgroups=n_groups, n_resblocks=n_blocks,
                      reduction=red, use_pallas=False)
    ours, theirs = _forward_pair(fm, params, tm)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)
