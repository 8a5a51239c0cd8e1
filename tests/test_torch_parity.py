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
