"""Loss library tests: DSL parsing, golden values, gradient behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.losses import (AdaptiveLoss, gan_loss, l1_loss, l2_loss,
                          parse_losses, psnr_gray, supported_losses, tv_loss)


def _imgs(seed=0, shape=(2, 32, 32, 3)):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.uniform(k1, shape), jax.random.uniform(k2, shape))


def test_supported_losses_match_reference_registry():
    # reference models/srmodel.py:30-44
    assert supported_losses() == ['adaptive', 'dists', 'edge_loss', 'flip',
                                  'haarpsi', 'l1', 'l2', 'lpips', 'mae',
                                  'mse', 'pencil_sketch', 'pieapp']


def test_dsl_single_default_weight():
    comp = parse_losses('l1')
    assert comp.names == ['l1']
    assert comp.sub_losses[0].weight == 1.0


def test_dsl_composite_weights():
    comp = parse_losses('0.5 * l1 + 0.3*mse + edge_loss')
    assert comp.names == ['l1', 'mse', 'edge_loss']
    assert [s.weight for s in comp.sub_losses] == [0.5, 0.3, 1.0]


def test_dsl_bad_weight_raises():
    with pytest.raises(ValueError, match='not a valid number'):
        parse_losses('abc * l1')


def test_dsl_unknown_loss_raises():
    with pytest.raises(AttributeError, match="Couldn't find loss"):
        parse_losses('notaloss')


def test_dsl_malformed_term_raises():
    with pytest.raises(ValueError, match='malformed loss term'):
        parse_losses('0.5*l1*2')


def test_composite_repeated_loss_logs_both_terms():
    """'0.3 * l1 + 0.7 * l1' must log both terms (index-qualified), not
    silently overwrite one; the total is unaffected."""
    comp = parse_losses('0.3 * l1 + 0.7 * l1')
    sr, hr = _imgs()
    total, parts = comp(sr, hr)
    assert set(parts) == {'0_l1', '1_l1'}
    assert np.isclose(float(total), float(parts['0_l1'] + parts['1_l1']))
    assert np.isclose(float(parts['0_l1']) / 0.3,
                      float(parts['1_l1']) / 0.7, rtol=1e-5)


def test_l1_l2_golden():
    sr = jnp.ones((1, 4, 4, 3)) * 0.5
    hr = jnp.zeros((1, 4, 4, 3))
    assert np.isclose(l1_loss(sr, hr), 0.5)
    assert np.isclose(l2_loss(sr, hr), 0.25)


def test_tv_loss_matches_torch_formula():
    torch = pytest.importorskip('torch')
    x_np = np.random.rand(2, 8, 8, 3).astype(np.float32)
    ours = float(tv_loss(jnp.asarray(x_np)))
    # reference losses/losses.py:218-233
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    b, _, h, w = x.shape
    count_h = x[:, :, 1:, :].numel() // b
    count_w = x[:, :, :, 1:].numel() // b
    h_tv = ((x[:, :, 1:, :] - x[:, :, :h - 1, :]) ** 2).sum()
    w_tv = ((x[:, :, :, 1:] - x[:, :, :, :w - 1]) ** 2).sum()
    theirs = float(2 * (h_tv / count_h + w_tv / count_w) / b)
    assert np.isclose(ours, theirs, rtol=1e-5)


def test_psnr_gray_identity_is_large():
    x, _ = _imgs()
    assert psnr_gray(x, x) > 100


def test_composite_call_returns_total_and_parts():
    comp = parse_losses('0.5 * l1 + 0.5 * mse')
    sr, hr = _imgs()
    total, parts = comp(sr, hr)
    assert set(parts) == {'l1', 'mse'}
    assert np.isclose(float(total), float(parts['l1'] + parts['mse']))


def test_gan_loss_modes():
    pred = jnp.asarray([[0.3], [0.8]])
    # lsgan
    assert np.isclose(gan_loss(pred, True, 'lsgan'),
                      np.mean((np.asarray(pred) - 1) ** 2))
    # wgangp
    assert np.isclose(gan_loss(pred, True, 'wgangp'), -np.mean(pred))
    assert np.isclose(gan_loss(pred, False, 'wgangp'), np.mean(pred))
    # vanilla matches BCE-with-logits
    torch = pytest.importorskip('torch')
    t = torch.tensor(np.asarray(pred))
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        t, torch.ones_like(t))
    assert np.isclose(gan_loss(pred, True, 'vanilla'), float(bce), rtol=1e-5)


def test_adaptive_loss_trainable_params():
    loss = AdaptiveLoss(num_levels=2)
    params = loss.init()
    assert params['latent_alpha'].shape == (7, 3)
    sr, hr = _imgs(shape=(2, 16, 16, 3))
    value = loss(sr, hr, params)
    assert np.isfinite(value) and value > 0
    assert float(loss(hr, hr, params)) < float(value)

    grads = jax.grad(lambda p: loss(sr, hr, p))(params)
    assert np.any(np.asarray(grads['latent_alpha']) != 0)
    assert np.any(np.asarray(grads['latent_scale']) != 0)


def test_adaptive_in_dsl_and_composite_params():
    comp = parse_losses('0.5 * l1 + 0.5 * adaptive')
    assert comp.has_trainable
    params = comp.init_params(jax.random.PRNGKey(0))
    assert list(params) == ['1_adaptive']
    sr, hr = _imgs(shape=(1, 16, 16, 3))
    total, parts = comp(sr, hr, params)
    assert np.isfinite(float(total))


def test_edge_loss_zero_for_identical_and_positive_for_noise():
    from srtpu.losses import edge_loss
    x, y = _imgs(shape=(1, 40, 40, 3))
    assert np.isclose(float(edge_loss(x, x, 'sobel')), 0.0)
    assert float(edge_loss(x, y, 'sobel')) > 0
    assert np.isfinite(float(edge_loss(x, y, 'laplacian')))
    assert np.isfinite(float(edge_loss(x, y, 'canny')))


def test_pencil_sketch_loss_behaves():
    from srtpu.losses import pencil_sketch_loss
    x, y = _imgs(shape=(1, 40, 40, 3))
    ident = float(pencil_sketch_loss(x, x))
    diff = float(pencil_sketch_loss(x, y))
    assert ident < diff  # 100 - psnr: identical has tiny loss
    assert ident < 0.01 or ident < diff


def test_haarpsi_properties():
    from srtpu.losses import haarpsi
    x, _ = _imgs(shape=(1, 64, 64, 3))
    assert float(haarpsi(x, x)) > 0.98
    noisy1 = jnp.clip(x + 0.05 * jax.random.normal(
        jax.random.PRNGKey(5), x.shape), 0, 1)
    noisy2 = jnp.clip(x + 0.2 * jax.random.normal(
        jax.random.PRNGKey(5), x.shape), 0, 1)
    s1, s2 = float(haarpsi(x, noisy1)), float(haarpsi(x, noisy2))
    assert s2 < s1 < 1.0


def test_flip_properties():
    from srtpu.losses import flip
    x, _ = _imgs(shape=(1, 48, 48, 3))
    assert float(flip(x, x)) < 1e-3
    noisy1 = jnp.clip(x + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), x.shape), 0, 1)
    noisy2 = jnp.clip(x + 0.3 * jax.random.normal(
        jax.random.PRNGKey(7), x.shape), 0, 1)
    f1, f2 = float(flip(x, noisy1)), float(flip(x, noisy2))
    assert 0 < f1 < f2 <= 1.0


def test_flip_gradient_flows():
    from srtpu.losses import flip_loss
    sr, hr = _imgs(shape=(1, 32, 32, 3))
    g = jax.grad(lambda s: flip_loss(s, hr))(sr)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_vgg_loss_runs_with_random_weights():
    from srtpu.losses import VGGLoss
    loss = VGGLoss(net_type='vgg16', layer='relu2_2')
    sr, hr = _imgs(shape=(1, 32, 32, 3))
    assert np.isclose(float(loss(hr, hr)), 0.0, atol=1e-8)
    assert float(loss(sr, hr)) > 0


@pytest.mark.slow
def test_lpips_and_dists_identity():
    from srtpu.losses import DISTS, LPIPS
    x, y = _imgs(shape=(1, 64, 64, 3))
    lp = LPIPS()
    assert np.isclose(float(lp(x, x)), 0.0, atol=1e-6)
    assert float(lp(x, y)) > 0
    di = DISTS()
    assert abs(float(di(x, x))) < 1e-3
    assert float(di(x, y)) > float(di(x, x)) - 1e-6


def test_pieapp_runs_and_orders():
    from srtpu.losses.pieapp import PieAPP
    pa = PieAPP()
    x, _ = _imgs(shape=(1, 64, 64, 3))
    # identical inputs -> zero feature difference -> every patch gets the
    # same constant MLP(0) score; with random weights that constant is not
    # 0 (pretrained weights calibrate it), but it must be deterministic
    ident = float(pa(x, x))
    assert np.isfinite(ident)
    assert float(pa(x, x)) == ident
    noisy = jnp.clip(x + 0.3 * jax.random.normal(jax.random.PRNGKey(9),
                                                 x.shape), 0, 1)
    diff = float(pa(noisy, x))
    assert np.isfinite(diff) and diff != ident


def test_pieapp_in_dsl():
    comp = parse_losses('0.5 * l1 + 0.5 * pieapp')
    assert comp.names == ['l1', 'pieapp']
    sr, hr = _imgs(shape=(1, 64, 64, 3))
    total, parts = comp(sr, hr)
    assert np.isfinite(float(total))
