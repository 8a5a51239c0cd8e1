"""SRGAN adversarial loop tests (capability spec: srgan.py:136-222)."""

import jax
import jax.numpy as jnp
import numpy as np

from srtpu.losses.vgg import VGGLoss
from srtpu.models import SRGANDiscriminator, SRGANGenerator
from srtpu.train.gan import (create_gan_state, make_gan_train_step,
                             steplr_adam)


def test_gan_step_updates_both_networks():
    g = SRGANGenerator(scale_factor=2, ngf=8, n_blocks=1)
    d = SRGANDiscriminator(ndf=8)
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (2, 12, 12, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 24, 3))

    state = create_gan_state(g, d, rng, lr_img)
    vgg = VGGLoss(net_type='vgg19', layer='relu5_4')
    step = make_gan_train_step(gan_mode='wgangp', vgg_loss=vgg)

    g0 = np.asarray(jax.tree_util.tree_leaves(state.g_params)[0]).copy()
    d0 = np.asarray(jax.tree_util.tree_leaves(state.d_params)[0]).copy()

    logs = None
    for _ in range(3):
        state, logs = step(state, lr_img, hr_img)

    for key in ('d_loss', 'g_loss', 'content_loss', 'adv_loss', 'tv_loss'):
        assert np.isfinite(float(logs[key])), key

    g1 = np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])
    d1 = np.asarray(jax.tree_util.tree_leaves(state.d_params)[0])
    assert not np.allclose(g0, g1), 'generator did not update'
    assert not np.allclose(d0, d1), 'discriminator did not update'
    assert int(state.step) == 3


def test_gan_batch_stats_tracked():
    g = SRGANGenerator(scale_factor=2, ngf=8, n_blocks=1)
    d = SRGANDiscriminator(ndf=8)
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (2, 12, 12, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 24, 24, 3))
    state = create_gan_state(g, d, rng, lr_img)
    assert state.g_batch_stats and state.d_batch_stats
    bs0 = np.asarray(
        jax.tree_util.tree_leaves(state.g_batch_stats)[0]).copy()
    step = make_gan_train_step(
        vgg_loss=VGGLoss(net_type='vgg19', layer='relu5_4'))
    state, _ = step(state, lr_img, hr_img)
    bs1 = np.asarray(jax.tree_util.tree_leaves(state.g_batch_stats)[0])
    assert not np.allclose(bs0, bs1)


def test_steplr_schedule_decays():
    tx = steplr_adam(lr=1.0, step_size=2, gamma=0.1)
    params = {'w': jnp.ones(2)}
    state = tx.init(params)
    import optax
    # first two steps at lr 1.0, next at 0.1: observe shrinking step size
    g = {'w': jnp.ones(2)}
    sizes = []
    for _ in range(4):
        updates, state = tx.update(g, state, params)
        sizes.append(float(jnp.abs(updates['w']).mean()))
    assert sizes[2] < sizes[0] * 0.5  # decayed after step_size


def test_srgan_generator_output_range():
    g = SRGANGenerator(scale_factor=2, ngf=8, n_blocks=1)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 12, 12, 3))
    variables = g.init(rng, x, train=False)
    y = g.apply(variables, x, train=False)
    assert y.shape == (1, 24, 24, 3)
    # tanh -> (x+1)/2 keeps outputs in [0, 1]
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
