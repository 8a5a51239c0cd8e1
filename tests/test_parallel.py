"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
the fake-backend substitute for a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.losses import parse_losses
from srtpu.metrics import build_metrics
from srtpu.models import create_model
from srtpu.optim import build_optimizer
from srtpu.parallel import (batch_sharding, make_mesh,
                            make_parallel_eval_step,
                            make_parallel_train_step, replicate_state,
                            shard_batch)
from srtpu.train import create_train_state, make_train_step


@pytest.fixture(scope='module')
def mesh8():
    assert jax.device_count() >= 8, 'conftest must force 8 CPU devices'
    return make_mesh(data=4, spatial=2)


def _setup(mesh, batch=8, patch=16, scale=2):
    model = create_model('EDSR', scale_factor=scale, n_feats=8,
                         n_resblocks=1)
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (batch, patch // scale,
                                      patch // scale, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, patch, patch, 3))
    state = create_train_state(model, tx, rng, lr_img, composite)
    return model, composite, state, lr_img, hr_img


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {'data': 4, 'spatial': 2}
    assert mesh8.devices.size == 8


def test_parallel_train_step_matches_single_device(mesh8):
    """DP+SP sharded step computes the SAME update as single-device."""
    model, composite, state, lr_img, hr_img = _setup(mesh8)

    single = make_train_step(composite, donate=False)
    s1, logs1 = single(state, lr_img, hr_img)

    pstate = replicate_state(mesh8, state)
    lr_s, hr_s = shard_batch(mesh8, np.asarray(lr_img), np.asarray(hr_img))
    pstep = make_parallel_train_step(composite, mesh8, donate=False)
    s2, logs2 = pstep(pstate, lr_s, hr_s)

    np.testing.assert_allclose(float(logs1['loss']), float(logs2['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_parallel_multi_step_convergence(mesh8):
    model, composite, state, lr_img, hr_img = _setup(mesh8)
    pstate = replicate_state(mesh8, state)
    lr_s, hr_s = shard_batch(mesh8, np.asarray(lr_img), np.asarray(hr_img))
    pstep = make_parallel_train_step(composite, mesh8, donate=False)
    losses = []
    for _ in range(10):
        pstate, logs = pstep(pstate, lr_s, hr_s)
        losses.append(float(logs['loss']))
    assert losses[-1] < losses[0]


def test_spatially_sharded_eval(mesh8):
    """Full-image eval split over 'spatial' (XLA conv halo exchange)."""
    model, composite, state, *_ = _setup(mesh8)
    metrics = build_metrics(['PSNR', 'SSIM'])
    lr_img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    mask = jnp.ones((1, 64, 64, 1))

    from srtpu.train import make_eval_step
    single = make_eval_step(metrics)
    sr1, r1 = single(state, lr_img, hr_img, mask)

    mesh = make_mesh(data=1, spatial=8)
    pstate = replicate_state(mesh, state)
    lr_s, hr_s, m_s = shard_batch(mesh, np.asarray(lr_img),
                                  np.asarray(hr_img), np.asarray(mask))
    peval = make_parallel_eval_step(metrics, mesh)
    sr2, r2 = peval(pstate, lr_s, hr_s, m_s)

    np.testing.assert_allclose(np.asarray(sr1), np.asarray(sr2), atol=1e-5)
    for k in r1:
        np.testing.assert_allclose(float(r1[k]), float(r2[k]), rtol=1e-4)


def test_batch_sharding_layout(mesh8):
    x = np.zeros((8, 16, 16, 3), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh8))
    # each device holds batch/4 x H/2
    shard_shape = xs.sharding.shard_shape(x.shape)
    assert shard_shape == (2, 8, 16, 3)


def test_spatially_sharded_large_image_predict(mesh8):
    """Full-resolution predict sharded over 8 'spatial' rows — the
    context-parallel analog (SURVEY.md §2.2): a 256x256 LR image (1024px
    SR output at x4) split across the mesh with XLA halo exchanges."""
    from srtpu.models import create_model
    from srtpu.parallel import make_mesh, replicate_state, shard_batch
    from srtpu.train import create_train_state
    import jax

    mesh = make_mesh(data=1, spatial=8)
    model = create_model('EDSR', scale_factor=4, n_feats=8, n_resblocks=1)
    tx = build_optimizer('ADAM', [])
    rng = jax.random.PRNGKey(0)
    small = jax.random.uniform(rng, (1, 16, 16, 3))
    state = create_train_state(model, tx, rng, small)
    state = replicate_state(mesh, state)

    big = np.random.default_rng(0).random((1, 256, 256, 3)).astype(
        np.float32)
    big_sharded = shard_batch(mesh, big)

    from srtpu.parallel.mesh import replicated, batch_sharding

    @jax.jit
    def predict(s, x):
        return s.apply_fn({'params': s.params}, x)

    sr = predict(state, big_sharded)
    assert sr.shape == (1, 1024, 1024, 3)
    # numerics match unsharded forward
    sr_ref = predict(jax.device_get(state),
                     jnp.asarray(big))
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sr_ref),
                               atol=1e-5)
