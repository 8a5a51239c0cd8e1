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


@pytest.fixture(autouse=True)
def cs_kernels_interpret(monkeypatch):
    """Opt in to interpret-mode CS kernels (TPU-gated in production;
    conftest no longer sets the flag globally — see its note)."""
    monkeypatch.setenv('SRTPU_CS_OFF_TPU', '1')


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


@pytest.mark.slow
def test_cs_kernel_path_matches_single_under_mesh(mesh8):
    """EDSR(use_pallas='cs') under the dp+sp mesh == single device.

    Pallas custom calls are not GSPMD-partitionable; the partitioner must
    gather around them (correct, if not free) — this pins the numerics so
    a silent wrong-halo regression can't ship."""
    model = create_model('EDSR', scale_factor=2, n_feats=16, n_resblocks=2,
                         use_pallas='cs')
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (8, 8, 8, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    state = create_train_state(model, tx, rng, lr_img, composite)

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


def test_batchnorm_is_syncbn_under_mesh(mesh8):
    """BatchNorm semantics under the dp mesh are pinned: batch statistics
    are computed over the GLOBAL (all-shards) batch — i.e. sync-BN — not
    per-shard. This is an intentional deviation from the reference
    default ``sync_batchnorm: false`` (/root/reference/configs/all.yml:126,
    per-GPU stats): SPMD-under-jit gives the mathematically-cleaner
    global semantics for free, and per-shard stats would make the update
    depend on device count. Asserted by equality with the single-device
    step on the same global batch: identical running batch_stats AND
    identical parameter updates (per-shard stats would differ because
    each shard's mean/var diverges from the global one)."""
    model = create_model('SRResNet', scale_factor=2, n_feats=16,
                         n_resblocks=1, use_pallas=False)
    composite = parse_losses('l1')
    # SGD: the param delta is proportional to the gradient, so the
    # assertion sees the BN-stats semantics directly (Adam's
    # sign-normalized step amplifies reduction-order noise ~1e-7 in the
    # grads up to the full learning rate on near-zero entries)
    tx = build_optimizer('SGD', ['lr=1e-2'])
    rng = jax.random.PRNGKey(0)
    # per-shard-distinguishable batch: each data shard gets a different
    # brightness band so per-shard stats would be measurably different
    lr_img = jax.random.uniform(rng, (8, 8, 8, 3)) * \
        jnp.arange(1, 9).reshape(8, 1, 1, 1) / 4.0
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    state = create_train_state(model, tx, rng, lr_img, composite)
    assert state.batch_stats, 'SRResNet must carry batch_stats'

    single = make_train_step(composite, donate=False)
    s1, logs1 = single(state, lr_img, hr_img)

    pstate = replicate_state(mesh8, state)
    lr_s, hr_s = shard_batch(mesh8, np.asarray(lr_img), np.asarray(hr_img))
    pstep = make_parallel_train_step(composite, mesh8, donate=False)
    s2, logs2 = pstep(pstate, lr_s, hr_s)

    np.testing.assert_allclose(float(logs1['loss']), float(logs2['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_parallel_step_remat_matches(mesh8):
    """trainer.remat under a mesh computes the identical update (round-3
    fix: the parallel step silently ignored remat)."""
    model, composite, state, lr_img, hr_img = _setup(mesh8)
    pstate = replicate_state(mesh8, state)
    lr_s, hr_s = shard_batch(mesh8, np.asarray(lr_img), np.asarray(hr_img))
    s1, logs1 = make_parallel_train_step(composite, mesh8, donate=False)(
        pstate, lr_s, hr_s)
    s2, logs2 = make_parallel_train_step(
        composite, mesh8, donate=False, remat=True)(pstate, lr_s, hr_s)
    np.testing.assert_allclose(float(logs1['loss']), float(logs2['loss']),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


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

    from srtpu.parallel import shard_eval_batch
    mesh = make_mesh(data=1, spatial=8)
    pstate = replicate_state(mesh, state)
    lr_s, hr_s, m_s = shard_eval_batch(mesh, np.asarray(lr_img),
                                       np.asarray(hr_img), np.asarray(mask))
    peval = make_parallel_eval_step(metrics, mesh)
    sr2, r2 = peval(pstate, lr_s, hr_s, m_s)

    np.testing.assert_allclose(np.asarray(sr1), np.asarray(sr2), atol=1e-5)
    for k in r1:
        np.testing.assert_allclose(float(r1[k]), float(r2[k]), rtol=1e-4)


def test_parallel_eval_under_data_spatial_mesh(mesh8):
    """Batch-1 eval must work under the PRODUCT mesh shape (data=4,
    spatial=2): the image's rows shard over ALL devices, the batch axis
    stays replicated. Regression test for eval silently requiring a
    spatial-only mesh."""
    from srtpu.parallel import shard_eval_batch
    model, composite, state, *_ = _setup(mesh8)
    metrics = build_metrics(['PSNR', 'SSIM'])
    lr_img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    mask = jnp.ones((1, 64, 64, 1))

    from srtpu.train import make_eval_step
    single = make_eval_step(metrics)
    sr1, r1 = single(state, lr_img, hr_img, mask)

    pstate = replicate_state(mesh8, state)
    lr_s, hr_s, m_s = shard_eval_batch(mesh8, np.asarray(lr_img),
                                       np.asarray(hr_img), np.asarray(mask))
    peval = make_parallel_eval_step(metrics, mesh8)
    sr2, r2 = peval(pstate, lr_s, hr_s, m_s)
    np.testing.assert_allclose(np.asarray(sr1), np.asarray(sr2), atol=1e-5)
    for k in r1:
        np.testing.assert_allclose(float(r1[k]), float(r2[k]), rtol=1e-4)


def test_trainer_mesh_validate_matches_single(tmp_path):
    """Trainer.validate under a mesh uses the row-sharded eval step and
    returns the same metrics as single-device validate (VERDICT round 1:
    no code path may silently eval on one device when a mesh is set)."""
    from PIL import Image
    from srtpu.data import SRData
    from srtpu.losses import parse_losses
    from srtpu.train import Trainer, TrainerConfig, create_train_state

    root = tmp_path / 'datasets'
    hr_dir = root / 'MeshVal' / 'HR'
    hr_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(2):
        img = np.kron(rng.random((12, 12, 3)), np.ones((4, 4, 1)))[:44, :46]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            hr_dir / f'im{i}.png')

    dm = SRData(batch_size=2, datasets_dir=root, patch_size=16,
                scale_factor=2, train_datasets=[],
                eval_datasets=['MeshVal'], eval_bucket=16)
    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=1)
    state = create_train_state(
        model, build_optimizer('ADAM', []), jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 3)), parse_losses('l1'))

    cfg = dict(default_root_dir=str(tmp_path / 'run'),
               metrics=('PSNR', 'SSIM'), enable_progress_log=False)
    single = Trainer(TrainerConfig(**cfg)).validate(state, dm)
    mesh = make_mesh(data=4, spatial=2)
    meshed = Trainer(TrainerConfig(**cfg), mesh=mesh).validate(state, dm)
    assert set(single) == set(meshed) and single
    for k in single:
        np.testing.assert_allclose(meshed[k], single[k], rtol=1e-4)


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


@pytest.mark.slow
def test_gan_step_under_mesh_matches_single(mesh8):
    """The fused D+G adversarial step computes the same update data-parallel
    as on a single device (VERDICT round 1: SRGAN silently trained on the
    host default under trainer.devices=8)."""
    from srtpu.models import SRGANDiscriminator, SRGANGenerator
    from srtpu.train.gan import (create_gan_state, make_gan_train_step,
                                 steplr_adam)

    gen = SRGANGenerator(2, 3, 8, 1)
    disc = SRGANDiscriminator(8)
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (8, 8, 8, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
    base = create_gan_state(gen, disc, rng, lr_img,
                            g_tx=steplr_adam(1e-4), d_tx=steplr_adam(1e-4))

    def fresh():
        return jax.tree_util.tree_map(jnp.copy, base)

    single = make_gan_train_step()
    s1, logs1 = single(fresh(), lr_img, hr_img)

    pstate = replicate_state(mesh8, fresh())
    lr_s, hr_s = shard_batch(mesh8, np.asarray(lr_img), np.asarray(hr_img))
    pstep = make_gan_train_step(mesh=mesh8)
    s2, logs2 = pstep(pstate, lr_s, hr_s)

    for k in ('g_loss', 'd_loss'):
        np.testing.assert_allclose(float(logs1[k]), float(logs2[k]),
                                   rtol=1e-4)
    # Adam divides by sqrt(v)+eps, so reduction-order float noise in the
    # sharded grads shows up rescaled in the step-1 update; losses above
    # already match at 1e-4, params need only ~lr-relative tolerance.
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_params),
                    jax.tree_util.tree_leaves(s2.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
