"""End-to-end training slice (SURVEY.md §7 build-order step 2):
SRCNN x2 + L1 + PSNR on a tiny synthetic dataset, single device, with
checkpointing — the CPU-runnable gate (BASELINE.json config 1)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.data import SRData
from srtpu.models import create_model
from srtpu.optim import build_optimizer, parse_optimizer_params
from srtpu.train import Trainer, TrainerConfig, create_train_state


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp('datasets')
    for split, n in (('TinyTrain', 8), ('TinySet5', 3)):
        hr_dir = root / split / 'HR'
        hr_dir.mkdir(parents=True)
        rng = np.random.default_rng(42)
        for i in range(n):
            # smooth images so SR training actually reduces loss
            base = rng.random((12, 12, 3))
            img = np.kron(base, np.ones((4, 4, 1)))[:44, :46]
            Image.fromarray((img * 255).astype(np.uint8)).save(
                hr_dir / f'im{i}.png')
    return root


def test_optimizer_params_parsed_and_honored():
    p = parse_optimizer_params(['lr=0.5', 'betas=0.9,0.99'])
    assert p == {'lr': 0.5, 'betas': (0.9, 0.99)}
    tx = build_optimizer('SGD', ['lr=0.5'])
    params = {'w': jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones(3)}, state, params)
    np.testing.assert_allclose(np.asarray(updates['w']), -0.5, rtol=1e-6)


def test_gradient_clip_norm_and_value():
    """gradient_clip_val / gradient_clip_algorithm (reference Trainer
    knobs, configs/all.yml): 'norm' rescales to the global L2 ball,
    'value' clamps elementwise — verified against hand-scaled grads
    through the same SGD chain."""
    import optax
    from srtpu.train.loop import _clip_chain

    params = {'w': jnp.zeros((4,)), 'b': jnp.zeros((2,))}
    g = {'w': jnp.asarray([3.0, 0.0, 0.0, 0.0]),
         'b': jnp.asarray([0.0, 4.0])}          # global norm 5

    cfg = TrainerConfig(gradient_clip_val=1.0)
    tx = _clip_chain(optax.sgd(1.0), cfg)
    upd, _ = tx.update(g, tx.init(params), params)
    # norm mode: update == -g / 5 (rescaled onto the unit ball)
    np.testing.assert_allclose(np.asarray(upd['w']),
                               [-0.6, 0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd['b']), [0, -0.8], rtol=1e-6)

    cfg = TrainerConfig(gradient_clip_val=1.0,
                        gradient_clip_algorithm='value')
    tx = _clip_chain(optax.sgd(1.0), cfg)
    upd, _ = tx.update(g, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(upd['w']), [-1, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(upd['b']), [0, -1])

    with pytest.raises(ValueError):
        _clip_chain(optax.sgd(1.0),
                    TrainerConfig(gradient_clip_val=1.0,
                                  gradient_clip_algorithm='bogus'))


def test_gradient_clip_applies_to_accumulated_mean():
    """With gradient accumulation the clip must act on the AVERAGED
    accumulated gradient (Lightning clips before optimizer.step), not
    per micro-batch: two grads of norm 4 and 0 average to norm 2, which
    a clip at 1.0 rescales by 1/2 — a per-micro-batch clip would have
    produced mean(clip(4), clip(0)) = 0.5 instead."""
    import optax
    from srtpu.train.loop import _clip_chain

    params = {'w': jnp.zeros((1,))}
    cfg = TrainerConfig(gradient_clip_val=1.0)
    tx = optax.MultiSteps(_clip_chain(optax.sgd(1.0), cfg), 2)
    st = tx.init(params)
    upd, st = tx.update({'w': jnp.asarray([4.0])}, st, params)
    np.testing.assert_allclose(np.asarray(upd['w']), [0.0])   # mid-accum
    upd, st = tx.update({'w': jnp.asarray([0.0])}, st, params)
    np.testing.assert_allclose(np.asarray(upd['w']), [-1.0], rtol=1e-6)


def test_all_optimizers_step():
    for name in ('ADAM', 'SGD', 'RMSprop', 'Ranger', 'RangerQH', 'RangerVA'):
        tx = build_optimizer(name, ['lr=1e-2'])
        params = {'w': jnp.ones((4, 4))}
        state = tx.init(params)
        g = {'w': jnp.full((4, 4), 0.1)}
        for _ in range(8):
            updates, state = tx.update(g, state, params)
            import optax
            params = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(params['w'])))
        assert float(jnp.mean(params['w'])) < 1.0, name


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError, match='not recognized'):
        build_optimizer('Nope', [])


def test_unconsumed_optimizer_params_raise():
    """Unknown/unsupported optimizer params must error, not be silently
    dropped (the reference bug srmodel.py:602 was exactly silent drop)."""
    with pytest.raises(ValueError, match='lr_decay'):
        build_optimizer('ADAM', ['lr=1e-4', 'lr_decay=0.5'])
    with pytest.raises(ValueError, match='typo_knob'):
        build_optimizer('SGD', ['typo_knob=1'])


def test_gradient_centralization_cs_matches_hwio():
    """RangerVA's centralization on stacked CS-arranged weights (L,3C,3C)
    equals centralizing the same gradients in HWIO layout — so the CS and
    XLA param layouts train identically under RangerVA."""
    from srtpu.optim import _centralize
    from srtpu.ops.cs_conv import w_cs_batch, w_hwio_from_cs
    rng = np.random.default_rng(4)
    g_hwio = jnp.asarray(rng.standard_normal((2, 3, 3, 8, 8)), jnp.float32)
    gc = _centralize()
    state = gc.init(None)

    # HWIO path: per-output-channel mean over (h, w, c_in), per block
    ref = g_hwio - jnp.mean(g_hwio, axis=(1, 2, 3), keepdims=True)
    got_cs, _ = gc.update({'w': w_cs_batch(g_hwio)}, state)
    np.testing.assert_allclose(np.asarray(got_cs['w']),
                               np.asarray(w_cs_batch(ref)), atol=1e-6)
    # plain 4-D HWIO kernels keep torch GC-conv semantics
    got4, _ = gc.update({'w': g_hwio[0]}, state)
    np.testing.assert_allclose(np.asarray(got4['w']), np.asarray(ref[0]),
                               atol=1e-6)
    # check round-trip sanity of the layout helper used above
    np.testing.assert_allclose(
        np.asarray(w_hwio_from_cs(w_cs_batch(g_hwio), 8, 8)),
        np.asarray(g_hwio), atol=0)


def test_fit_e2e_srcnn(tiny_dataset, tmp_path):
    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=['TinySet5'], eval_bucket=16)
    model = create_model('SRCNN', scale_factor=2)
    cfg = TrainerConfig(
        max_epochs=3, check_val_every_n_epoch=3, log_loss_every_n_epochs=1,
        default_root_dir=str(tmp_path / 'run'),
        metrics=('PSNR', 'SSIM'), monitor='TinySet5/PSNR',
        num_sanity_val_steps=1, save_results_from_epoch='last',
        save_results=1, log_weights_every_n_epochs=0)
    trainer = Trainer(cfg)
    state = trainer.fit(model, dm, losses='l1', optimizer_name='ADAM',
                        optimizer_params=['lr=1e-3'],
                        hparams={'model': 'SRCNN', 'scale_factor': 2})

    assert int(state.step) == 3 * 2  # 8 imgs / batch 4 = 2 steps/epoch

    # checkpoints written: top-k dir + last + hparams
    ckpt_dir = tmp_path / 'run' / 'checkpoints'
    assert (ckpt_dir / 'hparams.json').exists()
    assert (ckpt_dir / 'last').exists()
    assert json.loads((ckpt_dir / 'hparams.json').read_text())['model'] == \
        'SRCNN'

    # validation image dump at last epoch (epoch gate 'last', 1 image)
    dumped = list((tmp_path / 'run' / 'TinySet5').rglob('*.png'))
    assert any('epoch_00003' in p.name for p in dumped)
    # images are <96px, so the 96px center-crop variant is skipped
    # (reference catches the CenterCrop error and omits it, srmodel.py:248)
    assert not any('_center' in p.name for p in dumped)

    # restore round-trip
    from srtpu.checkpoint import CheckpointManager
    mngr = CheckpointManager(ckpt_dir, monitor='TinySet5/PSNR')
    restored = mngr.restore_last(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    mngr.close()


def test_training_reduces_loss(tiny_dataset):
    """EDSR-tiny x2: loss after 30 steps < first-step loss."""
    from srtpu.losses import parse_losses
    from srtpu.train.steps import make_train_step
    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    dm.setup('fit')
    model = create_model('EDSR', scale_factor=2, n_feats=16, n_resblocks=2)
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    loader = dm.train_loader()
    batch = next(iter(loader))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(batch.lr), composite)
    step = make_train_step(composite)

    first = None
    for epoch in range(15):
        loader.set_epoch(epoch)
        for b in loader:
            state, logs = step(state, jnp.asarray(b.lr), jnp.asarray(b.hr))
            if first is None:
                first = float(logs['loss'])
    final = float(logs['loss'])
    assert final < first * 0.7, (first, final)


def test_batchnorm_model_trains(tiny_dataset):
    """SRResNet carries batch_stats through the train step."""
    from srtpu.losses import parse_losses
    from srtpu.train.steps import make_train_step
    dm = SRData(batch_size=2, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    dm.setup('fit')
    model = create_model('SRResNet', scale_factor=2, n_feats=8,
                         n_resblocks=1)
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    batch = next(iter(dm.train_loader()))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(batch.lr), composite)
    assert state.batch_stats
    bs_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    step = make_train_step(composite)
    state, logs = step(state, jnp.asarray(batch.lr), jnp.asarray(batch.hr))
    bs_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_before), np.asarray(bs_after))


def test_trainable_loss_params_update(tiny_dataset):
    """Adaptive loss latents move with the optimizer (srmodel.py:145-154)."""
    from srtpu.losses import parse_losses
    from srtpu.train.steps import make_train_step
    dm = SRData(batch_size=2, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    dm.setup('fit')
    model = create_model('SRCNN', scale_factor=2)
    composite = parse_losses('0.5 * l1 + 0.5 * adaptive')
    tx = build_optimizer('ADAM', ['lr=1e-2'])
    batch = next(iter(dm.train_loader()))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.asarray(batch.lr), composite)
    before = np.asarray(state.loss_params['1_adaptive']['latent_alpha'])
    step = make_train_step(composite)
    state, logs = step(state, jnp.asarray(batch.lr), jnp.asarray(batch.hr))
    after = np.asarray(state.loss_params['1_adaptive']['latent_alpha'])
    assert not np.allclose(before, after)
    assert 'loss/adaptive' in logs


def test_resume_from_checkpoint(tiny_dataset, tmp_path):
    """Train 2 epochs, resume, train to 4 — step count continues."""
    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=['TinySet5'], eval_bucket=16)
    model = create_model('SRCNN', scale_factor=2)
    root = tmp_path / 'resume_run'
    base = dict(check_val_every_n_epoch=2, log_loss_every_n_epochs=10,
                default_root_dir=str(root), metrics=('PSNR',),
                monitor='TinySet5/PSNR', num_sanity_val_steps=0,
                log_weights_every_n_epochs=0)
    state1 = Trainer(TrainerConfig(max_epochs=2, **base)).fit(
        model, dm, losses='l1')
    assert int(state1.step) == 4  # 2 steps/epoch

    cfg2 = TrainerConfig(max_epochs=4, ckpt_path='last', **base)
    trainer2 = Trainer(cfg2)
    state2 = trainer2.fit(model, dm, losses='l1')
    assert int(state2.step) == 8  # resumed at epoch 2, trained 2 more


@pytest.mark.parametrize('opt_name', ['Ranger', 'RangerQH', 'RangerVA'])
def test_opt_state_restore_exact_per_leaf(tiny_dataset, tmp_path, opt_name):
    """Checkpoint restore maps every optimizer-state leaf back by PATH,
    not by flattened order. Regression test for the template-free restore
    bug: Orbax re-flattens dicts alphabetically, and LookaheadState(inner,
    slow, count) has non-alphabetical field order, so an order-based
    tree_unflatten silently permuted the Ranger family's state ('count'
    restored into 'inner'). Adam round-tripped only by coincidence."""
    from srtpu.checkpoint import CheckpointManager
    from srtpu.losses import parse_losses
    from srtpu.train.steps import dealias_state, make_train_step
    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    dm.setup('fit')
    model = create_model('SRCNN', scale_factor=2)
    composite = parse_losses('l1')
    tx = build_optimizer(opt_name, ['lr=1e-3'])
    batch = next(iter(dm.train_loader()))
    lr, hr = jnp.asarray(batch.lr), jnp.asarray(batch.hr)
    state = dealias_state(create_train_state(model, tx, jax.random.PRNGKey(0),
                                             lr, composite))
    step = make_train_step(composite)
    for _ in range(3):  # make moments/slow-weights non-trivial + distinct
        state, _ = step(state, lr, hr)

    ckpt_dir = tmp_path / f'ckpt_{opt_name}'
    mngr = CheckpointManager(ckpt_dir, monitor='', save_top_k=0)
    mngr.save(int(state.step), state, {})
    fresh = create_train_state(model, tx, jax.random.PRNGKey(1), lr,
                               composite)
    restored = dealias_state(mngr.restore_last(fresh))
    mngr.close()

    saved_leaves = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
    rest_leaves = jax.tree_util.tree_flatten_with_path(restored.opt_state)[0]
    assert len(saved_leaves) == len(rest_leaves)
    for (p1, l1), (p2, l2) in zip(saved_leaves, rest_leaves):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   err_msg=jax.tree_util.keystr(p1))

    # continued training from the restored state is bit-identical to
    # continuing from the original
    s_a, logs_a = step(state, lr, hr)
    s_b, logs_b = step(restored, lr, hr)
    np.testing.assert_allclose(float(logs_a['loss']), float(logs_b['loss']))
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_step_matches_plain(tiny_dataset):
    """jax.checkpoint'ed step produces identical updates."""
    from srtpu.losses import parse_losses
    from srtpu.train.steps import make_train_step
    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=1)
    composite = parse_losses('l1')
    tx = build_optimizer('SGD', ['lr=1e-2'])
    rng = jax.random.PRNGKey(0)
    lr_img = jax.random.uniform(rng, (2, 8, 8, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    s0 = create_train_state(model, tx, rng, lr_img, composite)
    plain = make_train_step(composite, donate=False)(s0, lr_img, hr_img)
    remat = make_train_step(composite, donate=False, remat=True)(
        s0, lr_img, hr_img)
    np.testing.assert_allclose(float(plain[1]['loss']),
                               float(remat[1]['loss']), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(plain[0].params),
                    jax.tree_util.tree_leaves(remat[0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_steps_per_execution_matches_single(tiny_dataset, tmp_path):
    """steps_per_execution=2 produces the same final params as 1 (same
    batches, same order) and the same step count."""
    def fit(spe, root):
        dm = SRData(batch_size=2, datasets_dir=tiny_dataset, patch_size=16,
                    scale_factor=2, train_datasets=['TinyTrain'],
                    eval_datasets=[])
        model = create_model('SRCNN', scale_factor=2)
        cfg = TrainerConfig(max_epochs=2, check_val_every_n_epoch=5,
                            default_root_dir=str(tmp_path / root),
                            num_sanity_val_steps=0, enable_checkpointing=False,
                            log_weights_every_n_epochs=0,
                            steps_per_execution=spe)
        return Trainer(cfg).fit(model, dm, losses='l1',
                                optimizer_params=['lr=1e-3'])

    s1 = fit(1, 'a')
    s2 = fit(2, 'b')
    assert int(s1.step) == int(s2.step) == 8  # 4 steps/epoch x 2
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_grad_accumulation_matches_large_batch(tiny_dataset):
    """k accumulation steps of batch B take ONE optimizer step equal (to
    float tolerance) to a single step on the k*B batch — optax.MultiSteps
    averages micro-batch grads (reference accumulate_grad_batches,
    all.yml:65)."""
    import optax
    from srtpu.losses import parse_losses
    from srtpu.train.steps import dealias_state, make_train_step
    k = 4
    rng = np.random.default_rng(0)
    lr_big = rng.random((8, 8, 8, 3)).astype(np.float32)
    hr_big = rng.random((8, 16, 16, 3)).astype(np.float32)

    model = create_model('SRCNN', scale_factor=2)
    composite = parse_losses('l1')
    init_rng = jax.random.PRNGKey(0)

    # one step on the full batch
    tx_full = build_optimizer('SGD', ['lr=0.1'])
    s_full = dealias_state(create_train_state(
        model, tx_full, init_rng, jnp.asarray(lr_big), composite))
    step_full = make_train_step(composite)
    s_full, _ = step_full(s_full, jnp.asarray(lr_big), jnp.asarray(hr_big))

    # k accumulation micro-steps of batch 2
    tx_acc = optax.MultiSteps(build_optimizer('SGD', ['lr=0.1']), k)
    s_acc = dealias_state(create_train_state(
        model, tx_acc, init_rng, jnp.asarray(lr_big[:2]), composite))
    step_acc = make_train_step(composite)
    for i in range(k):
        s_acc, _ = step_acc(s_acc, jnp.asarray(lr_big[2 * i:2 * i + 2]),
                            jnp.asarray(hr_big[2 * i:2 * i + 2]))

    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_acc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fit_with_accumulate_grad_batches(tiny_dataset, tmp_path):
    """Trainer honors accumulate_grad_batches end to end (the knob was
    previously wired but untested)."""
    dm = SRData(batch_size=2, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    model = create_model('SRCNN', scale_factor=2)
    cfg = TrainerConfig(max_epochs=2, accumulate_grad_batches=2,
                        default_root_dir=str(tmp_path / 'acc'),
                        enable_checkpointing=False, num_sanity_val_steps=0,
                        log_weights_every_n_epochs=0)
    before_state = Trainer(cfg).fit(model, dm, losses='l1',
                                    optimizer_params=['lr=1e-3'])
    # 8 imgs / batch 2 = 4 micro-steps/epoch, 2 epochs
    assert int(before_state.step) == 8


def test_overfit_batches_repeats_same_batch(tiny_dataset, tmp_path):
    """overfit_batches=1 trains on the SAME batch every epoch (sampler
    epoch pinned) and drives its loss far down (reference all.yml:87)."""
    from srtpu.losses import parse_losses
    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=[])
    model = create_model('EDSR', scale_factor=2, n_feats=16, n_resblocks=2)
    cfg = TrainerConfig(max_epochs=60, overfit_batches=1,
                        default_root_dir=str(tmp_path / 'ov'),
                        enable_checkpointing=False, num_sanity_val_steps=0,
                        enable_progress_log=False,
                        log_weights_every_n_epochs=0)
    state = Trainer(cfg).fit(model, dm, losses='l1',
                             optimizer_params=['lr=2e-3'])
    assert int(state.step) == 60  # exactly 1 batch per epoch

    # the pinned batch is memorized: its loss is far below a fresh batch's
    from srtpu.train.steps import make_train_step
    dm.setup('fit')
    loader = dm.train_loader()
    loader.set_epoch(0)
    batch0 = next(iter(loader))
    step = make_train_step(parse_losses('l1'), donate=False)
    _, logs = step(state, jnp.asarray(batch0.lr), jnp.asarray(batch0.hr))
    assert float(logs['loss']) < 0.05, float(logs['loss'])


def test_crash_containment_saves_artifacts(tiny_dataset, tmp_path,
                                           monkeypatch):
    """A mid-fit exception still persists a resumable 'last' checkpoint and
    the JSONL metrics export survives (reference wraps fit and uploads
    artifacts on crash, train.py:240-257)."""
    import srtpu.train.loop as loop_mod

    calls = {'n': 0}
    real = loop_mod.make_train_step

    def exploding(composite, **kw):
        step = real(composite, **kw)

        def wrapped(state, lr, hr):
            calls['n'] += 1
            if calls['n'] >= 3:
                raise RuntimeError('synthetic mid-fit failure')
            return step(state, lr, hr)
        return wrapped

    monkeypatch.setattr(loop_mod, 'make_train_step', exploding)

    dm = SRData(batch_size=4, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=['TinySet5'], eval_bucket=16)
    model = create_model('SRCNN', scale_factor=2)
    root = tmp_path / 'crash_run'
    cfg = TrainerConfig(max_epochs=5, check_val_every_n_epoch=1,
                        default_root_dir=str(root), metrics=('PSNR',),
                        monitor='TinySet5/PSNR', num_sanity_val_steps=0,
                        enable_progress_log=False,
                        log_weights_every_n_epochs=0)
    with pytest.raises(RuntimeError, match='synthetic mid-fit failure'):
        Trainer(cfg).fit(model, dm, losses='l1',
                         hparams={'model': 'SRCNN'})

    # crash checkpoint is resumable
    assert (root / 'checkpoints' / 'last').exists()
    from srtpu.checkpoint import CheckpointManager
    from srtpu.losses import parse_losses
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 3)), parse_losses('l1'))
    mngr = CheckpointManager(root / 'checkpoints', monitor='')
    restored = mngr.restore_last(state)
    mngr.close()
    assert int(restored.step) == 2  # crashed on the 3rd step

    # tracker exports survived: metrics.jsonl has epoch-1 val scalars,
    # params.json has the hparams, assets.json lists the bundle
    lines = [json.loads(x) for x in
             (root / 'metrics.jsonl').read_text().splitlines()]
    assert any('TinySet5/PSNR' in rec for rec in lines)
    assert json.loads((root / 'params.json').read_text())['model'] == 'SRCNN'
    assets = json.loads((root / 'assets.json').read_text())
    assert any('checkpoints' in a for a in assets)


def test_in_epoch_step_progress_cadence(tiny_dataset, tmp_path, caplog):
    """log_every_n_steps drives in-epoch progress lines (reference
    ItemsProgressBar items/s, train.py:17-81) — previously a dead knob."""

    from srtpu.utils.logging import PRINT

    dm = SRData(batch_size=2, datasets_dir=tiny_dataset, patch_size=16,
                scale_factor=2, train_datasets=['TinyTrain'],
                eval_datasets=['TinySet5'], eval_bucket=16)
    model = create_model('SRCNN', scale_factor=2)
    cfg = TrainerConfig(max_epochs=1, check_val_every_n_epoch=5,
                        default_root_dir=str(tmp_path / 'run'),
                        metrics=('PSNR',), num_sanity_val_steps=0,
                        enable_checkpointing=False,
                        log_weights_every_n_epochs=0,
                        limit_train_batches=4, log_every_n_steps=2)
    with caplog.at_level(PRINT, logger='srtpu.train.loop'):
        Trainer(cfg).fit(model, dm)
    step_lines = [r.message for r in caplog.records
                  if 'step ' in r.message and 'items/s' in r.message]
    # 4 batches at cadence 2 -> lines at steps 2 and 4
    assert len(step_lines) == 2
    assert 'step 2/4' in step_lines[0] and 'step 4/4' in step_lines[1]
