"""Trainer: fit / validate / predict orchestration.

Capability parity with the reference training core (models/srmodel.py) plus
the Lightning Trainer behaviors the reference relies on:
* epoch loop with validation every N epochs (all.yml:79) and sanity-check
  val pass before training (num_sanity_val_steps, srmodel.py:187,346);
* last-batch loss logging every log_loss_every_n_epochs
  (on_train_epoch_end, srmodel.py:173-212);
* per-dataset metric aggregation keyed ``{dataset}/{metric}``
  (srmodel.py:567-593, 345-373) feeding the checkpoint monitor;
* epoch-gated SR image dumps (all/last/half/quarter x save_results count,
  srmodel.py:234-331): SR, 96px center crop, edge/sketch variants, one-time
  HR versions, per-image metric logs;
* predict loop saving ``{root}/{dataset}/{img}.png`` (+_center)
  (predict_step, srmodel.py:375-433);
* progress reporting in items/sec (reference ItemsProgressBar,
  train.py:17-81).

TPU-native: the train step is one compiled program; eval compiles one
program per shape bucket; batches stream via the prefetching loader.
"""

from __future__ import annotations

import logging
import logging.handlers
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from srtpu.checkpoint import CheckpointManager
from srtpu.losses import extract_edges, pencil_sketch
from srtpu.metrics import LOWER_IS_BETTER, build_metrics
from srtpu.utils.imgops import center_crop
from srtpu.utils.logging import PRINT, save_image
from srtpu.utils.tracking import MultiTracker
from .state import TrainState, create_train_state
from .steps import (dealias_state, make_eval_step, make_predict_step,
                    make_train_step)

_logger = logging.getLogger(__name__)


@dataclass
class TrainerConfig:
    max_epochs: int = 20
    check_val_every_n_epoch: int = 1
    log_loss_every_n_epochs: int = 5
    log_weights_every_n_epochs: int = 50
    default_root_dir: str = '.'
    save_results: int = -1                  # max images saved per dataset
    save_results_from_epoch: str = 'last'   # all | last | half | quarter
    metrics: tuple[str, ...] = ('PSNR', 'SSIM')
    metrics_for_pbar: tuple[str, ...] = ('PSNR', 'SSIM')
    monitor: str | None = None              # e.g. 'DIV2K/PSNR'
    save_top_k: int = 3
    num_sanity_val_steps: int = 2
    accumulate_grad_batches: int = 1
    limit_train_batches: int | None = None
    limit_val_batches: int | None = None
    overfit_batches: int = 0   # >0: train on the SAME N batches every epoch
    #                            (sampler epoch pinned; overfit harness,
    #                            reference all.yml:87)
    fast_dev_run: bool = False
    seed: int = 42
    enable_checkpointing: bool = True
    enable_progress_log: bool = True
    profiler_dir: str | None = None         # jax.profiler trace directory
    log_every_n_steps: int = 50             # in-epoch progress cadence
    #                                         (reference ItemsProgressBar,
    #                                         train.py:17-81: live items/s)
    ckpt_path: str | None = None            # 'last' or a checkpoints dir
    gradient_clip_val: float | None = None  # reference Trainer knob
    #                                         (all.yml gradient_clip_val)
    gradient_clip_algorithm: str = 'norm'   # 'norm' (global L2) | 'value'
    detect_anomaly: bool = False            # jax_debug_nans (all.yml:81)
    deterministic: bool = False             # fixed seeds everywhere
    remat: bool = False                     # jax.checkpoint the forward
    predict_tile: int = 0                   # >0: tile huge predict images
    predict_tile_overlap: int = 32          # LR px, >= receptive radius
    steps_per_execution: int = 1            # scan k steps per dispatch
    eval_tile: int = 80                     # tile-batched kernel-path eval/
    #                                         predict on TPU for CS models:
    #                                         full-size images run the CS
    #                                         Pallas kernels in fixed-shape
    #                                         tile batches instead of the
    #                                         XLA fallback (train/tiled.py).
    #                                         0 disables (plain full-image
    #                                         forward, reference behavior)
    eval_tile_overlap: int = 8              # LR px halo per tile edge; the
    #                                         seam error vs a full-image
    #                                         forward is bounded and
    #                                         measured (PERF.md serving
    #                                         section); raise towards the
    #                                         receptive radius for exact
    #                                         interiors at more recompute


def _clip_chain(tx, cfg: TrainerConfig):
    """Prepend gradient clipping to an optimizer chain (reference Trainer
    knobs gradient_clip_val / gradient_clip_algorithm, configs/all.yml).
    Applied INSIDE optax.MultiSteps wrapping, so with gradient
    accumulation the clip acts on the averaged accumulated gradient —
    the same point Lightning clips at (before optimizer.step)."""
    import optax
    val = cfg.gradient_clip_val
    if not val:
        return tx
    algo = (cfg.gradient_clip_algorithm or 'norm').lower()
    if algo == 'norm':
        clip = optax.clip_by_global_norm(float(val))
    elif algo == 'value':
        clip = optax.clip(float(val))
    else:
        raise ValueError(
            f"gradient_clip_algorithm must be 'norm' or 'value', "
            f"got {algo!r}")
    return optax.chain(clip, tx)


class Trainer:
    def __init__(self, config: TrainerConfig, mesh=None, batch_sharding=None):
        self.cfg = config
        self.mesh = mesh
        self.batch_sharding = batch_sharding
        self.root = Path(config.default_root_dir)
        self.root.mkdir(parents=True, exist_ok=True)
        # fan-out tracker: TensorBoard + always-on JSONL export + optional
        # Comet (reference's Comet/TB logger pair, SURVEY.md §5)
        self.tb = MultiTracker(self.root, self.root / 'tensorboard_logs')
        # programmatic (non-CLI) use: make sure run.log still lands in the
        # run root — the reference always writes one (train.py:84-143).
        # Only ATTACH the file handler; never touch handlers/levels the
        # embedding application may have configured (the CLI path calls
        # the full setup_log itself).
        root_logger = logging.getLogger()
        if not any(isinstance(h, logging.handlers.RotatingFileHandler)
                   for h in root_logger.handlers):
            from srtpu.utils.logging import attach_run_log
            attach_run_log(self.root)
        self.global_step = 0
        self._last_progress_step = 0
        self.current_epoch = 0
        self._ckpt: CheckpointManager | None = None

    def close(self) -> None:
        """Release tracker backends (ends the Comet experiment, closes the
        metrics.jsonl handle). Idempotent; the CLI calls it after each
        command, __del__ is the best-effort backstop for embedders."""
        self.tb.close()

    def __del__(self):
        try:
            self.tb.close()
        except Exception:
            pass

    # ------------------------------------------------------------------ fit

    def fit(self, model, datamodule, losses: str = 'l1',
            optimizer_name: str = 'ADAM',
            optimizer_params: list[str] | None = None,
            hparams: dict[str, Any] | None = None,
            state: TrainState | None = None) -> TrainState:
        from srtpu.losses import parse_losses
        from srtpu.optim import build_optimizer
        import optax

        cfg = self.cfg
        datamodule.prepare()
        datamodule.setup('fit')

        from srtpu.models import SRGAN
        if isinstance(model, SRGAN):
            # SRGAN ignores the loss DSL and trains adversarially
            # (reference srgan.py:136-222 overrides training_step)
            return self._fit_gan(model, datamodule,
                                 optimizer_params=optimizer_params,
                                 hparams=hparams)

        composite = parse_losses(losses)
        self._warn_missing_pretrained(composite)
        tx = build_optimizer(optimizer_name, optimizer_params)
        tx = _clip_chain(tx, cfg)
        if cfg.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)

        if cfg.detect_anomaly:
            # autograd-anomaly analog (reference all.yml:81): crash on the
            # first op producing a NaN, with its name in the traceback
            jax.config.update('jax_debug_nans', True)

        train_loader = datamodule.train_loader(sharding=self.batch_sharding)
        sample_lr = jnp.asarray(train_loader.peek().lr)

        # overfit harness (reference all.yml:87): train on the SAME first N
        # batches every epoch — the sampler epoch is pinned below so the
        # patch positions/augments repeat too
        limit_train = cfg.limit_train_batches
        if cfg.overfit_batches > 0:
            limit_train = cfg.overfit_batches

        if state is None:
            rng = jax.random.PRNGKey(0 if cfg.deterministic else cfg.seed)
            state = create_train_state(model, tx, rng, sample_lr, composite)

        if cfg.ckpt_path:
            # resume-from-checkpoint (reference save_last + ckpt_path
            # plumbing, SURVEY.md §5 checkpoint/resume)
            ckpt_dir = (self.root / 'checkpoints'
                        if cfg.ckpt_path == 'last' else Path(cfg.ckpt_path))
            mngr = CheckpointManager(ckpt_dir, monitor='')
            try:
                state = mngr.restore_last(state)
            finally:
                mngr.close()
            steps_per_epoch = len(train_loader)
            if limit_train is not None:
                steps_per_epoch = min(steps_per_epoch, limit_train)
            steps_per_epoch = max(steps_per_epoch, 1)
            self.current_epoch = int(state.step) // steps_per_epoch
            self.global_step = int(state.step)
            _logger.log(PRINT, 'resumed from %s at epoch %d (step %d)',
                        ckpt_dir, self.current_epoch, self.global_step)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
        _logger.log(PRINT, 'model parameters: %s (%.2f MB fp32)',
                    f'{n_params:,}', n_params * 4 / 2 ** 20)
        # before-fit bookkeeping (reference Comet log_code + set_model_graph
        # + param counts, main.py:45-74): source snapshot + model summary
        # land in the run root and the tracker asset list
        self._log_run_assets(state.params, type(model).__name__,
                             apply_fn=state.apply_fn, sample=sample_lr,
                             batch_stats=state.batch_stats)

        spe = max(int(cfg.steps_per_execution), 1)
        if cfg.fast_dev_run:
            spe = 1  # fast_dev_run wants exactly one observable step
        multi_step = None
        if self.mesh is not None:
            from srtpu.parallel import (make_parallel_train_step,
                                        replicate_state)
            state = replicate_state(self.mesh, state)
            train_step = make_parallel_train_step(composite, self.mesh,
                                                  remat=cfg.remat)
            if spe > 1:
                _logger.warning('steps_per_execution>1 is single-device '
                                'only; ignoring under a mesh')
                spe = 1
        else:
            # donated steps need unique buffers per leaf (see dealias_state)
            state = dealias_state(state)
            train_step = make_train_step(composite, remat=cfg.remat)
            if spe > 1:
                from .steps import make_multi_train_step
                multi_step = make_multi_train_step(composite, spe,
                                                   remat=cfg.remat)
        eval_step = self._make_eval_step(build_metrics(list(cfg.metrics)),
                                         model=model)
        self._edge_ops = [s.name for s in composite.sub_losses
                          if s.name in ('edge_loss', 'pencil_sketch')]
        self._saved_hr_versions: set[str] = set()

        monitor = cfg.monitor
        if monitor is None and datamodule.eval_dataset_names and cfg.metrics:
            monitor = f'{datamodule.eval_dataset_names[0]}/{cfg.metrics[0]}'
        if cfg.enable_checkpointing:
            metric_name = monitor.split('/')[-1] if monitor else ''
            self._ckpt = CheckpointManager(
                self.root / 'checkpoints', monitor=monitor or '',
                mode='min' if metric_name in LOWER_IS_BETTER else 'max',
                save_top_k=cfg.save_top_k, hparams=hparams or {})
        if hparams:
            # before-fit config logging (reference Comet log_parameters,
            # main.py:45-74)
            self.tb.params(hparams)

        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs

        # Lightning-style sanity check: a couple of val steps before training
        if cfg.num_sanity_val_steps and not cfg.fast_dev_run:
            self._run_validation(state, eval_step, datamodule,
                                 limit=cfg.num_sanity_val_steps,
                                 sanity=True)

        if cfg.profiler_dir:
            jax.profiler.start_trace(cfg.profiler_dir)

        last_logs = None
        try:
            for epoch in range(self.current_epoch, max_epochs):
                self.current_epoch = epoch
                t0 = time.time()
                items = 0
                n_batches = len(train_loader)
                if limit_train is not None:
                    n_batches = min(n_batches, limit_train)
                train_loader.set_epoch(
                    0 if cfg.overfit_batches > 0 else epoch)
                if spe > 1:
                    # steps_per_execution: stack k batches, scan on device
                    pend_lr, pend_hr = [], []
                    for i, batch in enumerate(train_loader):
                        if limit_train is not None and i >= limit_train:
                            break
                        pend_lr.append(np.asarray(batch.lr))
                        pend_hr.append(np.asarray(batch.hr))
                        if len(pend_lr) == spe:
                            state, logs = multi_step(
                                state, jnp.asarray(np.stack(pend_lr)),
                                jnp.asarray(np.stack(pend_hr)))
                            last_logs = logs
                            self.global_step += spe
                            items += sum(a.shape[0] for a in pend_lr)
                            pend_lr, pend_hr = [], []
                            self._step_progress(i, n_batches, items, t0,
                                                logs)
                    # remainder batches run through the single step
                    for a, b in zip(pend_lr, pend_hr):
                        state, last_logs = train_step(state, jnp.asarray(a),
                                                      jnp.asarray(b))
                        self.global_step += 1
                        items += a.shape[0]
                else:
                    for i, batch in enumerate(train_loader):
                        if limit_train is not None and i >= limit_train:
                            break
                        if cfg.fast_dev_run and i >= 1:
                            break
                        state, logs = train_step(state,
                                                 jnp.asarray(batch.lr),
                                                 jnp.asarray(batch.hr))
                        last_logs = logs
                        self.global_step += 1
                        items += np.asarray(batch.lr).shape[0]
                        self._step_progress(i, n_batches, items, t0, logs)

                dt = max(time.time() - t0, 1e-9)
                if cfg.enable_progress_log:
                    loss_val = float(last_logs['loss']) if last_logs else 0.0
                    _logger.log(
                        PRINT, 'epoch %d/%d  loss %.4f  %.1f items/s',
                        epoch + 1, max_epochs, loss_val, items / dt)

                # on_train_epoch_end: log last-batch losses (srmodel.py:173)
                if last_logs is not None and \
                        (epoch + 1) % cfg.log_loss_every_n_epochs == 0:
                    scalars = {k: float(v) for k, v in last_logs.items()
                               if k != 'loss'}
                    scalars['loss/total'] = float(last_logs['loss'])
                    self.tb.scalars(scalars, self.global_step)

                if cfg.log_weights_every_n_epochs > 0 and \
                        (epoch + 1) % cfg.log_weights_every_n_epochs == 0:
                    self._log_weight_histograms(state)

                if (epoch + 1) % cfg.check_val_every_n_epoch == 0 \
                        or epoch + 1 == max_epochs:
                    metrics = self._run_validation(state, eval_step,
                                                   datamodule)
                    if self._ckpt is not None:
                        self._ckpt.save(epoch + 1, state, metrics)
        except BaseException as e:
            # crash containment (reference train.py:240-257 semantics, plus
            # keeping the weights): ANY failure — OOM, NaN crash, Ctrl-C —
            # still persists a resumable 'last' checkpoint, writes the
            # traceback to run.log, and flushes tracker artifacts via the
            # finally block below before re-raising.
            if self._ckpt is not None:
                _logger.log(PRINT, '%s during fit — saving last checkpoint',
                            type(e).__name__)
                try:
                    self._ckpt.save(self.current_epoch + 1, state, {})
                except Exception:
                    _logger.exception('failed to save crash checkpoint')
            if not isinstance(e, KeyboardInterrupt):
                _logger.exception('fit crashed')
            raise
        finally:
            if cfg.profiler_dir:
                jax.profiler.stop_trace()
            if self._ckpt is not None:
                self._ckpt.close()
            self._record_run_artifacts()
        return state

    def _log_run_assets(self, params, model_name: str,
                        apply_fn=None, sample=None,
                        batch_stats=None) -> None:
        """Source-code snapshot + model summary + model graph (reference
        Comet ``log_code`` and ``set_model_graph`` main.py:45-74, TB
        ``log_graph`` via example_input_array srmodel.py:105-108): a zip
        of the srtpu package, a per-leaf param listing, and — when the
        forward is provided — the StableHLO text of the traced forward
        (the XLA-native model graph, same artifact as
        ``srtpu export --mlir``), written to the run root and registered
        as tracker assets."""
        try:
            lines = [f'model: {model_name}', '']
            total = 0
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
                name = '/'.join(getattr(p, 'key', str(p)) for p in path)
                lines.append(f'{name:60s} {str(leaf.shape):20s} '
                             f'{leaf.dtype}  {leaf.size:,}')
                total += leaf.size
            lines += ['', f'total parameters: {total:,} '
                      f'({total * 4 / 2 ** 20:.2f} MB fp32)']
            summary = self.root / 'model_summary.txt'
            summary.write_text('\n'.join(lines))
            self.tb.asset(summary)

            import zipfile
            import srtpu
            pkg = Path(srtpu.__file__).parent
            snap = self.root / 'source_snapshot.zip'
            with zipfile.ZipFile(snap, 'w', zipfile.ZIP_DEFLATED) as zf:
                for f in sorted(pkg.rglob('*.py')):
                    zf.write(f, f'srtpu/{f.relative_to(pkg)}')
                for f in sorted(pkg.parent.glob('native/*.cc')):
                    zf.write(f, f'native/{f.name}')
            self.tb.asset(snap)

            if apply_fn is not None and sample is not None:
                variables = {'params': params}
                if batch_stats:
                    variables['batch_stats'] = batch_stats
                graph = jax.jit(
                    lambda v, x: apply_fn(v, x, train=False)).lower(
                        variables, sample).as_text('stablehlo')
                graph_path = self.root / 'model_graph.stablehlo.txt'
                graph_path.write_text(graph)
                self.tb.asset(graph_path)
        except Exception:  # bookkeeping must never kill training
            _logger.warning('run-asset logging failed', exc_info=True)

    def _step_progress(self, i: int, n_batches: int, items: int, t0: float,
                       logs, loss_keys=('loss',)) -> None:
        """In-epoch progress line every log_every_n_steps batches
        (reference ItemsProgressBar items/s display, train.py:17-81) +
        train-loss scalar to the tracker. Costs one device sync per log
        (the loss value fetch), so the cadence should stay >> 1."""
        cfg = self.cfg
        n = cfg.log_every_n_steps
        if not cfg.enable_progress_log or n <= 0:
            return
        # global-step based cadence: with steps_per_execution > 1 this is
        # only evaluated on multi-step boundaries, so a modulo on the
        # batch index would fire every lcm(spe, n) batches instead of ~n
        if self.global_step - self._last_progress_step < n:
            return
        self._last_progress_step = self.global_step
        dt = max(time.time() - t0, 1e-9)
        vals = {k: float(logs[k]) for k in loss_keys if k in logs}
        total = f'/{n_batches}' if n_batches else ''
        _logger.log(PRINT, 'epoch %d  step %d%s  %s  %.1f items/s',
                    self.current_epoch + 1, i + 1, total,
                    '  '.join(f'{k} {v:.4f}' for k, v in vals.items()),
                    items / dt)
        self.tb.scalars({f'train/{k}': v for k, v in vals.items()},
                        self.global_step)

    def _record_run_artifacts(self) -> None:
        """Post-fit artifact bundle (reference after_fit uploads last.ckpt +
        run.log to Comet, main.py:76-84) — runs on success AND on crash."""
        try:
            ckpts = self.root / 'checkpoints'
            if ckpts.exists():
                self.tb.asset(ckpts)
            run_log = self.root / 'run.log'
            if run_log.exists():
                self.tb.asset(run_log)
            self.tb.flush()
        except Exception:
            _logger.warning('recording run artifacts failed', exc_info=True)

    # ------------------------------------------------------------ GAN fit

    def _gan_eval_view(self, model, gstate) -> TrainState:
        """Expose GAN state through the standard TrainState shape so the
        eval step, image dumps, and checkpoint manager work unchanged.
        SRGAN's __call__ runs the generator (reference srgan.py:133-134),
        so eval/predict on the combined param tree is the generator path.
        """
        return TrainState(
            step=gstate.step,
            params={'generator': gstate.g_params,
                    'discriminator': gstate.d_params},
            batch_stats={'generator': gstate.g_batch_stats,
                         'discriminator': gstate.d_batch_stats},
            loss_params={},
            opt_state={'g': gstate.g_opt_state, 'd': gstate.d_opt_state},
            apply_fn=model.apply, tx=None)

    def _fit_gan(self, model, datamodule, optimizer_params=None,
                 hparams=None):

        import optax

        from srtpu.losses.vgg import VGGLoss
        from srtpu.models import SRGANDiscriminator, SRGANGenerator
        from srtpu.optim import parse_optimizer_params
        from .gan import create_gan_state, make_gan_train_step, steplr_adam

        cfg = self.cfg
        opt_kw = parse_optimizer_params(optimizer_params)
        lr = opt_kw.get('lr', 1e-4)

        generator = SRGANGenerator(model.scale_factor, model.channels,
                                   model.ngf, model.n_blocks, model.dtype)
        discriminator = SRGANDiscriminator(model.ndf, model.dtype)

        # the SRGAN generator objective includes a VGG feature term
        # (gan.py:87-88 / reference srgan.py:155-167) — without converted
        # torchvision weights it silently optimizes random features, so
        # surface the same banner the scalar fit path shows
        vgg = VGGLoss(net_type='vgg19', layer='relu5_4')
        if getattr(vgg, 'pretrained', True) is False:
            _logger.log(
                PRINT,
                '=' * 66 + "\nWARNING: SRGAN's VGG content term is running "
                'on deterministic random-init features (no converted '
                'pretrained weights found) — the training objective will '
                'not match the reference. Convert weights with '
                'tools/convert_torch_weights.py into $SRTPU_WEIGHTS_DIR.\n'
                + '=' * 66)

        g_tx, d_tx = steplr_adam(lr), steplr_adam(lr)
        g_tx, d_tx = _clip_chain(g_tx, cfg), _clip_chain(d_tx, cfg)
        if cfg.accumulate_grad_batches > 1:
            # same accumulation semantics as the scalar fit path
            # (reference all.yml:65): params move every k batches
            g_tx = optax.MultiSteps(g_tx, cfg.accumulate_grad_batches)
            d_tx = optax.MultiSteps(d_tx, cfg.accumulate_grad_batches)

        train_loader = datamodule.train_loader(sharding=self.batch_sharding)
        rng = jax.random.PRNGKey(cfg.seed)
        gstate = create_gan_state(generator, discriminator, rng,
                                  jnp.asarray(train_loader.peek().lr),
                                  g_tx=g_tx, d_tx=d_tx)

        start_epoch = 0
        if cfg.ckpt_path:
            # resume: restore through the combined-view layout and unpack
            ckpt_dir = (self.root / 'checkpoints'
                        if cfg.ckpt_path == 'last' else Path(cfg.ckpt_path))
            view = self._gan_eval_view(model, gstate)
            mngr = CheckpointManager(ckpt_dir, monitor='')
            try:
                view = mngr.restore_last(view)
            finally:
                mngr.close()
            gstate = gstate.replace(
                step=jnp.asarray(view.step),
                g_params=view.params['generator'],
                d_params=view.params['discriminator'],
                g_batch_stats=view.batch_stats['generator'],
                d_batch_stats=view.batch_stats['discriminator'],
                # template-based restore (CheckpointManager.restore_last)
                # returns opt states already in the live NamedTuple
                # structure — or the fresh ones on structure mismatch;
                # order-based tree_unflatten would permute NamedTuple
                # fields (Orbax re-flattens dicts alphabetically)
                g_opt_state=view.opt_state['g'],
                d_opt_state=view.opt_state['d'])
            steps_per_epoch = max(len(train_loader), 1)
            start_epoch = int(gstate.step) // steps_per_epoch
            self.global_step = int(gstate.step)
            _logger.log(PRINT, 'resumed GAN from %s at epoch %d (step %d)',
                        ckpt_dir, start_epoch, self.global_step)

        self._log_run_assets(
            {'generator': gstate.g_params,
             'discriminator': gstate.d_params}, 'SRGAN',
            # graph asset: the generator forward (the serving graph)
            apply_fn=lambda v, x, train=False: gstate.g_apply(
                {'params': v['params']['generator'],
                 **({'batch_stats': v['batch_stats']}
                    if 'batch_stats' in v else {})}, x, train=train),
            sample=jnp.asarray(train_loader.peek().lr),
            batch_stats=gstate.g_batch_stats)
        if self.mesh is not None:
            from srtpu.parallel import replicate_state
            gstate = replicate_state(self.mesh, gstate)
        gstate = dealias_state(gstate)
        gan_step = make_gan_train_step(vgg_loss=vgg, mesh=self.mesh)
        eval_step = self._make_eval_step(build_metrics(list(cfg.metrics)))
        self._edge_ops = []
        self._saved_hr_versions = set()

        monitor = cfg.monitor
        if monitor is None and datamodule.eval_dataset_names and cfg.metrics:
            monitor = f'{datamodule.eval_dataset_names[0]}/{cfg.metrics[0]}'
        if cfg.enable_checkpointing:
            metric_name = monitor.split('/')[-1] if monitor else ''
            self._ckpt = CheckpointManager(
                self.root / 'checkpoints', monitor=monitor or '',
                mode='min' if metric_name in LOWER_IS_BETTER else 'max',
                save_top_k=cfg.save_top_k, hparams=hparams or {})

        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs
        # overfit harness parity with the scalar fit path (all.yml:87)
        limit_train = cfg.limit_train_batches
        if cfg.overfit_batches > 0:
            limit_train = cfg.overfit_batches
        last_logs = None
        try:
            for epoch in range(start_epoch, max_epochs):
                self.current_epoch = epoch
                t0 = time.time()
                items = 0
                n_batches = len(train_loader)
                if limit_train is not None:
                    n_batches = min(n_batches, limit_train)
                train_loader.set_epoch(
                    0 if cfg.overfit_batches > 0 else epoch)
                for i, batch in enumerate(train_loader):
                    if limit_train is not None and i >= limit_train:
                        break
                    if cfg.fast_dev_run and i >= 1:
                        break
                    gstate, last_logs = gan_step(gstate,
                                                 jnp.asarray(batch.lr),
                                                 jnp.asarray(batch.hr))
                    self.global_step += 1
                    items += np.asarray(batch.lr).shape[0]
                    self._step_progress(i, n_batches, items, t0, last_logs,
                                        loss_keys=('g_loss', 'd_loss'))

                dt = max(time.time() - t0, 1e-9)
                if cfg.enable_progress_log and last_logs is not None:
                    _logger.log(
                        PRINT,
                        'epoch %d/%d  g_loss %.4f  d_loss %.4f  %.1f items/s',
                        epoch + 1, max_epochs, float(last_logs['g_loss']),
                        float(last_logs['d_loss']), items / dt)

                if last_logs is not None and \
                        (epoch + 1) % cfg.log_loss_every_n_epochs == 0:
                    self.tb.scalars({f'loss/{k}': float(v)
                                     for k, v in last_logs.items()},
                                    self.global_step)

                if (epoch + 1) % cfg.check_val_every_n_epoch == 0 \
                        or epoch + 1 == max_epochs:
                    view = self._gan_eval_view(model, gstate)
                    metrics = self._run_validation(view, eval_step,
                                                   datamodule)
                    if self._ckpt is not None:
                        self._ckpt.save(epoch + 1, view, metrics)
        except BaseException as e:
            # same crash containment as the main fit path
            if self._ckpt is not None:
                _logger.log(PRINT, '%s during fit — saving last checkpoint',
                            type(e).__name__)
                try:
                    self._ckpt.save(self.current_epoch + 1,
                                    self._gan_eval_view(model, gstate), {})
                except Exception:
                    _logger.exception('failed to save crash checkpoint')
            if not isinstance(e, KeyboardInterrupt):
                _logger.exception('fit crashed')
            raise
        finally:
            if self._ckpt is not None:
                self._ckpt.close()
            self._record_run_artifacts()
        return self._gan_eval_view(model, gstate)

    # ----------------------------------------------------------- validation

    def _warn_missing_pretrained(self, composite) -> None:
        """LOUD banner when a perceptual loss was selected but its converted
        pretrained weights are absent: training proceeds on deterministic
        random features, which optimizes a DIFFERENT objective than the
        reference's torchvision/piq-weighted one (losses/losses.py:120-208).
        """
        missing = [s.name for s in composite.sub_losses
                   if getattr(s.fn, 'pretrained', True) is False]
        if not missing:
            return
        _logger.log(
            PRINT,
            '=' * 66 + '\nWARNING: perceptual loss(es) %s selected WITHOUT '
            'converted pretrained weights — running on deterministic '
            'random-init features. Scores/gradients will not match the '
            'reference. Convert weights with tools/convert_torch_weights.py '
            'into $SRTPU_WEIGHTS_DIR.\n' + '=' * 66, ', '.join(missing))

    def _make_eval_step(self, metrics, model=None):
        """Single-device eval step, or the row-sharded parallel one when a
        mesh is configured (the product path for trainer.devices /
        spatial_devices — full-res images split across the mesh; reference
        behavior: DDP uniform across fit/validate/predict, all.yml:125).

        When ``model`` is given and the tile-batched kernel path applies
        (TPU + CS model + eval_tile > 0), full-size images route through
        make_tiled_eval_step so the CS Pallas kernels run on the eval hot
        loop too (VERDICT r4 #1) — per-shape routing keeps small/aligned
        images on the direct path where CS engages without tiling."""
        if self.mesh is not None:
            from srtpu.parallel import make_parallel_eval_step
            return make_parallel_eval_step(metrics, self.mesh)
        plain = make_eval_step(metrics)
        gate = self._tiled_gate(model)
        if gate is None:
            return plain
        from .steps import make_tiled_eval_step
        scale, tile, overlap = gate
        tiled = make_tiled_eval_step(metrics, scale, tile, overlap)

        def eval_step(state, lr_img, hr_img, mask):
            if self._route_tiled(model, lr_img.shape):
                return tiled(state, lr_img, hr_img, mask)
            return plain(state, lr_img, hr_img, mask)

        return eval_step

    def _tiled_gate(self, model):
        """(scale, tile, overlap) when tile-batched kernel-path eval/predict
        applies to this model+backend+config, else None. Models with
        global spatial pooling (RCAN's channel attention pools per image)
        are excluded: their tile forward would gate on per-tile statistics
        — different semantics, not just a seam effect."""
        cfg = self.cfg
        if (model is None or cfg.eval_tile <= 0
                or getattr(model, 'use_pallas', None) != 'cs'
                or getattr(model, 'GLOBAL_POOLING', False)):
            return None
        from srtpu.ops.cs_conv import _cs_backend_ok
        if not _cs_backend_ok():
            return None
        return (model.scale_factor, cfg.eval_tile, cfg.eval_tile_overlap)

    def _route_tiled(self, model, lr_shape) -> bool:
        """Tile only shapes that are (a) too big for ANY direct CS plan and
        (b) actually bigger than the lane budget — small off-plan images
        stay on the direct (XLA) path where padding waste isn't worth it."""
        from srtpu.ops.cs_conv import S_MAX, cs_plan, cs_plan_pad
        b, h, w, _ = lr_shape
        trunk = (b, h, w, getattr(model, 'n_feats', 64))
        if cs_plan(trunk) is not None or cs_plan_pad(trunk) is not None:
            return False
        return h * w > S_MAX

    def _put_eval_batch(self, *arrays):
        if self.mesh is not None:
            from srtpu.parallel import shard_eval_batch
            return shard_eval_batch(self.mesh,
                                    *(np.asarray(a) for a in arrays))
        out = tuple(jnp.asarray(a) for a in arrays)
        return out if len(out) > 1 else out[0]

    def _run_validation(self, state, eval_step, datamodule, limit=None,
                        sanity=False) -> dict[str, float]:
        cfg = self.cfg
        all_metrics: dict[str, float] = {}
        limit = limit if limit is not None else cfg.limit_val_batches
        for ds_name, loader in zip(datamodule.eval_dataset_names,
                                   datamodule.eval_loaders()):
            per_metric: dict[str, list[float]] = {}
            for i, batch in enumerate(loader):
                if limit is not None and i >= limit:
                    break
                sr, results = eval_step(state, *self._put_eval_batch(
                    batch.lr, batch.hr, batch.mask))
                results = {k: float(v) for k, v in results.items()}
                if 'BRISQUE' in results and batch.hr_size is not None:
                    # the in-step value saw the edge-padded bucket shape;
                    # recompute on the true shape (reference evaluates
                    # unpadded images, srmodel.py:570-572)
                    from srtpu.metrics import brisque_exact
                    hs, ws = batch.hr_size
                    results['BRISQUE'] = brisque_exact(
                        np.asarray(sr)[:, :hs, :ws])
                for k, v in results.items():
                    per_metric.setdefault(k, []).append(v)

                if not sanity and self._should_save_images(i):
                    self._save_val_images(ds_name, batch, sr, results)

            for k, vals in per_metric.items():
                all_metrics[f'{ds_name}/{k}'] = float(np.mean(vals))

        if not sanity and all_metrics:
            self.tb.scalars(all_metrics, self.global_step)
            pbar = {k: v for k, v in all_metrics.items()
                    for m in cfg.metrics_for_pbar if m in k}
            _logger.log(PRINT, 'val @ epoch %d: %s', self.current_epoch + 1,
                        '  '.join(f'{k}={v:.4f}' for k, v in
                                  (pbar or all_metrics).items()))
        return all_metrics

    def _should_save_images(self, batch_idx: int) -> bool:
        cfg = self.cfg
        e, last = self.current_epoch + 1, cfg.max_epochs
        gate = (cfg.save_results_from_epoch == 'all'
                or (cfg.save_results_from_epoch == 'last' and e == last)
                or (cfg.save_results_from_epoch == 'half' and e == last // 2)
                or (cfg.save_results_from_epoch == 'quarter'
                    and e == last // 4))
        return gate and (cfg.save_results == -1
                         or batch_idx < cfg.save_results)

    def _save_val_images(self, ds_name, batch, sr, results):
        """SR + center crop + edge/sketch variants (srmodel.py:240-331)."""
        name = batch.names[0]
        e = self.current_epoch + 1
        hs, ws = batch.hr_size
        sr_np = np.asarray(sr)[0, :hs, :ws]
        hr_np = np.asarray(batch.hr)[0, :hs, :ws]

        imgs = [(sr_np, '')]
        # skip the 96px center crop for smaller images (the reference
        # catches the CenterCrop RuntimeError and omits it, srmodel.py:248)
        sr_crop = None
        if hs >= 96 and ws >= 96:
            sr_crop = np.asarray(center_crop(sr_np[None], 96))[0]
            imgs.append((sr_crop, '_center'))

        for op in self._edge_ops:
            if op == 'edge_loss':
                tform = lambda a: np.asarray(extract_edges(
                    jnp.asarray(a[None])))[0]
                sfx = 'edges'
            else:
                tform = lambda a: np.asarray(pencil_sketch(
                    jnp.asarray(a[None])))[0]
                sfx = 'sketch'
            imgs.append((tform(sr_np), f'_{sfx}'))
            if sr_crop is not None:
                imgs.append((tform(sr_crop), f'_center_{sfx}'))
            if (ds_name, name, op) not in self._saved_hr_versions:
                imgs.append((tform(hr_np), f'_hr_{sfx}'))
                if sr_crop is not None:
                    hr_crop = np.asarray(center_crop(hr_np[None], 96))[0]
                    imgs.append((tform(hr_crop), f'_hr_center_{sfx}'))
                self._saved_hr_versions.add((ds_name, name, op))

        out_dir = self.root / ds_name / name
        for img, suffix in imgs:
            save_image(img, out_dir / f'epoch_{e:05d}{suffix}.png')
            self.tb.image(f'{ds_name}/{name}/epoch_{e:05d}{suffix}', img,
                          self.global_step)

        # per-image metric re-log as {dataset}/{img}/{metric}
        self.tb.scalars({f'{ds_name}/{name}/{k}': v
                         for k, v in results.items()}, self.global_step)

    # -------------------------------------------------------------- predict

    def predict(self, state: TrainState, datamodule, model=None) -> None:
        datamodule.setup('predict')
        tiled_step = None
        if self.mesh is not None:
            from srtpu.parallel import (make_parallel_predict_step,
                                        replicate_state)
            state = replicate_state(self.mesh, state)
            predict_step = make_parallel_predict_step(self.mesh)
        else:
            predict_step = make_predict_step()
            gate = self._tiled_gate(model)
            if gate is not None:
                from .steps import make_tiled_predict_step
                g_scale, g_tile, g_ov = gate
                tiled_step = make_tiled_predict_step(g_scale, g_tile, g_ov)
        tile = self.cfg.predict_tile
        overlap = self.cfg.predict_tile_overlap
        scale = datamodule._scale

        for ds_name, loader in zip(datamodule.predict_dataset_names,
                                   datamodule.predict_loaders()):
            for batch in loader:
                lr_np = np.asarray(batch.lr)
                hs, ws = batch.hr_size
                if tiled_step is not None and \
                        self._route_tiled(model, lr_np.shape):
                    # kernel-path predict: in-jit tile batches. LR shapes
                    # are bucket-padded (edge mode) to eval_tile multiples
                    # so heterogeneous predict sets compile one program
                    # per bucket, not per image.
                    g = self.cfg.eval_tile
                    lh, lw = hs // scale, ws // scale
                    src = lr_np[:, :lh, :lw]
                    ph, pw = -(-lh // g) * g, -(-lw // g) * g
                    src = np.pad(src, ((0, 0), (0, ph - lh), (0, pw - lw),
                                       (0, 0)), mode='edge')
                    sr = tiled_step(state, jnp.asarray(src))
                    sr_np = np.asarray(sr)[0, :hs, :ws]
                elif tile and min(lr_np.shape[1], lr_np.shape[2]) > tile:
                    # huge image: fixed-shape overlapping tiles (one compile
                    # per tile shape, bounded memory — srtpu.train.tiled)
                    from .tiled import tiled_predict
                    sr_np = tiled_predict(
                        lambda t: predict_step(
                            state, self._put_eval_batch(t)),
                        lr_np[0, :hs // scale, :ws // scale], scale,
                        tile=tile, overlap=overlap)
                    sr_np = sr_np[:hs, :ws]
                else:
                    sr = predict_step(state,
                                      self._put_eval_batch(batch.lr))
                    sr_np = np.asarray(sr)[0, :hs, :ws]
                name = batch.names[0]
                save_image(sr_np, self.root / ds_name / f'{name}.png')
                if hs >= 96 and ws >= 96:
                    crop = np.asarray(center_crop(sr_np[None], 96))[0]
                    save_image(crop,
                               self.root / ds_name / f'{name}_center.png')
                self.tb.image(f'{ds_name}/{name}', sr_np, self.global_step)
                _logger.info('predicted %s/%s (%dx%d)', ds_name, name,
                             hs, ws)

    def validate(self, state: TrainState, datamodule,
                 metrics: tuple[str, ...] | None = None,
                 model=None) -> dict[str, float]:
        datamodule.setup('validate')
        if self.mesh is not None:
            from srtpu.parallel import replicate_state
            state = replicate_state(self.mesh, state)
        eval_step = self._make_eval_step(
            build_metrics(list(metrics or self.cfg.metrics)), model=model)
        self._edge_ops = []
        self._saved_hr_versions = set()
        return self._run_validation(state, eval_step, datamodule)

    def _log_weight_histograms(self, state):
        """Weight histogram logging (Comet log_histogram_3d equivalent,
        srmodel.py:203-210) — TB histograms via tensorboardX."""
        if self.tb._writer is None:
            return
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        for path, leaf in flat:
            name = '/'.join(getattr(p, 'key', str(p)) for p in path)
            try:
                self.tb._writer.add_histogram(
                    f'weights/{name}', np.asarray(leaf),
                    self.current_epoch + 1)
            except Exception:  # histogram failures must not kill training
                pass
