"""CLI entry points: fit / validate / predict (+ bench).

Capability parity with the reference's CLI layer (L1, SURVEY.md §1):
* ``python -m srtpu fit --config cfg.yml [key=value ...]`` mirrors
  ``python main.py fit --config ...`` (reference main.py:87-93) including
  config interpolation and linked arguments;
* ``predict`` loads a checkpoint directory (hparams snapshot + weights) and
  runs the predict datasets (reference predict.py:77-161);
* ``validate`` re-evaluates a checkpoint on the eval datasets;
* before-fit bookkeeping logs parameter counts and config
  (reference main.py:33-74), after-fit logs the checkpoint location
  (main.py:76-84).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path

_logger = logging.getLogger(__name__)


def _add_common(p):
    p.add_argument('--config', action='append', default=[],
                   help='YAML config file (repeatable; later wins)')
    p.add_argument('overrides', nargs='*',
                   help='dotted key=value config overrides')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='srtpu', description='TPU-native super-resolution framework')
    sub = parser.add_subparsers(dest='command', required=True)

    fit = sub.add_parser('fit', help='train a model')
    _add_common(fit)

    val = sub.add_parser('validate', help='evaluate a checkpoint')
    _add_common(val)
    val.add_argument('--checkpoint', required=True,
                     help='checkpoint directory written by fit')

    pred = sub.add_parser('predict', help='run inference on LR images')
    _add_common(pred)
    pred.add_argument('--checkpoint', required=True,
                      help='checkpoint directory written by fit')

    bench = sub.add_parser('bench', help='run the throughput benchmark')

    exp = sub.add_parser(
        'export', help='serialize the serving forward (StableHLO)')
    exp.add_argument('--checkpoint', required=True,
                     help='checkpoint directory written by fit')
    exp.add_argument('--out', required=True, help='output artifact path')
    exp.add_argument('--batch', type=int, default=1)
    exp.add_argument('--size', default='256x256',
                     help='LR input HxW (static serving shape)')
    exp.add_argument('--platforms', nargs='+', default=None,
                     help="lowering platforms, e.g. tpu cpu "
                          "(default: the current backend); cross-platform "
                          "export works without the target hardware")
    exp.add_argument('--mlir', default=None,
                     help='also write human-readable StableHLO text here')
    exp.add_argument('--tile', type=int, default=0,
                     help='>0: embed the in-jit tile-batched kernel-path '
                          'forward (train/steps.py make_tiled_predict_step)'
                          ' — on a TPU lowering host the artifact then '
                          'contains the CS Mosaic kernels (+18%% serving '
                          'rate, PERF.md r5); 0 = plain full-image forward')
    exp.add_argument('--tile-overlap', type=int, default=8,
                     help='LR px halo per tile edge for --tile')
    exp.add_argument('overrides', nargs='*',
                     help='dotted key=value overrides (data.* honored)')
    return parser


def _setup(cfg):
    from srtpu.utils import enable_compilation_cache
    from srtpu.utils.logging import setup_log
    enable_compilation_cache()
    root_dir = cfg['trainer'].get('default_root_dir') or '.'
    setup_log(cfg.get('log_level', 'warning'),
              cfg.get('file_log_level', 'info'),
              log_dir=root_dir)


def _init_multihost(cfg) -> None:
    """Bring up jax.distributed when trainer.num_nodes > 1 (reference
    ``num_nodes``, all.yml:118). Must run before any other jax backend
    use; after it, jax.devices() is the GLOBAL device list and the mesh
    in _make_mesh_and_sharding spans all hosts."""
    trainer = cfg['trainer']
    num_nodes = int(trainer.get('num_nodes') or 1)
    if num_nodes <= 1:
        return
    from srtpu.parallel import initialize_distributed
    initialize_distributed(coordinator=trainer.get('coordinator_address'),
                           num_processes=num_nodes,
                           process_id=trainer.get('node_rank'))


def _make_mesh_and_sharding(cfg, for_fit: bool = True):
    """Build the device mesh from trainer.devices / spatial_devices.

    ``for_fit=False`` (validate/predict) skips the train-batch divisibility
    check: eval runs batch-1 images row-sharded over the whole mesh
    (reference keeps DDP uniform across fit/validate/predict, all.yml:125).
    """
    import jax
    from srtpu.parallel import batch_sharding, make_mesh

    trainer = cfg['trainer']
    n = trainer.get('devices')
    spatial = trainer.get('spatial_devices') or 1
    if n is None and spatial <= 1:
        return None, None  # single-device unless explicitly requested
    avail = len(jax.devices())
    if n is None:
        n = avail
    if n <= 1 and spatial <= 1:
        return None, None
    if for_fit:
        # batch_size is PER-HOST (each process's loader yields its own
        # interleaved slice); it must split over this host's share of the
        # data axis
        batch = cfg['data']['batch_size']
        per_host_data = max((n // spatial) // jax.process_count(), 1)
        if batch % per_host_data != 0:
            raise ValueError(
                f'data.batch_size ({batch}) must be divisible by the per-'
                f'host data-parallel axis ({per_host_data})')
    mesh = make_mesh(data=n // spatial, spatial=spatial,
                     devices=jax.devices()[:n])
    return mesh, batch_sharding(mesh)


def cmd_fit(args) -> int:
    from srtpu.config import build_all, link_arguments, load_config
    from srtpu.train import Trainer

    cfg = load_config(args.config, args.overrides)
    cfg = link_arguments(cfg)
    _setup(cfg)
    _init_multihost(cfg)
    model, dm, tcfg, fit_kwargs = build_all(cfg)
    mesh, sharding = _make_mesh_and_sharding(cfg)
    trainer = Trainer(tcfg, mesh=mesh, batch_sharding=sharding)
    t0 = time.time()
    try:
        trainer.fit(model, dm, **fit_kwargs)
    except BaseException as e:
        # failure notification (reference notifies/uploads on crash too,
        # train.py:240-257 + utils.sh telegram notify); the Trainer has
        # already saved a crash checkpoint and flushed run.log
        _notify(f'srtpu fit {cfg["model"]["class_path"]} FAILED after '
                f'{time.time() - t0:.0f}s: {type(e).__name__}: {e}')
        raise
    finally:
        trainer.close()   # end Comet experiment / close metrics.jsonl
    _logger.info('fit finished in %.1fs; checkpoints at %s',
                 time.time() - t0, Path(tcfg.default_root_dir) /
                 'checkpoints')
    _notify(f'srtpu fit {cfg["model"]["class_path"]} finished in '
            f'{time.time() - t0:.0f}s')
    return 0


def _restore(checkpoint_dir: str, cfg_overrides):
    """Rebuild model+state from a checkpoint dir's hparams snapshot."""
    import jax
    import jax.numpy as jnp

    from srtpu.checkpoint import CheckpointManager, load_hparams
    from srtpu.data import SRData
    from srtpu.losses import parse_losses
    from srtpu.models import create_model
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state

    hp = load_hparams(checkpoint_dir)
    data = dict(hp.get('data', {}))
    for ov in cfg_overrides or []:
        key, val = ov.split('=', 1)
        if key.startswith('data.'):
            import yaml
            data[key[5:]] = yaml.safe_load(val)

    precision = hp.get('precision', 'bf16')
    dtype = jnp.bfloat16 if str(precision) in ('bf16', 'bfloat16', '16') \
        else None
    model = create_model(hp['model'], dtype=dtype, **hp.get('init_args', {}))
    composite = parse_losses(hp.get('losses', 'l1'))
    tx = build_optimizer(hp.get('optimizer', 'ADAM'),
                         hp.get('optimizer_params', []))

    scale = data.get('scale_factor', 4)
    patch = data.get('patch_size', 128)
    sample = jnp.zeros((1, max(patch // scale, 8), max(patch // scale, 8),
                        3), jnp.float32)
    # GAN checkpoints store the combined G+D view; SRGAN's __call__ is
    # generator-only, so the template inits via init_all (srgan.py)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               composite,
                               init_method=getattr(model, 'init_all', None))
    mngr = CheckpointManager(checkpoint_dir,
                             monitor=hp.get('monitor') or '')
    try:
        state = mngr.restore(state)
    finally:
        mngr.close()
    return state, hp, data, model


def cmd_validate(args) -> int:
    from srtpu.config import load_config
    from srtpu.data import SRData
    from srtpu.train import Trainer, TrainerConfig

    cfg = load_config(args.config, args.overrides)
    _setup(cfg)
    _init_multihost(cfg)
    state, hp, data, model = _restore(args.checkpoint, args.overrides)
    dm = SRData(**{k: v for k, v in data.items()
                   if k in ('augment', 'batch_size', 'datasets_dir',
                            'eval_datasets', 'patch_size',
                            'predict_datasets', 'scale_factor',
                            'train_datasets', 'eval_bucket')})
    # explicit CLI metrics win; else the checkpoint's own hparams snapshot
    # (runs are self-describing); else the defaults
    metrics = (cfg['model'].get('init_args', {}).get('metrics')
               or hp.get('metrics') or ['PSNR', 'SSIM'])
    tcfg = TrainerConfig(
        default_root_dir=cfg['trainer'].get('default_root_dir') or '.',
        metrics=tuple(metrics))
    mesh, _ = _make_mesh_and_sharding(cfg, for_fit=False)
    trainer = Trainer(tcfg, mesh=mesh)
    try:
        metrics = trainer.validate(state, dm, model=model)
    finally:
        trainer.close()
    for k, v in sorted(metrics.items()):
        print(f'{k}: {v:.4f}')
    return 0


def cmd_predict(args) -> int:
    from srtpu.config import load_config
    from srtpu.data import SRData
    from srtpu.train import Trainer, TrainerConfig

    cfg = load_config(args.config, args.overrides)
    _setup(cfg)
    _init_multihost(cfg)
    state, hp, data, model = _restore(args.checkpoint, args.overrides)
    predict_datasets = (cfg['data'].get('predict_datasets')
                        or data.get('predict_datasets', []))
    if not predict_datasets:
        print('no predict_datasets configured', file=sys.stderr)
        return 2
    dm = SRData(datasets_dir=cfg['data'].get(
                    'datasets_dir', data.get('datasets_dir', 'datasets')),
                predict_datasets=predict_datasets,
                scale_factor=data.get('scale_factor', 4),
                eval_datasets=[], train_datasets=[])
    tcfg = TrainerConfig(
        default_root_dir=cfg['trainer'].get('default_root_dir') or '.')
    mesh, _ = _make_mesh_and_sharding(cfg, for_fit=False)
    trainer = Trainer(tcfg, mesh=mesh)
    try:
        trainer.predict(state, dm, model=model)
    finally:
        trainer.close()
    return 0


def cmd_export(args) -> int:
    """Serialize the model's serving forward with ``jax.export``.

    Produces a single self-contained artifact (weights baked in as
    constants, static input shape) loadable with
    ``jax.export.deserialize(blob).call(lr)`` — the TPU-native analog of
    a TorchScript/ONNX serving export, which the reference lacks.

    Which conv path the artifact embeds (round-tripped + documented,
    VERDICT r4 #6): with ``--tile 0`` (default) the full-image forward is
    lowered, and the CS Pallas kernels gate on the *lowering host's*
    backend AND the shape — serving-size images exceed every CS plan, so
    plain-export artifacts contain portable XLA convs from any host.
    With ``--tile > 0`` the in-jit tile-batched forward is lowered: on a
    TPU lowering host the artifact embeds the Mosaic custom calls
    (tpu-only, +18%% serving rate, PERF.md r5 serving section); on a CPU
    host the tiles still gate to XLA convs, so cross-platform exports
    stay portable.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    state, hp, data, model = _restore(args.checkpoint, args.overrides)
    scale = int(data.get('scale_factor', 4))
    h, w = (int(v) for v in args.size.lower().split('x'))

    if args.tile > 0:
        from srtpu.train.steps import make_tiled_predict_step
        tiled = make_tiled_predict_step(scale, args.tile, args.tile_overlap)

        def serve(lr):
            return tiled(state, lr)  # clipped f32 (make_tiled_predict_step)
    else:
        def serve(lr):
            variables = {'params': state.params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            sr = state.apply_fn(variables, lr, train=False)
            return jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)

    spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.float32)
    platforms = args.platforms or [jax.default_backend()]
    exp = jax_export.export(jax.jit(serve), platforms=platforms)(spec)
    blob = exp.serialize()
    Path(args.out).write_bytes(blob)
    if args.mlir:
        Path(args.mlir).write_text(exp.mlir_module())
    print(f'exported {hp["model"]} x{scale}: LR {tuple(spec.shape)} -> '
          f'SR {(args.batch, h * scale, w * scale, 3)}, platforms '
          f'{exp.platforms}, {len(blob):,} bytes -> {args.out}'
          + (f' (+ StableHLO text {args.mlir})' if args.mlir else ''))
    return 0


def _notify(message: str) -> None:
    """Run-completion notification hook (reference utils.sh:12-38 telegram
    notify): POSTs to SRTPU_NOTIFY_URL or runs SRTPU_NOTIFY_CMD if set."""
    import os
    import shlex
    import subprocess
    cmd = os.environ.get('SRTPU_NOTIFY_CMD')
    if cmd:
        try:
            subprocess.run(shlex.split(cmd) + [message], timeout=30,
                           check=False)
        except Exception:
            _logger.warning('notify command failed', exc_info=True)
    url = os.environ.get('SRTPU_NOTIFY_URL')
    if url:
        try:
            import json
            import urllib.request
            req = urllib.request.Request(
                url, data=json.dumps({'text': message}).encode(),
                headers={'Content-Type': 'application/json'})
            urllib.request.urlopen(req, timeout=30).read()
        except Exception:
            _logger.warning('notify POST failed', exc_info=True)


def cli_main(argv=None) -> int:
    import os
    platform = os.environ.get('SRTPU_PLATFORM')
    if platform:
        # force the jax backend BEFORE first use (e.g. SRTPU_PLATFORM=cpu
        # for CPU-only hosts). The JAX_PLATFORMS env var is NOT enough on
        # hosts whose sitecustomize registers a TPU plugin (it merges
        # rather than overrides); jax.config wins over both.
        import jax
        jax.config.update('jax_platforms', platform)
    args = build_parser().parse_args(argv)
    if args.command == 'fit':
        return cmd_fit(args)
    if args.command == 'validate':
        return cmd_validate(args)
    if args.command == 'predict':
        return cmd_predict(args)
    if args.command == 'bench':
        import runpy
        runpy.run_path(str(Path(__file__).parent.parent / 'bench.py'),
                       run_name='__main__')
        return 0
    if args.command == 'export':
        return cmd_export(args)
    return 2


if __name__ == '__main__':
    raise SystemExit(cli_main())
