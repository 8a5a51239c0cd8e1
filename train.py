#!/usr/bin/env python
"""Legacy-style training CLI (reference train.py parity).

Mirrors the argparse UX of the reference legacy entry point
(reference train.py:260-323): model selection by name with model-specific
args, loss DSL string, optimizer + params, ``--save_metric`` monitor choices
built as {dataset}/{metric}, deterministic seeding. Internally it assembles
the same config tree the modern ``fit`` subcommand uses.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    from srtpu.cli import cmd_fit
    from srtpu.models import available_models, model_field_names, \
        resolve_model

    parser = argparse.ArgumentParser(description='srtpu legacy train CLI')
    parser.add_argument('--model', choices=available_models(),
                        default='SRCNN')
    parser.add_argument('--losses', default='l1')
    parser.add_argument('--optimizer', default='ADAM')
    parser.add_argument('--optimizer_params', nargs='*', default=[])
    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--patch_size', type=int, default=128)
    parser.add_argument('--scale_factor', type=int, default=4)
    parser.add_argument('--max_epochs', type=int, default=2000)
    parser.add_argument('--check_val_every_n_epoch', type=int, default=200)
    parser.add_argument('--datasets_dir', default='datasets')
    parser.add_argument('--train_datasets', nargs='+', default=['DIV2K'])
    parser.add_argument('--eval_datasets', nargs='+',
                        default=['DIV2K', 'Set5', 'Set14', 'B100',
                                 'Urban100'])
    parser.add_argument('--metrics', nargs='+', default=['PSNR', 'SSIM'])
    parser.add_argument('--save_metric', default=None,
                        help='monitored {dataset}/{metric} for checkpoints')
    parser.add_argument('--default_root_dir', default=None)
    parser.add_argument('--precision', default='bf16')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--deterministic', action='store_true')
    parser.add_argument('--save_results', type=int, default=-1)
    parser.add_argument('--save_results_from_epoch', default='last',
                        choices=['all', 'last', 'half', 'quarter'])
    parser.add_argument('--fast_dev_run', action='store_true')

    # model-specific args (reference Model.add_model_specific_args,
    # train.py:310): accept any declared field of the chosen model
    args, extra = parser.parse_known_args(argv)
    model_cls = resolve_model(args.model)
    fields = model_field_names(model_cls)
    mp = argparse.ArgumentParser()
    for f in sorted(fields - {'scale_factor', 'channels', 'dtype'}):
        mp.add_argument(f'--{f}')
    margs, unknown = mp.parse_known_args(extra)
    if unknown:
        parser.error(f'unknown arguments: {unknown}')

    # validate save_metric against the {dataset}/{metric} cross-product
    # (reference train.py:313-320)
    choices = [f'{d}/{m}' for d in args.eval_datasets for m in args.metrics]
    if args.save_metric is not None and args.save_metric not in choices:
        parser.error(f'--save_metric must be one of {choices}')

    overrides = [
        f'model.class_path={args.model}',
        f'model.init_args.losses={args.losses}',
        f'model.init_args.optimizer={args.optimizer}',
        f'model.init_args.metrics=[{",".join(args.metrics)}]',
        f'model.init_args.save_results={args.save_results}',
        f'model.init_args.save_results_from_epoch='
        f'{args.save_results_from_epoch}',
        f'data.batch_size={args.batch_size}',
        f'data.patch_size={args.patch_size}',
        f'data.scale_factor={args.scale_factor}',
        f'data.datasets_dir={args.datasets_dir}',
        f'data.train_datasets=[{",".join(args.train_datasets)}]',
        f'data.eval_datasets=[{",".join(args.eval_datasets)}]',
        f'trainer.max_epochs={args.max_epochs}',
        f'trainer.check_val_every_n_epoch={args.check_val_every_n_epoch}',
        f'trainer.precision={args.precision}',
        f'trainer.fast_dev_run={args.fast_dev_run}',
        f'seed={args.seed if not args.deterministic else 0}',
    ]
    if args.optimizer_params:
        overrides.append('model.init_args.optimizer_params='
                         f'[{",".join(args.optimizer_params)}]')
    if args.save_metric:
        overrides.append(f'trainer.monitor={args.save_metric}')
    if args.default_root_dir:
        overrides.append(f'trainer.default_root_dir={args.default_root_dir}')
    for f in sorted(fields - {'scale_factor', 'channels', 'dtype'}):
        v = getattr(margs, f, None)
        if v is not None:
            # values pass through yaml parsing in the config layer, so
            # 'True'/'16'/'0.1' get typed — but normalize booleans here so
            # '--use_pallas False' doesn't truthy-trap downstream consumers
            overrides.append(f'model.init_args.{f}={v.strip()}')

    ns = argparse.Namespace(config=[], overrides=overrides)
    return cmd_fit(ns)


if __name__ == '__main__':
    raise SystemExit(main())
