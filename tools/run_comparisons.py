#!/usr/bin/env python
"""Comparison sweep driver (reference run_comparisons.sh parity).

Loops model configs x loss combos x optimizers over the canonical recipe
(reference run_comparisons.sh:24-69, 99-158) and runs one fit per cell,
naming each run dir from its hyperparameters (run_comparisons.sh:130-135).
Each run's notification fires through SRTPU_NOTIFY_CMD (utils.sh parity).

Usage:
  python tools/run_comparisons.py --dry-run          # print the grid
  python tools/run_comparisons.py --max-epochs 2000  # full sweep
"""

from __future__ import annotations

import argparse
import itertools
import subprocess
import sys
import time
from pathlib import Path

# the reference's 10 model configs (run_comparisons.sh:24-45)
MODEL_CONFIGS = [
    ('SRCNN', []),
    ('EDSR', ['model.init_args.n_resblocks=16',
              'model.init_args.n_feats=64']),
    ('EDSR', ['model.init_args.n_resblocks=32',
              'model.init_args.n_feats=256',
              'model.init_args.res_scale=0.1']),
    ('SRResNet', []),
    ('WDSR', ['model.init_args.block_type=A']),
    ('WDSR', ['model.init_args.block_type=B']),
    ('RCAN', []),
    ('RDN', ['model.init_args.rdn_config=A']),
    ('RDN', ['model.init_args.rdn_config=B']),
    ('DDBPN', []),
]

# the reference's loss combos (run_comparisons.sh:47-54)
LOSSES = [
    'l1',
    'mse',
    '0.5 * l1 + 0.5 * adaptive',
    '0.5 * l1 + 0.5 * edge_loss',
    '0.5 * l1 + 0.5 * flip',
    '0.5 * l1 + 0.5 * haarpsi',
    '0.5 * l1 + 0.5 * pencil_sketch',
]

OPTIMIZERS = ['ADAM']


def run_name(model, extra, losses, optimizer, scale, patch):
    loss_tag = losses.replace(' ', '').replace('*', 'x').replace('+', '_')
    cfg_tag = '_'.join(e.split('=')[-1] for e in extra) or 'base'
    return f'{model}_{cfg_tag}_X{scale}_p{patch}_{optimizer}_{loss_tag}'


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--datasets-dir', default='datasets')
    p.add_argument('--train-datasets', nargs='+', default=['DIV2K'])
    p.add_argument('--eval-datasets', nargs='+',
                   default=['DIV2K', 'Set5', 'Set14', 'B100', 'Urban100'])
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--patch', type=int, default=128)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--max-epochs', type=int, default=2000)
    p.add_argument('--val-every', type=int, default=200)
    p.add_argument('--out', default='experiments/sweep')
    p.add_argument('--dry-run', action='store_true')
    p.add_argument('--losses', nargs='+', default=None)
    args = p.parse_args(argv)

    losses_list = args.losses or LOSSES
    grid = list(itertools.product(MODEL_CONFIGS, losses_list, OPTIMIZERS))
    print(f'{len(grid)} runs', file=sys.stderr)

    for (model, extra), losses, optimizer in grid:
        name = run_name(model, extra, losses, optimizer, args.scale,
                        args.patch)
        root = Path(args.out) / name
        cmd = [
            sys.executable, '-m', 'srtpu', 'fit',
            f'model.class_path={model}',
            f'model.init_args.losses={losses}',
            f'model.init_args.optimizer={optimizer}',
            f'data.datasets_dir={args.datasets_dir}',
            f'data.train_datasets=[{",".join(args.train_datasets)}]',
            f'data.eval_datasets=[{",".join(args.eval_datasets)}]',
            f'data.scale_factor={args.scale}',
            f'data.patch_size={args.patch}',
            f'data.batch_size={args.batch}',
            f'trainer.max_epochs={args.max_epochs}',
            f'trainer.check_val_every_n_epoch={args.val_every}',
            f'trainer.default_root_dir={root}',
            f'trainer.monitor={args.eval_datasets[0]}/PSNR',
            *extra,
        ]
        if args.dry_run:
            print(' '.join(cmd))
            continue
        print(f'=== {name}', file=sys.stderr)
        t0 = time.time()
        rc = subprocess.run(cmd).returncode
        print(f'=== {name}: rc={rc} in {time.time() - t0:.0f}s',
              file=sys.stderr)
        if rc != 0:
            # keep sweeping (reference sweep continues past failed cells)
            continue
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
