#!/usr/bin/env python
"""Inference CLI (reference predict.py parity): load a checkpoint and run
the predict datasets, saving SR PNGs under the root dir."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    from srtpu.cli import cmd_predict

    parser = argparse.ArgumentParser(description='srtpu predict CLI')
    parser.add_argument('--checkpoint', required=True,
                        help='checkpoint directory written by fit')
    parser.add_argument('--datasets_dir', default='datasets')
    parser.add_argument('--predict_datasets', nargs='+', required=True)
    parser.add_argument('--default_root_dir', default='predictions')
    args = parser.parse_args(argv)

    overrides = [
        f'data.datasets_dir={args.datasets_dir}',
        f'data.predict_datasets=[{",".join(args.predict_datasets)}]',
        f'trainer.default_root_dir={args.default_root_dir}',
    ]
    ns = argparse.Namespace(config=[], overrides=overrides,
                            checkpoint=args.checkpoint)
    return cmd_predict(ns)


if __name__ == '__main__':
    raise SystemExit(main())
