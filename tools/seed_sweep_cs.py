"""Seed sweep: CS-kernel vs XLA trunks, small-config training equivalence.

Round-2 left a 1.8 dB spread (CS 41.1 vs XLA 42.9 Val/PSNR) on ONE seed of
EDSR(32f/4b) x2 / 300 epochs / 16 synthetic images, attributed to
init-trajectory noise without evidence. This sweeps N seeds of both paths
end to end (Trainer.fit) and prints the per-seed table + means, so the
claim is either backed by data or exposed as a bug (VERDICT round 2 #10).

Usage: python tools/seed_sweep_cs.py [n_seeds] [epochs]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EPOCHS = 300
N_SEEDS = 3


def make_data(root: Path):
    import imageio.v3 as iio
    rng = np.random.default_rng(123)
    for name, n in [('Train', 16), ('Val', 4)]:
        d = root / name / 'HR'
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.kron(rng.random((8, 8, 3)), np.ones((8, 8, 1)))
            iio.imwrite(d / f'im{i}.png', (img * 255).astype(np.uint8))


def run_one(datasets: Path, out: Path, seed: int, use_pallas, epochs: int):
    from srtpu.data import SRData
    from srtpu.models import create_model
    from srtpu.train import Trainer, TrainerConfig

    dm = SRData(batch_size=8, datasets_dir=str(datasets), patch_size=32,
                scale_factor=2, train_datasets=['Train'],
                eval_datasets=['Val'], eval_bucket=64)
    model = create_model('EDSR', scale_factor=2, n_feats=32, n_resblocks=4,
                         use_pallas=use_pallas)
    trainer = Trainer(TrainerConfig(
        max_epochs=epochs, check_val_every_n_epoch=epochs // 3,
        default_root_dir=str(out), monitor='Val/PSNR', seed=seed))
    state = trainer.fit(model, dm)
    metrics = trainer.validate(state, dm)
    return float(metrics['Val/PSNR'])


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else N_SEEDS
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else EPOCHS
    base = Path('/tmp/seed_sweep')
    datasets = base / 'datasets'
    if not datasets.exists():
        make_data(datasets)

    rows = {}
    for variant, up in [('cs', 'cs'), ('xla', False)]:
        for seed in range(n_seeds):
            psnr = run_one(datasets, base / f'{variant}_s{seed}', seed, up,
                           epochs)
            rows[(variant, seed)] = psnr
            print(f'{variant} seed={seed}: Val/PSNR={psnr:.2f} dB',
                  flush=True)
    for variant in ('cs', 'xla'):
        vals = [rows[(variant, s)] for s in range(n_seeds)]
        print(f'{variant}: mean {np.mean(vals):.2f} dB  '
              f'min {min(vals):.2f}  max {max(vals):.2f}', flush=True)


if __name__ == '__main__':
    main()
