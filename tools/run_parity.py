"""Real-dataset quality-parity harness (the BASELINE.json north star).

Points the framework at on-disk DIV2K/Set5/Set14 folders, trains the
BASELINE.json configs (1: SRCNN x2 smoke; 2: EDSR-baseline x4), evaluates
PSNR/SSIM per dataset, and emits a comparison table against literature
anchors and (optionally) reference-measured numbers, flagging any gap
> 0.05 dB. Reference counterpart: the run_comparisons.sh training sweep
(/root/reference/run_comparisons.sh:99-158) — the reference repo itself
publishes no numbers (BASELINE.md), so the anchors are the papers' values
(SURVEY.md §6: sanity bands, not repo measurements).

Usage (the moment real data exists, this is ONE command):
    python tools/run_parity.py --datasets-dir datasets --out runs/parity
    # smoke mode (synthetic fixture / CI):
    python tools/run_parity.py --datasets-dir ds --configs edsr_x4 \
        --max-epochs 2 --limit-train-batches 2 --eval-sets MySet

Pass --reference-json FILE ({"edsr_x4": {"Set5/PSNR": 32.09, ...}}) with
numbers measured from the torch reference to activate the 0.05 dB gate.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

# Literature anchors (paper-reported, per SURVEY.md §6 — sanity bands
# only; the reference repo publishes no numbers of its own).
LITERATURE = {
    'srcnn_x2': {'Set5/PSNR': 36.66, 'Set14/PSNR': 32.45},
    'edsr_x4': {'Set5/PSNR': 32.09, 'Set14/PSNR': 28.58,
                'B100/PSNR': 27.57, 'Urban100/PSNR': 26.04},
}

CONFIGS = {
    # BASELINE.json config 1: SRCNN x2 smoke (CPU-runnable)
    'srcnn_x2': dict(model='SRCNN', scale=2,
                     init_args={},
                     epochs=200, batch_size=16, patch_size=64,
                     lr='1e-4'),
    # BASELINE.json config 2: EDSR-baseline x4, canonical recipe
    # (run_comparisons.sh:57-64: 2000 epochs, batch 16, patch 128)
    'edsr_x4': dict(model='EDSR', scale=4,
                    init_args={'n_feats': 64, 'n_resblocks': 16,
                               'use_pallas': 'cs'},
                    epochs=2000, batch_size=16, patch_size=128,
                    lr='1e-4'),
}


def run_config(name: str, spec: dict, datasets_dir: Path, out: Path,
               train_sets: list[str], eval_sets: list[str],
               max_epochs: int | None, limit_train: int | None,
               val_every: int | None) -> dict[str, float]:
    import jax.numpy as jnp
    from srtpu.data import SRData
    from srtpu.models import create_model
    from srtpu.train import Trainer, TrainerConfig

    epochs = max_epochs or spec['epochs']
    dm = SRData(batch_size=spec['batch_size'],
                datasets_dir=str(datasets_dir),
                patch_size=spec['patch_size'], scale_factor=spec['scale'],
                train_datasets=train_sets, eval_datasets=eval_sets)
    model = create_model(spec['model'], scale_factor=spec['scale'],
                         dtype=jnp.bfloat16, **spec['init_args'])
    cfg = TrainerConfig(
        max_epochs=epochs,
        check_val_every_n_epoch=val_every or max(epochs // 10, 1),
        default_root_dir=str(out / name),
        metrics=('PSNR', 'SSIM'),
        monitor=f'{eval_sets[0]}/PSNR',
        limit_train_batches=limit_train,
        num_sanity_val_steps=0)
    trainer = Trainer(cfg)
    t0 = time.time()
    state = trainer.fit(model, dm, losses='l1', optimizer_name='ADAM',
                        optimizer_params=[f"lr={spec['lr']}"],
                        hparams={'model': spec['model'],
                                 'init_args': spec['init_args'],
                                 'data': {'scale_factor': spec['scale'],
                                          'patch_size': spec['patch_size']},
                                 'losses': 'l1', 'optimizer': 'ADAM'})
    metrics = trainer.validate(state, dm)
    metrics['_train_seconds'] = round(time.time() - t0, 1)
    return metrics


def emit_table(results: dict[str, dict[str, float]],
               reference: dict[str, dict[str, float]],
               out: Path) -> str:
    lines = ['# Quality parity vs reference / literature', '',
             '| config | metric | ours | reference | literature | gap vs '
             'ref | within 0.05 dB |',
             '|---|---|---|---|---|---|---|']
    worst = 0.0
    for cfg_name, metrics in results.items():
        ref = reference.get(cfg_name, {})
        lit = LITERATURE.get(cfg_name, {})
        for key in sorted(metrics):
            if key.startswith('_'):
                continue
            ours = metrics[key]
            r = ref.get(key)
            li = lit.get(key)
            gap = (ours - r) if r is not None else None
            ok = ('yes' if gap is not None and abs(gap) <= 0.05
                  else ('NO' if gap is not None else 'n/a'))
            if gap is not None and 'PSNR' in key:
                worst = max(worst, abs(gap))
            lines.append(
                f'| {cfg_name} | {key} | {ours:.4f} | '
                f'{r if r is not None else "—"} | '
                f'{li if li is not None else "—"} | '
                f'{f"{gap:+.4f}" if gap is not None else "—"} | {ok} |')
    lines += ['', f'Worst PSNR gap vs reference: {worst:.4f} dB '
              '(north star: <= 0.05 dB, BASELINE.json)']
    table = '\n'.join(lines)
    (out / 'parity_table.md').write_text(table)
    (out / 'parity_results.json').write_text(
        json.dumps(results, indent=2))
    return table


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--datasets-dir', type=Path, default=Path('datasets'))
    ap.add_argument('--out', type=Path, default=Path('runs/parity'))
    ap.add_argument('--configs', nargs='+', default=['srcnn_x2', 'edsr_x4'],
                    choices=sorted(CONFIGS))
    ap.add_argument('--train-sets', nargs='+', default=['DIV2K'])
    ap.add_argument('--eval-sets', nargs='+',
                    default=['Set5', 'Set14', 'DIV2K'])
    ap.add_argument('--max-epochs', type=int, default=None,
                    help='override per-config epochs (smoke runs)')
    ap.add_argument('--limit-train-batches', type=int, default=None)
    ap.add_argument('--val-every', type=int, default=None)
    ap.add_argument('--reference-json', type=Path, default=None,
                    help='reference-measured numbers for the 0.05 dB gate')
    args = ap.parse_args(argv)

    for name in args.train_sets + args.eval_sets:
        hr = args.datasets_dir / name / 'HR'
        if not hr.is_dir():
            raise SystemExit(
                f'missing dataset: {hr} — place DIV2K/Set5/Set14 HR images '
                f'under {args.datasets_dir}/<Name>/HR (LR optional at '
                '<Name>/LR/X<scale>)')

    reference = {}
    if args.reference_json:
        reference = json.loads(args.reference_json.read_text())

    args.out.mkdir(parents=True, exist_ok=True)
    results = {}
    for name in args.configs:
        results[name] = run_config(
            name, CONFIGS[name], args.datasets_dir, args.out,
            args.train_sets, args.eval_sets, args.max_epochs,
            args.limit_train_batches, args.val_every)
    print(emit_table(results, reference, args.out))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
