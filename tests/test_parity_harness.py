"""E2E test of the quality-parity harness (tools/run_parity.py) on a
synthetic fixture — so measuring the 0.05 dB north star is one command the
moment real DIV2K/Set5 data exists (VERDICT round 2 #6)."""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))


def _mkds(root: Path, name: str, n: int, size: int = 12) -> None:
    from PIL import Image
    d = root / name / 'HR'
    d.mkdir(parents=True)
    rng = np.random.default_rng(hash(name) % 2 ** 31)
    for i in range(n):
        img = np.kron(rng.random((size, size, 3)), np.ones((4, 4, 1)))
        Image.fromarray((img * 255).astype(np.uint8)).save(d / f'{i}.png')


def test_parity_harness_smoke(tmp_path):
    import run_parity

    ds = tmp_path / 'datasets'
    # srcnn_x2 trains on 64px patches -> HR fixtures must be >= 64px
    _mkds(ds, 'TrainFix', 6, size=20)
    _mkds(ds, 'Set5Fix', 2, size=20)
    out = tmp_path / 'out'

    rc = run_parity.main([
        '--datasets-dir', str(ds), '--out', str(out),
        '--configs', 'srcnn_x2',
        '--train-sets', 'TrainFix', '--eval-sets', 'Set5Fix',
        '--max-epochs', '2', '--limit-train-batches', '2',
        '--val-every', '2'])
    assert rc == 0

    table = (out / 'parity_table.md').read_text()
    assert 'Set5Fix/PSNR' in table and 'srcnn_x2' in table
    results = json.loads((out / 'parity_results.json').read_text())
    assert np.isfinite(results['srcnn_x2']['Set5Fix/PSNR'])
    # the trained run directory exists with checkpoints
    assert (out / 'srcnn_x2' / 'checkpoints' / 'last').exists()


def test_parity_harness_reference_gate(tmp_path):
    """--reference-json activates the 0.05 dB gap column."""
    import run_parity

    out = tmp_path / 'out'
    out.mkdir()
    results = {'srcnn_x2': {'V/PSNR': 20.0, 'V/SSIM': 0.9}}
    ref = {'srcnn_x2': {'V/PSNR': 19.98}}
    table = run_parity.emit_table(results, ref, out)
    assert '+0.0200' in table and 'yes' in table
    ref_bad = {'srcnn_x2': {'V/PSNR': 19.0}}
    table2 = run_parity.emit_table(results, ref_bad, out)
    assert 'NO' in table2


def test_parity_harness_missing_dataset(tmp_path):
    import pytest
    import run_parity
    with pytest.raises(SystemExit, match='missing dataset'):
        run_parity.main(['--datasets-dir', str(tmp_path / 'none'),
                         '--configs', 'srcnn_x2'])
