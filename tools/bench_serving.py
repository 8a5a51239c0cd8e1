"""Serving/eval A/B: full-image XLA direct vs in-jit tile-batched CS path.

VERDICT r4 #1: every CS-kernel win was train-step-only; validation,
predict and serving ran the XLA fallback (the 147 MPix(SR)/s serving
reference, PERF.md) because full images exceed the kernels' lane budget.
This measures, IN ONE PROCESS with interleaved windows (CLAUDE.md
measurement rule 6 — relay drift between separate runs swamps few-percent
deltas), EDSR-baseline x4 inference:

* direct   — one full-image forward (cs_plan declines, XLA convs);
* tiled TxT/ov — make_tiled_predict_step: fixed-shape tile batches where
  the CS Pallas kernels engage, masked-scatter stitched in-jit.

plus an eval-step A/B (PSNR+SSIM on the stitched SR, the validation hot
loop) and the tiled-vs-direct output delta (seam error at overlap <
receptive radius — overlap 8 vs EDSR-16's ~35 px radius).

Reference counterparts: full-image validation_step/predict_step
(/root/reference/models/srmodel.py:214-343,375-433).

Run ALONE on the TPU host (rule 1/5):
  nohup python tools/bench_serving.py > /tmp/bench_serving.log 2>&1 &
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SMALL, BIG, REPEATS = 4, 20, 4


def sync_fetch(x) -> float:
    return float(x[0, 0, 0, 0])


def window(fn, state, lr, n) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(state, lr)
    sync_fetch(out)
    return time.perf_counter() - t0


def measure_interleaved(paths: dict, state, lr) -> dict:
    """{name: ms/image} via two-window slope, windows interleaved across
    paths so relay drift hits all paths equally."""
    for fn in paths.values():          # compile + steady-state warmup
        window(fn, state, lr, 2)
    smalls = {k: [] for k in paths}
    bigs = {k: [] for k in paths}
    for _ in range(REPEATS):
        for k, fn in paths.items():
            smalls[k].append(window(fn, state, lr, SMALL))
        for k, fn in paths.items():
            bigs[k].append(window(fn, state, lr, BIG))
    return {k: (min(bigs[k]) - min(smalls[k])) / (BIG - SMALL) * 1e3
            for k in paths}


def main():
    import jax
    import jax.numpy as jnp

    from srtpu.models import create_model
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state
    from srtpu.train.steps import (make_eval_step, make_predict_step,
                                   make_tiled_eval_step,
                                   make_tiled_predict_step)
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print('backend:', jax.default_backend(), flush=True)

    model = create_model('EDSR', scale_factor=4, n_feats=64, n_resblocks=16,
                         dtype=jnp.bfloat16, use_pallas='cs')
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))

    tiles = {
        'tiled 64x64/ov8': ((64, 64), 8),
        'tiled 80x80/ov8': ((80, 80), 8),
        'tiled 104x80/ov8': ((104, 80), 8),
        'tiled 80x80/ov16': ((80, 80), 16),
    }
    predict_paths = {'direct(XLA)': make_predict_step()}
    for name, (t, ov) in tiles.items():
        predict_paths[name] = make_tiled_predict_step(4, t, ov, batch=16)

    rng = np.random.default_rng(0)
    for h, w in ((256, 256), (512, 352)):
        lr = jnp.asarray(rng.random((1, h, w, 3), np.float32))
        ms = measure_interleaved(predict_paths, state, lr)
        mpix = {k: (h * w * 16) / (v * 1e3) for k, v in ms.items()}
        print(f'--- predict {h}x{w} LR -> {4 * h}x{4 * w} SR ---')
        for k in ms:
            print(f'{k:>18}: {ms[k]:7.2f} ms/img  '
                  f'{mpix[k]:7.1f} MPix(SR)/s', flush=True)

        # seam error vs direct (overlap 8 < receptive radius ~35)
        direct = np.asarray(predict_paths['direct(XLA)'](state, lr),
                            np.float32)
        for k in tiles:
            tl = np.asarray(predict_paths[k](state, lr), np.float32)
            d = np.abs(tl - direct)
            mse = float((d ** 2).mean())
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(f'{k:>18}: seam max|d|={d.max():.5f} '
                  f'PSNR-vs-direct={psnr:.1f} dB', flush=True)

    # eval-step A/B: the validation hot loop (metrics in the same program)
    from srtpu.metrics import build_metrics
    metrics = build_metrics(['PSNR', 'SSIM'])
    h, w = 512, 352
    lr = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    hr = jnp.asarray(rng.random((1, 4 * h, 4 * w, 3), np.float32))
    mask = jnp.ones((1, 4 * h, 4 * w, 1), np.float32)

    def wrap(step):
        def fn(state, lr_img):
            sr, res = step(state, lr_img, hr, mask)
            return sr + res['PSNR'] * 0  # keep both live
        return fn

    eval_paths = {'eval direct(XLA)': wrap(make_eval_step(metrics))}
    for name, (t, ov) in tiles.items():
        eval_paths[f'eval {name}'] = wrap(
            make_tiled_eval_step(metrics, 4, t, ov, batch=16))
    ms = measure_interleaved(eval_paths, state, lr)
    print(f'--- eval (PSNR+SSIM) {h}x{w} LR ---')
    for k, v in ms.items():
        print(f'{k:>22}: {v:7.2f} ms/img', flush=True)


if __name__ == '__main__':
    main()
