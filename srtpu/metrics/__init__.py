"""Metric suite: registry keyed by the reference metric names.

Parity: _supported_metrics (reference models/srmodel.py:47-54) — BRISQUE,
FLIP, LPIPS, MS-SSIM, PSNR, SSIM — evaluated per-dataset inside the jitted
eval step and logged as ``{dataset}/{metric}`` (srmodel.py:567-593). Every
metric accepts NHWC [0,1] images; full-reference metrics take (sr, hr),
no-reference ones take (sr,).
"""

from __future__ import annotations

from typing import Callable

import jax

from srtpu.losses.flip import flip
from srtpu.losses.vgg import LPIPS
from .brisque import brisque, brisque_features
from .psnr_ssim import ms_ssim, psnr, ssim

# no-reference metrics receive only the SR image (srmodel.py:570-572)
NO_REFERENCE = {'BRISQUE'}
# metrics where lower is better (checkpoint monitor mode resolution)
LOWER_IS_BETTER = {'BRISQUE', 'FLIP', 'LPIPS'}


def _flip_metric(sr, hr, mask=None):
    # metric call order: FLIP(img_sr, img_hr) computes
    # compute_flip(reference=hr? — reference flip.py:107-109 forwards
    # (outputs, targets) with targets as reference)
    return flip(hr, sr, mask=mask)


def build_metrics(names: list[str]) -> dict[str, Callable]:
    registry: dict[str, Callable] = {
        'BRISQUE': lambda sr, hr=None, mask=None: brisque(sr),
        'FLIP': _flip_metric,
        'LPIPS': None,  # instantiated lazily (loads weights)
        'MS-SSIM': lambda sr, hr, mask=None: ms_ssim(sr, hr, mask=mask),
        'PSNR': lambda sr, hr, mask=None: psnr(sr, hr, mask=mask),
        'SSIM': lambda sr, hr, mask=None: ssim(sr, hr, mask=mask),
    }
    out = {}
    for name in names:
        if name not in registry:
            raise AttributeError(
                f"Couldn't find metric {name}. Supported metrics: "
                f"{', '.join(sorted(registry))}")
        if name == 'LPIPS':
            lp = LPIPS()
            out[name] = lambda sr, hr, mask=None, _lp=lp: _lp(sr, hr,
                                                              mask=mask)
        else:
            out[name] = registry[name]
    return out


_brisque_jit = None


def brisque_exact(sr_np) -> float:
    """BRISQUE on the TRUE (unpadded) SR shape, computed on the CPU
    backend with one jit-cache entry per image shape.

    The bucketed eval step sees edge-padded images, and BRISQUE's global
    natural-scene statistics shift measurably under padding (up to ~8
    points on heavily padded shapes — tests/test_metrics.py). The
    reference evaluates true shapes (srmodel.py:570-572); the Trainer
    calls this on the host-cropped SR after the jitted step (batch-1 eval
    makes the recompute cheap)."""
    global _brisque_jit
    import numpy as np
    if _brisque_jit is None:
        _brisque_jit = jax.jit(brisque)
    cpu = jax.devices('cpu')[0]
    x = jax.device_put(np.asarray(sr_np, np.float32), cpu)
    return float(_brisque_jit(x))


def supported_metrics() -> list[str]:
    return ['BRISQUE', 'FLIP', 'LPIPS', 'MS-SSIM', 'PSNR', 'SSIM']


__all__ = ['brisque', 'brisque_exact', 'brisque_features', 'build_metrics',
           'flip', 'ms_ssim', 'psnr', 'ssim', 'supported_metrics',
           'NO_REFERENCE', 'LOWER_IS_BETTER']
