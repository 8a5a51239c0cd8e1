#!/usr/bin/env python
"""Convert torch pretrained weights into srtpu's .npz formats.

The perceptual losses/metrics (VGGLoss, LPIPS, DISTS — reference
losses/losses.py:120-208, srmodel.py:33-54) rely on torchvision/piq
pretrained weights. This one-time tool converts them for offline TPU use:

  python tools/convert_torch_weights.py vgg16 path/to/vgg16-*.pth
  python tools/convert_torch_weights.py vgg19 path/to/vgg19-*.pth
  python tools/convert_torch_weights.py lpips path/to/lpips_lin.pth
  python tools/convert_torch_weights.py dists path/to/dists_ab.pth

Outputs land in $SRTPU_WEIGHTS_DIR (default ./weights). If torchvision is
importable with cached hub weights, `vgg16`/`vgg19` can be run without a
path argument.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np


def out_dir() -> Path:
    d = Path(os.environ.get('SRTPU_WEIGHTS_DIR', 'weights'))
    d.mkdir(parents=True, exist_ok=True)
    return d


def convert_vgg(net_type: str, pth: str | None) -> Path:
    import torch
    if pth is not None:
        state = torch.load(pth, map_location='cpu', weights_only=True)
    else:
        import torchvision.models as tvm
        model = getattr(tvm, net_type)(weights='IMAGENET1K_V1')
        state = model.state_dict()
    feats = {k: v.numpy() for k, v in state.items()
             if k.startswith('features.')}
    assert feats, 'no features.* keys found — is this a torchvision VGG?'
    path = out_dir() / f'{net_type}_features.npz'
    np.savez(path, **feats)
    print(f'wrote {path} ({len(feats)} tensors)')
    return path


def convert_lpips(pth: str) -> Path:
    """piq/richzhang LPIPS linear weights: 5 tensors of shape (1,C,1,1)."""
    import torch
    state = torch.load(pth, map_location='cpu', weights_only=True)
    lins = {}
    i = 0
    for key in sorted(state):
        w = state[key].squeeze().numpy()
        lins[f'lin{i}'] = w
        i += 1
    assert i == 5, f'expected 5 linear layers, got {i}'
    path = out_dir() / 'lpips_lin.npz'
    np.savez(path, **lins)
    print(f'wrote {path}')
    return path


def convert_dists(pth: str) -> Path:
    import torch
    state = torch.load(pth, map_location='cpu', weights_only=True)
    out = {}
    alpha = state['alpha'].squeeze().numpy()
    beta = state['beta'].squeeze().numpy()
    dims = (3, 64, 128, 256, 512, 512)
    off = 0
    for i, d in enumerate(dims):
        out[f'alpha{i}'] = alpha[off:off + d]
        out[f'beta{i}'] = beta[off:off + d]
        off += d
    path = out_dir() / 'dists_ab.npz'
    np.savez(path, **out)
    print(f'wrote {path}')
    return path


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    kind = argv[0]
    pth = argv[1] if len(argv) > 1 else None
    if kind in ('vgg16', 'vgg19'):
        convert_vgg(kind, pth)
    elif kind == 'lpips':
        convert_lpips(pth)
    elif kind == 'dists':
        convert_dists(pth)
    else:
        print(f'unknown kind {kind}', file=sys.stderr)
        return 2
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
