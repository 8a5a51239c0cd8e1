#!/usr/bin/env python
"""Convert torch pretrained weights into srtpu's .npz formats.

The perceptual losses/metrics (VGGLoss, LPIPS, DISTS, PieAPP, BRISQUE —
reference losses/losses.py:120-208, srmodel.py:33-54) rely on
torchvision/piq pretrained weights. This one-time tool converts them for
offline TPU use:

  python tools/convert_torch_weights.py vgg16 path/to/vgg16-*.pth
  python tools/convert_torch_weights.py vgg19 path/to/vgg19-*.pth
  python tools/convert_torch_weights.py lpips path/to/lpips_lin.pth
  python tools/convert_torch_weights.py dists path/to/dists_ab.pth
  python tools/convert_torch_weights.py pieapp path/to/PieAPPv0.1.pth
  python tools/convert_torch_weights.py brisque allmodel allrange

On a CONNECTED host with torch + torchvision (+ downloaded piq/LIVE
files in one directory), the whole weights/ set is ONE command:

  python tools/convert_torch_weights.py all [dir-with-downloads]

which converts torchvision's VGG16/19 directly from the hub and every
file in the directory it recognizes by name (lpips / dists / pieapp /
brisque model+range), then prints what is still missing and where to get
it. Outputs land in $SRTPU_WEIGHTS_DIR (default ./weights); ship that
directory to the offline TPU host.
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


def convert_pieapp(pth: str) -> Path:
    """PieAPPv0.1 state dict -> npz with the torch key names verbatim
    (srtpu/losses/pieapp.py reads conv{i}.weight/bias and
    fc_{score,weight}{j}.weight/bias directly)."""
    import torch
    state = torch.load(pth, map_location='cpu', weights_only=True)
    if hasattr(state, 'state_dict'):
        state = state.state_dict()
    out = {k: v.numpy() for k, v in state.items()
           if hasattr(v, 'numpy')}
    assert any(k.startswith('conv1.') for k in out), \
        'no conv1.* keys — is this the PieAPPv0.1 state dict?'
    path = out_dir() / 'pieapp.npz'
    np.savez(path, **out)
    print(f'wrote {path} ({len(out)} tensors)')
    return path


def convert_brisque(model_txt: str, range_txt: str) -> Path:
    """LIVE BRISQUE release (libsvm 'allmodel' + 'allrange') ->
    brisque_svm.npz {gamma, rho, sv, alpha, scale_min, scale_max}
    (srtpu/metrics/brisque.py RBF-SVR scoring)."""
    gamma = rho = None
    alphas, svs = [], []
    in_sv = False
    n_feat = 36
    for line in Path(model_txt).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        if in_sv:
            parts = line.split()
            alphas.append(float(parts[0]))
            v = np.zeros(n_feat, np.float64)
            for kv in parts[1:]:
                idx, val = kv.split(':')
                v[int(idx) - 1] = float(val)
            svs.append(v)
        elif line == 'SV':
            in_sv = True
        elif line.startswith('gamma '):
            gamma = float(line.split()[1])
        elif line.startswith('rho '):
            rho = float(line.split()[1])
    assert gamma is not None and rho is not None and svs, \
        f'{model_txt} does not look like a libsvm model file'
    lo = np.full(n_feat, -1.0)
    hi = np.full(n_feat, 1.0)
    for line in Path(range_txt).read_text().splitlines():
        parts = line.split()
        if len(parts) == 3 and parts[0].isdigit():
            i = int(parts[0]) - 1
            lo[i], hi[i] = float(parts[1]), float(parts[2])
    path = out_dir() / 'brisque_svm.npz'
    np.savez(path, gamma=np.float32(gamma), rho=np.float32(rho),
             sv=np.asarray(svs, np.float32),
             alpha=np.asarray(alphas, np.float32),
             scale_min=lo.astype(np.float32), scale_max=hi.astype(np.float32))
    print(f'wrote {path} ({len(svs)} support vectors)')
    return path


# `all` mode: filename-substring -> converter. brisque needs the paired
# range file, handled separately below.
_SOURCES = {
    'lpips': ('lpips', 'piq: https://github.com/photosynthesis-team/piq '
              '(LPIPS linear weights, lpips_weights.pt)'),
    'dists': ('dists', 'piq: DISTS alpha/beta weights (dists_weights.pt)'),
    'pieapp': ('pieapp', 'PieAPPv0.1.pth (github.com/prashnani/PerceptualImageError'
               ' / piq mirror)'),
}


def convert_all(src_dir: str | None) -> int:
    """Produce the full weights/ set from a downloads directory +
    torchvision hub. Returns the number of artifacts written."""
    wrote = 0
    for net in ('vgg16', 'vgg19'):
        try:
            convert_vgg(net, None)
            wrote += 1
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f'{net}: torchvision unavailable ({e}); pass the .pth '
                  f'explicitly', file=sys.stderr)
    files = sorted(Path(src_dir).iterdir()) if src_dir else []
    by_name = {}
    for f in files:
        for key in list(_SOURCES) + ['model', 'range', 'vgg16', 'vgg19']:
            if key in f.name.lower():
                by_name.setdefault(key, f)
    for key, (kind, hint) in _SOURCES.items():
        f = by_name.get(key)
        if f is None:
            print(f'missing {kind}: download from {hint}', file=sys.stderr)
            continue
        {'lpips': convert_lpips, 'dists': convert_dists,
         'pieapp': convert_pieapp}[kind](str(f))
        wrote += 1
    for net in ('vgg16', 'vgg19'):
        if net in by_name and not (out_dir() / f'{net}_features.npz').exists():
            convert_vgg(net, str(by_name[net]))
            wrote += 1
    if 'model' in by_name and 'range' in by_name:
        convert_brisque(str(by_name['model']), str(by_name['range']))
        wrote += 1
    else:
        print('missing brisque: download allmodel + allrange from the LIVE '
              'BRISQUE release (live.ece.utexas.edu/research/quality)',
              file=sys.stderr)
    print(f'{wrote} artifacts in {out_dir()}')
    return wrote


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
    elif kind == 'pieapp':
        convert_pieapp(pth)
    elif kind == 'brisque':
        if len(argv) < 3:
            print('brisque needs: allmodel allrange', file=sys.stderr)
            return 2
        convert_brisque(argv[1], argv[2])
    elif kind == 'all':
        convert_all(pth)
    else:
        print(f'unknown kind {kind}', file=sys.stderr)
        return 2
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
