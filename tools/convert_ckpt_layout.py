"""Convert EDSR checkpoints between the XLA and CS param layouts.

The default config ships ``use_pallas: cs`` (CS-arranged stacked trunk
weights: CSTrunk_0/{w1,b1,w2,b2,...} + CSUpscaleTail_0), while checkpoints
trained with ``use_pallas: false`` store per-block HWIO trees
(ResBlock_i/Conv2d_* + UpscaleBlock_0 + final Conv2d). The two trees hold
the same numbers in different arrangements; this tool converts a saved
``last`` checkpoint (or a bare params tree) between them so runs can resume
across the layout switch.

Optimizer state is NOT converted (moment trees mirror the param tree and
could be permuted with the same math, but optimizer-structure differences
make that fragile); the restored run keeps a fresh optimizer, exactly like
the GAN-eval restore path (srtpu/checkpoint.py _tree_to_state fallback).

Usage:
    python tools/convert_ckpt_layout.py RUN_DIR/checkpoints OUT_DIR \
        [--direction auto|xla2cs|cs2xla]
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402


def _detect_direction(params: dict) -> str:
    if any(k.startswith('CSTrunk') for k in params):
        return 'cs2xla'
    if any(k.startswith('ResBlock') for k in params):
        return 'xla2cs'
    raise ValueError('params tree is neither CS nor XLA EDSR layout '
                     f'(keys: {sorted(params)})')


def edsr_params_xla_to_cs(params: dict) -> dict:
    """ResBlock_i/UpscaleBlock tree -> CSTrunk_0/CSUpscaleTail_0 tree."""
    from srtpu.ops.cs_conv import w_cs, w_cs_batch, w_ps_cs

    nb = sum(1 for k in params if k.startswith('ResBlock_'))
    w1 = jnp.stack([jnp.asarray(params[f'ResBlock_{i}']['Conv2d_0']['kernel'])
                    for i in range(nb)])
    b1 = jnp.stack([jnp.asarray(params[f'ResBlock_{i}']['Conv2d_0']['bias'])
                    for i in range(nb)])
    w2 = jnp.stack([jnp.asarray(params[f'ResBlock_{i}']['Conv2d_1']['kernel'])
                    for i in range(nb)])
    b2 = jnp.stack([jnp.asarray(params[f'ResBlock_{i}']['Conv2d_1']['bias'])
                    for i in range(nb)])
    up = params['UpscaleBlock_0']
    tail = {}
    for j in range(sum(1 for k in up if k.startswith('Conv2d_'))):
        wk = jnp.asarray(up[f'Conv2d_{j}']['kernel'])   # (3,3,C,r*r*C)
        bk = jnp.asarray(up[f'Conv2d_{j}']['bias'])     # (r*r*C,) c-major
        c = wk.shape[2]
        r = int(round(math.sqrt(wk.shape[3] // c)))
        tail[f'up{j}_kernel'] = w_ps_cs(wk, r)
        tail[f'up{j}_bias'] = bk.reshape(c, r * r).T    # phase-major (r*r,C)
    tail['final_kernel'] = w_cs(jnp.asarray(params['Conv2d_2']['kernel']))
    tail['final_bias'] = jnp.asarray(params['Conv2d_2']['bias'])
    return {
        'Conv2d_0': params['Conv2d_0'],
        'CSTrunk_0': {
            'w1': w_cs_batch(w1), 'b1': b1,
            'w2': w_cs_batch(w2), 'b2': b2,
            'close_kernel': jnp.asarray(params['Conv2d_1']['kernel']),
            'close_bias': jnp.asarray(params['Conv2d_1']['bias']),
        },
        'CSUpscaleTail_0': tail,
    }


def edsr_params_cs_to_xla(params: dict) -> dict:
    """CSTrunk_0/CSUpscaleTail_0 tree -> ResBlock_i/UpscaleBlock tree."""
    from srtpu.ops.cs_conv import w_hwio_from_cs, w_ps_hwio

    trunk = params['CSTrunk_0']
    n = trunk['close_kernel'].shape[2]
    w1 = w_hwio_from_cs(jnp.asarray(trunk['w1']), n, n)
    w2 = w_hwio_from_cs(jnp.asarray(trunk['w2']), n, n)
    out = {'Conv2d_0': params['Conv2d_0']}
    for i in range(w1.shape[0]):
        out[f'ResBlock_{i}'] = {
            'Conv2d_0': {'kernel': w1[i], 'bias': jnp.asarray(trunk['b1'][i])},
            'Conv2d_1': {'kernel': w2[i], 'bias': jnp.asarray(trunk['b2'][i])},
        }
    out['Conv2d_1'] = {'kernel': jnp.asarray(trunk['close_kernel']),
                       'bias': jnp.asarray(trunk['close_bias'])}
    tail = params['CSUpscaleTail_0']
    ups = {}
    for j in range(sum(1 for k in tail if k.startswith('up')
                       and k.endswith('_kernel'))):
        wk = jnp.asarray(tail[f'up{j}_kernel'])   # (r*r, 3C, 3C)
        bk = jnp.asarray(tail[f'up{j}_bias'])     # (r*r, C)
        r = int(round(math.sqrt(wk.shape[0])))
        ups[f'Conv2d_{j}'] = {'kernel': w_ps_hwio(wk, n, r),
                              'bias': bk.T.reshape(-1)}
    out['UpscaleBlock_0'] = ups
    fk = jnp.asarray(tail['final_kernel'])        # (3*channels, 3C)
    channels = fk.shape[0] // 3
    out['Conv2d_2'] = {
        'kernel': w_hwio_from_cs(fk[None], n, channels)[0],
        'bias': jnp.asarray(tail['final_bias'])}
    return out


def convert_params(params: dict, direction: str = 'auto') -> dict:
    if direction == 'auto':
        direction = _detect_direction(params)
    if direction == 'xla2cs':
        return edsr_params_xla_to_cs(params)
    if direction == 'cs2xla':
        return edsr_params_cs_to_xla(params)
    raise ValueError(f'unknown direction {direction!r}')


def convert_checkpoint(src: Path, dst: Path, direction: str = 'auto') -> str:
    """Convert a saved 'last' checkpoint tree (Orbax PyTree) at ``src``
    (a checkpoints dir containing 'last', or the 'last' dir itself) and
    write the converted tree to ``dst/last``. Returns the direction used."""
    import orbax.checkpoint as ocp
    src = Path(src)
    if (src / 'last').exists():
        src = src / 'last'
    ckpt = ocp.PyTreeCheckpointer()
    tree = ckpt.restore(src.absolute())
    direction_used = (_detect_direction(tree['params'])
                      if direction == 'auto' else direction)
    tree['params'] = jax.device_get(
        convert_params(tree['params'], direction_used))
    # a converted tree cannot carry the old layout's optimizer moments
    tree['opt_state'] = {}
    dst = Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    out = dst / 'last'
    if out.exists():
        import shutil
        shutil.rmtree(out)
    ckpt.save(out.absolute(), tree)
    return direction_used


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('src', type=Path,
                    help="checkpoints dir (containing 'last') or 'last' dir")
    ap.add_argument('dst', type=Path, help='output checkpoints dir')
    ap.add_argument('--direction', default='auto',
                    choices=('auto', 'xla2cs', 'cs2xla'))
    args = ap.parse_args()
    used = convert_checkpoint(args.src, args.dst, args.direction)
    print(f'converted {args.src} -> {args.dst / "last"} ({used}); '
          f'optimizer state reset (moments are layout-bound)')


if __name__ == '__main__':
    main()
