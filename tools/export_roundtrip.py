"""Round-trip the jax.export serving artifact ON the TPU (VERDICT r4 #6).

Exports the CS-default EDSR serving forward two ways — plain full-image
(XLA convs: serving shapes exceed every CS plan) and --tile-style
in-jit tile-batched (embeds the CS Mosaic custom calls when lowered on
this TPU host) — then deserializes each blob, executes it HERE, pins
numerics against the in-process forward, inspects the StableHLO for
`tpu_custom_call` (the Mosaic marker), and times artifact-vs-in-process
with interleaved windows (CLAUDE.md rule 6).

Reference counterpart: the checkpoint-deploy path
(/root/reference/predict.py:77-161), which re-runs Python; this artifact
is self-contained (weights baked in).

Run ALONE on the TPU host (rules 1/5):
  nohup python tools/export_roundtrip.py > /tmp/export_rt.log 2>&1 &
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

H, W, SCALE = 256, 256, 4
TILE, OV = 80, 8
SMALL, BIG, REPEATS = 4, 20, 4


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from srtpu.models import create_model
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state
    from srtpu.train.steps import make_predict_step, make_tiled_predict_step
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print('backend:', jax.default_backend(), flush=True)

    model = create_model('EDSR', scale_factor=SCALE, n_feats=64,
                         n_resblocks=16, dtype=jnp.bfloat16,
                         use_pallas='cs')
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    plain = make_predict_step()
    tiled = make_tiled_predict_step(SCALE, TILE, OV)
    spec = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)

    arts = {}
    for name, fn in (('plain', lambda lr: plain(state, lr)),
                     ('tiled', lambda lr: tiled(state, lr))):
        t0 = time.time()
        exp = jax_export.export(jax.jit(fn))(spec)
        blob = exp.serialize()
        mlir = exp.mlir_module()
        mosaic = mlir.count('tpu_custom_call')
        print(f'{name}: exported {len(blob):,} B in {time.time() - t0:.0f}s'
              f'  platforms={exp.platforms}  tpu_custom_call x{mosaic}',
              flush=True)
        arts[name] = jax_export.deserialize(blob)

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((1, H, W, 3), np.float32))

    # numerics: deserialized artifact vs the in-process forward
    want_p = np.asarray(plain(state, lr), np.float32)
    want_t = np.asarray(tiled(state, lr), np.float32)
    for name, want in (('plain', want_p), ('tiled', want_t)):
        got = np.asarray(arts[name].call(lr), np.float32)
        print(f'{name}: artifact-vs-inprocess max|d|='
              f'{np.abs(got - want).max():.2e}', flush=True)
    print(f'tiled-vs-plain (seam residue) max|d|='
          f'{np.abs(want_t - want_p).max():.2e}', flush=True)

    # timing: interleaved two-window slopes. Artifact calls are wrapped
    # in jax.jit — the serving pattern: bare exp.call re-traces per
    # invocation and measured +10 ms/img of host overhead (r5 first run).
    paths = {'inproc plain': lambda x: plain(state, x),
             'inproc tiled': lambda x: tiled(state, x),
             'artifact plain': jax.jit(arts['plain'].call),
             'artifact tiled': jax.jit(arts['tiled'].call)}

    def window(fn, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(lr)
        float(out[0, 0, 0, 0])   # single-element fetch = the true sync
        return time.perf_counter() - t0

    for fn in paths.values():
        window(fn, 2)
    smalls = {k: [] for k in paths}
    bigs = {k: [] for k in paths}
    for _ in range(REPEATS):
        for k, fn in paths.items():
            smalls[k].append(window(fn, SMALL))
        for k, fn in paths.items():
            bigs[k].append(window(fn, BIG))
    for k in paths:
        ms = (min(bigs[k]) - min(smalls[k])) / (BIG - SMALL) * 1e3
        print(f'{k:>15}: {ms:7.2f} ms/img  '
              f'{H * W * SCALE * SCALE / ms / 1e3:6.1f} MPix(SR)/s',
              flush=True)


if __name__ == '__main__':
    main()
