"""One-process interleaved A/B: RDN-B grid-over-blocks trunk vs per-block
calls.

PERF.md round-5 RDN close-out left one idea unharvested: "grid-over-
blocks weight DMA via BlockSpec index maps (no XLA slices at all)".
Arms (cs_conv._RDN_FWD, read at trace time):

  calls — rdn_trunk_cs2: D fwd pallas_calls fed by XLA w[l:l+1] slices,
          per-block buf arrays, XLA concat of the D outputs (shipped r3);
  grid  — rdn_trunk_cat_cs: ONE fwd kernel, grid (G, D), weights DMA'd
          by index maps, outputs written in GFF concat layout; backward
          reads the buf stack via scalar-prefetch index maps.

Run ALONE on the TPU host (CLAUDE.md rules 1/5/6):
  nohup python tools/ab_rdn_grid.py > /tmp/ab_rdn_grid.log 2>&1 &
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SMALL, BIG, REPEATS = 5, 25, 4


def main():
    import bench
    from srtpu.ops import cs_conv
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()

    arms = {}
    for name in ('calls', 'grid'):
        cs_conv._RDN_FWD = name
        state, step, lr_img, hr_img = bench.build('RDN', {})
        t0 = time.time()
        try:
            state, logs = step(state, lr_img, hr_img)
            float(logs['loss'])
        except Exception as exc:
            print(f'{name}: COMPILE/RUN FAILED {type(exc).__name__}: '
                  f'{str(exc)[:300]}', flush=True)
            continue
        print(f'{name}: compile+first {time.time() - t0:.0f}s', flush=True)
        arms[name] = [state, step, lr_img, hr_img]

    def window(arm, n):
        st, step, lr, hr = arms[arm]
        t0 = time.perf_counter()
        logs = None
        for _ in range(n):
            arms[arm][0], logs = step(arms[arm][0], lr, hr)
        float(logs['loss'])
        return time.perf_counter() - t0

    for k in arms:
        window(k, 2)
    smalls = {k: [] for k in arms}
    bigs = {k: [] for k in arms}
    for r in range(REPEATS):
        for k in arms:
            smalls[k].append(window(k, SMALL))
        for k in arms:
            bigs[k].append(window(k, BIG))
        print(f'round {r}: ' + '  '.join(
            f'{k}={(bigs[k][-1] - smalls[k][-1]) / (BIG - SMALL) * 1e3:.2f}'
            for k in arms), flush=True)

    for k in arms:
        ms = (min(bigs[k]) - min(smalls[k])) / (BIG - SMALL) * 1e3
        print(f'{k}: {ms:.2f} ms/step  '
              f'({bench.BATCH / ms * 1e3:.0f} patches/s)', flush=True)


if __name__ == '__main__':
    main()
