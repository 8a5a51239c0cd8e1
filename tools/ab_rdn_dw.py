"""One-process interleaved A/B: RDN-B dW plumbing variants.

VERDICT r4 #4 (RDN-B close-out). The round-5 profile
(tools/profile_model.py RDN) shows the 22.33 ms step 78% kernel-busy
(17.5 ms Mosaic) with 756 async copy-starts + 542 slice-starts per step
— XLA data movement around 68 kernel calls. Arms (flags read at trace
time, srtpu/ops/cs_conv.py):

  per-block/18 — legacy: per-(block,layer) dW layout conversion,
                 3 dW kernel calls per block (18 pairs/call);
  batched/18   — one dW transpose per LAYER across all 16 blocks;
  batched/45   — plus all 45 dW pairs in ONE kernel call per block
                 (6.6 MB f32 accumulators — may exceed the scoped VMEM
                 budget; a compile failure here is a result, not a bug).

Run ALONE on the TPU host (CLAUDE.md rules 1/5/6):
  nohup python tools/ab_rdn_dw.py > /tmp/ab_rdn.log 2>&1 &
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
    for name, layout, pairs in (('per-block/18', 'per-block', 18),
                                ('batched/18', 'batched', 18),
                                ('batched/45', 'batched', 45)):
        cs_conv._RDN_DW_LAYOUT = layout
        cs_conv._DW_PAIRS_PER_CALL = pairs
        state, step, lr_img, hr_img = bench.build('RDN', {})
        t0 = time.time()
        try:
            state, logs = step(state, lr_img, hr_img)
            float(logs['loss'])
        except Exception as exc:
            print(f'{name}: COMPILE/RUN FAILED {type(exc).__name__}: '
                  f'{str(exc)[:200]}', flush=True)
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
              f'{bench.BATCH / ms * 1e3:.0f} patches/s', flush=True)


if __name__ == '__main__':
    main()
