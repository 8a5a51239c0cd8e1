"""Zoo x scale coverage sweep with explicit path attribution.

VERDICT r4 #8: the scale table was EDSR-only and fallbacks were silent
(e.g. SRResNet's 9x9 tail at x3 computes a phase-dense coarse span
ck != 3 and quietly takes the XLA tail). Each cell here measures the
full train step (bench.py machinery: value-fetch two-window slope) AND
reports which path every CS module actually took, read from the
trace-time cs_conv.PATH_LOG — wins and fallbacks are recorded per cell,
never inferred from throughput.

Reference scales: x2/x3/x4/x8 are first class
(/root/reference/models/common.py:125); x4 rows live in bench.py.

Run ALONE on the TPU host (CLAUDE.md rules 1/5):
  nohup python tools/scale_sweep.py > /tmp/scale_sweep.log 2>&1 &
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CELLS = [
    ('EDSR', 8, {}),
    ('SRResNet', 2, {}),
    ('SRResNet', 3, {}),
    ('SRResNet', 8, {}),
    ('RCAN', 2, dict(n_resgroups=10, n_resblocks=16)),
    ('RCAN', 3, dict(n_resgroups=10, n_resblocks=16)),
    ('RCAN', 8, dict(n_resgroups=10, n_resblocks=16)),
]


def main():
    import bench
    from srtpu.ops import cs_conv
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()
    for model, scale, extra in CELLS:
        cs_conv.PATH_LOG.clear()
        kwargs = dict(scale_factor=scale, **extra)
        t0 = time.time()
        try:
            pps = bench.measure({'model': model, 'kwargs': kwargs})
        except Exception as exc:
            print(f'{model} x{scale}: ERROR {type(exc).__name__}: '
                  f'{str(exc)[:160]}', flush=True)
            continue
        paths = '; '.join(
            f'{m}{list(sh)}={p}' for (m, sh), p in
            sorted(cs_conv.PATH_LOG.items()))
        print(f'{model} x{scale}: {pps:.0f} patches/s '
              f'({bench.BATCH / pps * 1e3:.2f} ms/step) '
              f'[{time.time() - t0:.0f}s incl compile]  paths: {paths}',
              flush=True)


if __name__ == '__main__':
    main()
