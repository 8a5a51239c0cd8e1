"""Measure full-train-step throughput for one model config on the TPU.

Usage: python tools/bench_model.py MODEL [key=value ...]
Example: python tools/bench_model.py RDN rdn_config=B use_pallas=cs

Uses bench.py's build/measure machinery (two-window value-fetch slope).
"""

from __future__ import annotations

import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import bench
    from srtpu.utils import enable_compilation_cache
    enable_compilation_cache()
    model = sys.argv[1]
    kwargs = {}
    for kv in sys.argv[2:]:
        key, val = kv.split('=', 1)
        kwargs[key] = yaml.safe_load(val)
    import time
    t0 = time.time()
    pps = bench.measure({'model': model, 'kwargs': kwargs})
    print(f'{model} {kwargs}: {pps:.1f} patches/s '
          f'({bench.BATCH / pps * 1e3:.2f} ms/step) '
          f'[total incl. compile {time.time() - t0:.0f}s]')


if __name__ == '__main__':
    main()
