#!/usr/bin/env python
"""Summarize a jax.profiler trace (xplane.pb) into a per-op time table.

Usage:
  python tools/profile_summary.py <trace_dir> [steps]

<trace_dir> is the directory passed to trainer.profiler /
jax.profiler.start_trace; [steps] divides totals into per-step numbers.
Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python when the installed
tensorflow/protobuf pair mismatches (the tool sets it automatically before
importing).
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')


def summarize(trace_dir: str, steps: int = 1, top: int = 20) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        print(f'no xplane.pb under {trace_dir}', file=sys.stderr)
        raise SystemExit(2)

    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], 'rb') as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if 'TPU' not in plane.name and 'GPU' not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals: dict[str, float] = defaultdict(float)
        counts: dict[str, int] = defaultdict(int)
        total_all = 0.0
        for line in plane.lines:
            if 'XLA Ops' not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name.split('.')[0]
                dur = ev.duration_ps / 1e6  # us
                totals[name] += dur
                counts[name] += 1
                total_all += dur
        if not totals:
            continue
        print(f'== {plane.name}: {total_all / steps / 1e3:.3f} ms/step '
              f'total op time (durations overlap for async ops)')
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f'  {v / steps:9.1f} us/step  x{counts[k] / steps:<7.1f} '
                  f'{k[:64]}')


if __name__ == '__main__':
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
