"""Trace one model's train step on the TPU and print the per-op table.

Usage: python tools/profile_model.py MODEL [key=value ...] [--steps N]
Builds the same jitted train step as bench.py, runs N profiled steps
under jax.profiler.trace, then summarizes the xplane with
tools/profile_summary.py machinery.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    import bench
    from srtpu.utils import enable_compilation_cache
    from tools.profile_summary import summarize

    enable_compilation_cache()
    args = sys.argv[1:]
    steps = 30
    if '--steps' in args:
        i = args.index('--steps')
        steps = int(args[i + 1])
        del args[i:i + 2]
    model = args[0]
    kwargs = {}
    for kv in args[1:]:
        key, val = kv.split('=', 1)
        kwargs[key] = yaml.safe_load(val)

    state, step, lr_img, hr_img = bench.build(model, kwargs)
    state, logs = step(state, lr_img, hr_img)
    float(logs['loss'])  # compile + true sync
    for _ in range(3):
        state, logs = step(state, lr_img, hr_img)
    float(logs['loss'])

    trace_dir = tempfile.mkdtemp(prefix=f'prof_{model}_')
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, logs = step(state, lr_img, hr_img)
        float(logs['loss'])
    print(f'# {model} {kwargs}: {steps} steps, trace in {trace_dir}')
    summarize(trace_dir, steps=steps, top=25)


if __name__ == '__main__':
    main()
