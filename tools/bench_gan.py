"""Measure the SRGAN fused D+G adversarial step throughput on the TPU.

Same shapes as the zoo table (batch 16, HR patch 128, x4) and the same
two-window value-fetch-slope method as bench.py (block_until_ready does
not sync on the tunneled TPU). The step is the full reference objective
(/root/reference/models/srgan.py:136-190): D update on (HR, stopgrad SR)
then G update with MSE+VGG+adv+TV against the refreshed D.

Usage: python tools/bench_gan.py [key=value ...]   e.g. n_blocks=16
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH, PATCH, SCALE = 16, 128, 4
SMALL_WINDOW, BIG_WINDOW, REPEATS = 10, 60, 2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srtpu.models.srgan import SRGANDiscriminator, SRGANGenerator
    from srtpu.train.gan import create_gan_state, make_gan_train_step
    from srtpu.utils import enable_compilation_cache

    enable_compilation_cache()
    kwargs = {}
    for kv in sys.argv[1:]:
        key, val = kv.split('=', 1)
        kwargs[key] = yaml.safe_load(val)
    batch = kwargs.pop('batch', BATCH)
    patch = kwargs.pop('patch', PATCH)
    small_w = kwargs.pop('small_window', SMALL_WINDOW)
    big_w = kwargs.pop('big_window', BIG_WINDOW)

    gen = SRGANGenerator(scale_factor=SCALE, dtype=jnp.bfloat16, **kwargs)
    disc = SRGANDiscriminator(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    lr_img = jnp.asarray(rng.random(
        (batch, patch // SCALE, patch // SCALE, 3), np.float32))
    hr_img = jnp.asarray(rng.random((batch, patch, patch, 3), np.float32))

    state = create_gan_state(gen, disc, jax.random.PRNGKey(0), lr_img)
    step = make_gan_train_step()  # already jitted with state donation

    t0 = time.time()
    state, logs = step(state, lr_img, hr_img)
    float(logs['g_loss'])
    compile_s = time.time() - t0

    def window(n):
        nonlocal state
        t = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, lr_img, hr_img)
        float(logs['g_loss'])
        return time.perf_counter() - t

    window(2)
    t_small = min(window(small_w) for _ in range(REPEATS))
    t_big = min(window(big_w) for _ in range(REPEATS))
    ms = (t_big - t_small) / (big_w - small_w) * 1e3
    print(f'SRGAN D+G step b{batch} p{patch} {kwargs}: {ms:.2f} ms/step = '
          f'{batch / ms * 1e3:.0f} patches/s (compile {compile_s:.0f}s)')


if __name__ == '__main__':
    main()
