#!/usr/bin/env python
"""Micro-benchmark: Pallas kernels vs XLA references on the live device.

Run on TPU to decide the per-shape defaults (srtpu.ops docstring)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_resblock(b=16, h=32, w=32, c=64, dtype=jnp.bfloat16):
    from srtpu.ops import resblock_fused, resblock_reference
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype)
    b1 = jnp.zeros(c, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype)
    b2 = jnp.zeros(c, jnp.float32)

    fused = jax.jit(lambda *a: resblock_fused(*a))
    ref = jax.jit(lambda *a: resblock_reference(*a))
    t_fused = timeit(fused, x, w1, b1, w2, b2)
    t_ref = timeit(ref, x, w1, b1, w2, b2)
    flops = 2 * 2 * b * h * w * c * c * 9
    print(f'resblock {b}x{h}x{w}x{c} {dtype.__name__}: '
          f'pallas {t_fused*1e6:.1f}us ({flops/t_fused/1e12:.1f} TF/s)  '
          f'xla {t_ref*1e6:.1f}us ({flops/t_ref/1e12:.1f} TF/s)  '
          f'speedup {t_ref/t_fused:.2f}x')
    return t_ref / t_fused


def bench_ca(b=16, h=32, w=32, c=64, r=16, dtype=jnp.bfloat16):
    from srtpu.ops import ca_layer_fused, ca_layer_reference
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, c // r)) * 0.1, jnp.float32)
    b1 = jnp.zeros(c // r, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c // r, c)) * 0.1, jnp.float32)
    b2 = jnp.zeros(c, jnp.float32)

    fused = jax.jit(lambda *a: ca_layer_fused(*a))
    ref = jax.jit(lambda *a: ca_layer_reference(*a))
    t_fused = timeit(fused, x, w1, b1, w2, b2)
    t_ref = timeit(ref, x, w1, b1, w2, b2)
    print(f'ca_layer {b}x{h}x{w}x{c}: pallas {t_fused*1e6:.1f}us  '
          f'xla {t_ref*1e6:.1f}us  speedup {t_ref/t_fused:.2f}x')
    return t_ref / t_fused


if __name__ == '__main__':
    print('device:', jax.devices()[0])
    bench_resblock()
    bench_resblock(c=128)
    bench_ca()
    bench_ca(c=128, r=16)
