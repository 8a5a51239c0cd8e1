#!/usr/bin/env python
"""Micro-benchmark: Pallas kernels vs XLA references on the live device.

Run on TPU to decide the per-shape defaults (srtpu.ops docstring)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # On remote-attached TPUs block_until_ready does not wait for
    # execution; fetching a value does.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, small=10, big=60):
    out = fn(*args)
    _sync(out)
    for _ in range(5):
        out = fn(*args)
    _sync(out)

    def window(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    t_small = min(window(small) for _ in range(2))
    t_big = min(window(big) for _ in range(2))
    return (t_big - t_small) / (big - small)


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
