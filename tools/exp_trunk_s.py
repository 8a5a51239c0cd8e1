"""Experiment: CS trunk throughput vs lane-packing S (k images/row).

Times trunk_cs (16 fused resblocks) fwd+bwd at S=4096 (k=4, 4 groups,
the shipped config) vs S=8192 (k=8, 2 groups) on EDSR-baseline shapes.
Fewer, larger groups = fewer grid steps and DMA roundtrips per kernel;
the question is whether the bigger VMEM working set still fits/pipelines.

Two-window value-fetch slope timing (PERF.md measurement rules).
"""

from __future__ import annotations

import sys
import time

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B, H, W, C, L = 16, 32, 32, 64, 16


def time_fn(fn, *args, chain=30, small=20, big=120):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.asarray(a).ravel()[0].astype(jnp.float32)), out)

    def window(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
        return time.perf_counter() - t0

    window(2)
    ts = min(window(small) for _ in range(2))
    tb = min(window(big) for _ in range(2))
    return (tb - ts) / (big - small)


def build(k):
    from srtpu.ops import cs_conv as cc
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32),
                    jnp.bfloat16)
    w1 = jnp.asarray(rng.random((L, 3 * C, 3 * C), np.float32) * 0.05,
                     jnp.float32)
    b1 = jnp.zeros((L, C), jnp.float32)
    w2 = jnp.asarray(rng.random((L, 3 * C, 3 * C), np.float32) * 0.05,
                     jnp.float32)
    b2 = jnp.zeros((L, C), jnp.float32)
    x_cs = cc.nhwc_to_cs(x, k)

    def step(x_cs, w1, b1, w2, b2):
        def f(xc, w1, b1, w2, b2):
            out = cc.trunk_cs(xc, w1, b1, w2, b2, 1.0, W, k)
            return jnp.sum(out.astype(jnp.float32))
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            x_cs, w1, b1, w2, b2)
        return val, grads[1]

    return jax.jit(step), (x_cs, w1, b1, w2, b2)


def main():
    from srtpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    for k in ks:
        try:
            fn, args = build(k)
            dt = time_fn(fn, *args)
            print(f'k={k} (S={H * W * k}, groups={B // k}): '
                  f'{dt * 1e3:.3f} ms per fwd+bwd trunk')
        except Exception as e:
            print(f'k={k}: FAILED {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    main()
