"""DDBPN back-projection convs on the CS kernel path: weight builders.

DDBPN's projection convs (reference models/ddbpn.py:10-24) are
stride-r convs / transposed convs with kernel k = {6, 8, 12} for
r = {2, 4, 8} and padding 2.  On the CS layout both directions lower to
plain 3x3 COARSE convs over phase-major channels:

- ConvTranspose (up, LR -> HR): torch semantics out[f] += x[c] * w[q]
  with q = f - r*c + p.  For fine row f = r*y + a and coarse tap
  c = y + dy the kernel index is q = a + p - r*dy, live only when
  q in [0, k): every output phase sees at most ceil(k/r) <= 3 coarse
  taps, so the whole convT is one wide conv with phase-major outputs
  ((a*r+b)*C' + c') and a 3x3 coarse tap window (dead taps zero).
- Strided conv (down, HR -> LR): out[c] += x[f] * w[q] with
  q = f - r*c + p = r*dy + a + p for f = r*(c+dy) + a: a 3x3 coarse
  conv CONSUMING phase-major channels ((a*r+b)*C + c).

Dead-tap positions are structural zeros: the builders also emit 0/1
masks (same arrangement) that the model multiplies into the stored
weights each step, so gradients never resurrect them.  Weights are
stored pre-arranged in the CS form consumed by conv3x3_cs_pre
(rows (dy, c_out), cols (dx, c_in)) — per-step transform-free, the
EDSR round-2 lesson (PERF.md).

Boundary exactness: torch pads p = 2 < r fine pixels, all of which
fall into coarse pixel -1 / H — identical to the coarse conv's SAME
zero handling.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

_PROJ_PARAMS = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


def up_pm_scatter(r: int, k: int, p: int):
    """Index map for the up (convT) builder: yields
    (dy, a, q) triples with q = a + p - r*dy in [0, k)."""
    out = []
    for a in range(r):
        for dy in (-1, 0, 1):
            q = a + p - r * dy
            if 0 <= q < k:
                out.append((dy, a, q))
    return out


def down_pm_scatter(r: int, k: int, p: int):
    """Index map for the down (strided conv) builder: (dy, a, q) with
    q = r*dy + a + p in [0, k)."""
    out = []
    for a in range(r):
        for dy in (-1, 0, 1):
            q = r * dy + a + p
            if 0 <= q < k:
                out.append((dy, a, q))
    return out


def w_up_pm(w_hwoi: jax.Array, r: int) -> jax.Array:
    """ConvTranspose2d kernel HWOI (k, k, C', C) -> coarse HWIO
    (3, 3, C, r*r*C') with phase-major outputs ((a*r+b)*C' + c')."""
    k, _, c_out, c_in = w_hwoi.shape
    p = _PROJ_PARAMS[r][2]
    wpm = jnp.zeros((3, 3, c_in, r * r * c_out), w_hwoi.dtype)
    sc = up_pm_scatter(r, k, p)
    for dy, a, qy in sc:
        for dx, b, qx in sc:
            oc = (a * r + b) * c_out
            wpm = wpm.at[dy + 1, dx + 1, :, oc:oc + c_out].set(
                jnp.transpose(w_hwoi[qy, qx], (1, 0)))
    return wpm


def w_down_pd(w_hwio: jax.Array, r: int) -> jax.Array:
    """Strided Conv2d kernel HWIO (k, k, C, C') -> coarse HWIO
    (3, 3, r*r*C, C') consuming phase-major inputs ((a*r+b)*C + c)."""
    k, _, c_in, c_out = w_hwio.shape
    p = _PROJ_PARAMS[r][2]
    wpd = jnp.zeros((3, 3, r * r * c_in, c_out), w_hwio.dtype)
    sc = down_pm_scatter(r, k, p)
    for dy, a, qy in sc:
        for dx, b, qx in sc:
            ic = (a * r + b) * c_in
            wpd = wpd.at[dy + 1, dx + 1, ic:ic + c_in, :].set(
                w_hwio[qy, qx])
    return wpd


@lru_cache(maxsize=None)
def up_mask_cs(r: int, c_in: int, c_out: int) -> np.ndarray:
    """0/1 mask of live up-conv weights, CS-arranged (3*r*r*C', 3*C)."""
    from srtpu.ops.cs_conv import w_cs
    k = _PROJ_PARAMS[r][0]
    ones = jnp.ones((k, k, c_out, c_in), jnp.float32)
    m = w_cs(w_up_pm(ones, r))
    return np.asarray(jax.device_get(m), np.float32)


@lru_cache(maxsize=None)
def down_mask_cs(r: int, c_in: int, c_out: int) -> np.ndarray:
    """0/1 mask of live down-conv weights, CS-arranged (3*C', 3*r*r*C)."""
    from srtpu.ops.cs_conv import w_cs
    k = _PROJ_PARAMS[r][0]
    ones = jnp.ones((k, k, c_in, c_out), jnp.float32)
    m = w_cs(w_down_pd(ones, r))
    return np.asarray(jax.device_get(m), np.float32)


@lru_cache(maxsize=None)
def final_mask_cs(r: int, c_in: int, ch: int) -> np.ndarray:
    """0/1 mask of live final-conv weights (3x3 fine conv as phase-dense
    coarse conv), CS-arranged (3*CO, 3*r*r*C_in)."""
    from srtpu.ops.cs_conv import w_cs, w_phase_dense
    ones = jnp.ones((3, 3, c_in, ch), jnp.float32)
    m = w_cs(w_phase_dense(ones, r))
    return np.asarray(jax.device_get(m), np.float32)


def nhwc_to_pm(x: jax.Array, r: int) -> jax.Array:
    """Fine NHWC (B, r*h, r*w, C) -> coarse NHWC with phase-major
    channels (B, h, w, r*r*C), channel order (a*r+b)*C + c."""
    bsz, hf, wf, c = x.shape
    h, w = hf // r, wf // r
    y = x.reshape(bsz, h, r, w, r, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(bsz, h, w,
                                                        r * r * c)


def pm_to_nhwc_fine(x: jax.Array, r: int) -> jax.Array:
    """Inverse of nhwc_to_pm."""
    bsz, h, w, rrc = x.shape
    c = rrc // (r * r)
    y = x.reshape(bsz, h, w, r, r, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(bsz, h * r,
                                                        w * r, c)


def convert_params_xla_to_cs(params: dict, r: int, nr: int,
                             depth: int, channels: int = 3) -> dict:
    """Convert a DDBPN XLA-branch param tree (DenseProjection_i fine
    kernels) to the CS-branch tree (CSDenseProjection_i pre-arranged
    weights) — same numbers, different arrangement. Head convs copy
    through; dead coarse-tap slots are zero (the masks keep them so)."""
    from srtpu.ops.cs_conv import w_cs, w_phase_dense
    out = {'Conv2d_0': params['Conv2d_0'], 'Conv2d_1': params['Conv2d_1'],
           'head_alpha0': params['PReLU_0']['alpha'],
           'head_alpha1': params['PReLU_1']['alpha']}
    n_units = 2 * (depth - 1) + 1
    for i in range(n_units):
        src = params[f'DenseProjection_{i}']
        dst = {}
        has_bneck = 'Conv2d_0' in src
        off = 0
        if has_bneck:
            dst['bneck_kernel'] = jnp.asarray(
                src['Conv2d_0']['kernel'])[0, 0]
            dst['bneck_bias'] = src['Conv2d_0']['bias']
            dst['bneck_alpha'] = src['PReLU_0']['alpha']
            off = 1
        for name, j in (('a0', 0), ('b0', 1), ('a1', 2)):
            pc = src[f'_ProjectionConv_{j}']
            if 'ConvTranspose2d_0' in pc:
                leaf = pc['ConvTranspose2d_0']
                dst[f'{name}_kernel'] = w_cs(w_up_pm(
                    jnp.asarray(leaf['kernel']), r))
            else:
                leaf = pc['Conv2d_0']
                dst[f'{name}_kernel'] = w_cs(w_down_pd(
                    jnp.asarray(leaf['kernel']), r))
            dst[f'{name}_bias'] = leaf['bias']
            dst[f'{name}_alpha'] = src[f'PReLU_{off + j}']['alpha']
        out[f'CSDenseProjection_{i}'] = dst
    wf = jnp.asarray(params['Conv2d_2']['kernel'])     # (3,3,T*nr,ch)
    out['out_kernel'] = jnp.stack(
        [w_cs(w_phase_dense(wf[:, :, t * nr:(t + 1) * nr, :], r))
         for t in range(depth)])
    out['out_bias'] = params['Conv2d_2']['bias']
    return out
