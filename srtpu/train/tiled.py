"""Tiled inference: super-resolve arbitrarily large images in fixed-shape
overlapping tiles.

The reference runs full images through the model at batch 1
(srmodel.py:375-380), which on XLA would compile per image size and on any
accelerator eventually exhausts memory. Tiling gives:
* ONE compiled program per (tile, scale) — no per-image recompiles;
* bounded activation memory regardless of input size;
* bit-identical interiors when ``overlap`` >= the model's receptive-field
  radius (each emitted pixel only uses LR context that its tile contains).

Every output pixel is taken from a tile where it sits at least ``overlap``
pixels away from a (non-border) tile edge. Images smaller than the tile are
edge-padded up to it — their borders then see replicated (not zero) conv
context, so sub-tile images should use the direct bucketed path instead
(the predict flow only tiles images larger than the tile).
"""

from __future__ import annotations

import numpy as np


def receptive_field_radius(model) -> int:
    """Conservative LR-space receptive-field radius: ~one pixel per 3x3
    conv. Ample for EDSR/WDSR/RDN/SRCNN defaults; very deep RCAN configs
    should pass a larger overlap explicitly."""
    n_blocks = getattr(model, 'n_resblocks', 16)
    return min(max(2 * n_blocks + 16, 24), 96)


def _anchors(size: int, tile: int, stride: int) -> list[int]:
    """Tile start positions covering [0, size) with the last tile clamped
    inside the image (no padding except when size < tile)."""
    if size <= tile:
        return [0]
    out, y = [], 0
    while True:
        out.append(min(y, size - tile))
        if y + tile >= size:
            break
        y += stride
    return sorted(set(out))


def tiled_predict(forward, lr: np.ndarray, scale: int, tile: int = 128,
                  overlap: int = 32) -> np.ndarray:
    """Super-resolve ``lr`` (HWC float32) with fixed (tile, tile) LR tiles.

    ``forward`` maps (1, tile, tile, C) LR to (1, tile*scale, tile*scale,
    C) SR. ``overlap`` (LR px) must be >= the receptive-field radius for
    exact-interior stitching; stride between tiles = tile - 2*overlap.
    """
    assert tile > 2 * overlap >= 0, (tile, overlap)
    h, w, c = lr.shape
    stride = tile - 2 * overlap
    out = np.zeros((h * scale, w * scale, c), np.float32)

    ys = _anchors(h, tile, stride)
    xs = _anchors(w, tile, stride)

    for yi, y0 in enumerate(ys):
        for xi, x0 in enumerate(xs):
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            src = lr[y0:y1, x0:x1]
            pad_h, pad_w = tile - src.shape[0], tile - src.shape[1]
            if pad_h or pad_w:
                src = np.pad(src, ((0, pad_h), (0, pad_w), (0, 0)),
                             mode='edge')
            sr_tile = np.asarray(forward(src[None]))[0]

            # emit only the deep-context center, except at image borders
            vy0 = 0 if yi == 0 else overlap
            vx0 = 0 if xi == 0 else overlap
            vy1 = (y1 - y0) if yi == len(ys) - 1 else (y1 - y0) - overlap
            vx1 = (x1 - x0) if xi == len(xs) - 1 else (x1 - x0) - overlap

            out[(y0 + vy0) * scale:(y0 + vy1) * scale,
                (x0 + vx0) * scale:(x0 + vx1) * scale] = \
                sr_tile[vy0 * scale:vy1 * scale, vx0 * scale:vx1 * scale]
    return out
