"""ctypes bridge to the native data-loader core (native/patchops.cc).

Builds libpatchops.so with g++ on first use (cached next to the source) and
falls back silently to the numpy/PIL path if no compiler is available —
every entry point has a pure-Python equivalent in srtpu.data.pipeline /
srtpu.data.sources, and tests assert both paths agree.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / 'native'
_SO_PATH = _NATIVE_DIR / 'libpatchops.so'
_lib = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / 'patchops.cc'
    if not src.exists():
        return False
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', str(src),
           '-o', str(_SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        _logger.info('native patchops build failed (%s); using numpy path',
                     e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # rebuild when missing OR stale: the .so is built with -march=native
    # (never distributed), so a leftover binary from another host's ISA or
    # an edited patchops.cc must not be silently preferred
    src = _SO_PATH.with_name('patchops.cc')
    stale = (_SO_PATH.exists() and src.exists()
             and src.stat().st_mtime > _SO_PATH.stat().st_mtime)
    if (not _SO_PATH.exists() or stale) and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i = ctypes.c_int
        lib.extract_patch_pair.argtypes = [
            f32p, i, i, f32p, i, i, i, i, i, i, i, i, i, i, f32p, f32p]
        lib.bicubic_downscale_u8.argtypes = [u8p, i, i, i, i, i, u8p]
        lib.bicubic_downscale_f32.argtypes = [f32p, i, i, i, i, i, f32p]
        _lib = lib
    except OSError as e:
        _logger.info('native patchops load failed (%s)', e)
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_patch_pair(lr: np.ndarray, hr: np.ndarray, patch_size: int,
                       scale: int, lr_y: int, lr_x: int, rot: int,
                       hflip: bool, vflip: bool,
                       out_lr: np.ndarray, out_hr: np.ndarray) -> None:
    """Fused crop+augment into preallocated float32 batch slots."""
    lib = get_lib()
    assert lib is not None
    assert lr.dtype == np.float32 and lr.flags.c_contiguous
    assert hr.dtype == np.float32 and hr.flags.c_contiguous
    lp = patch_size // scale
    lib.extract_patch_pair(
        _fp(lr), lr.shape[0], lr.shape[1],
        _fp(hr), hr.shape[0], hr.shape[1],
        lr.shape[2], scale, lp, int(lr_y), int(lr_x),
        int(rot), int(hflip), int(vflip), _fp(out_lr), _fp(out_hr))


def bicubic_downscale(hr: np.ndarray, scale: int) -> np.ndarray:
    """PIL-equivalent bicubic downscale, native implementation."""
    lib = get_lib()
    assert lib is not None
    h, w, c = hr.shape
    oh, ow = h // scale, w // scale
    if hr.dtype == np.uint8:
        out = np.empty((oh, ow, c), np.uint8)
        lib.bicubic_downscale_u8(
            hr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            oh, ow, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    hr32 = np.ascontiguousarray(hr, np.float32)
    out = np.empty((oh, ow, c), np.float32)
    lib.bicubic_downscale_f32(_fp(hr32), h, w, c, oh, ow, _fp(out))
    return out
