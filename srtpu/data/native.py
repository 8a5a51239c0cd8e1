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
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-pthread',
           str(src), '-o', str(_SO_PATH)]
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
        vpp = ctypes.POINTER(ctypes.c_void_p)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.extract_patch_batch.argtypes = [
            vpp, ip, vpp, ip, i, i, i, i,
            ip, ip, ip, ip, ip, f32p, f32p, i]
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


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def extract_patch_batch(lrs, hrs, patch_size: int, scale: int,
                        ys: np.ndarray, xs: np.ndarray, rots: np.ndarray,
                        hflips: np.ndarray, vflips: np.ndarray,
                        out_lr: np.ndarray, out_hr: np.ndarray,
                        nthreads: int = 1) -> None:
    """Whole-batch fused crop+augment: ONE ctypes crossing per batch.

    The per-item wrapper above costs ~80 us of argument marshalling per
    call, which capped the loader below the device training rate; here
    the item loop (optionally threaded) lives in C++.
    """
    lib = get_lib()
    assert lib is not None
    n = len(lrs)
    assert out_lr.dtype == np.float32 and out_lr.flags.c_contiguous
    assert out_hr.dtype == np.float32 and out_hr.flags.c_contiguous
    lp = patch_size // scale
    lr_ws = np.empty(n, np.int32)
    hr_ws = np.empty(n, np.int32)
    lptr = (ctypes.c_void_p * n)()
    hptr = (ctypes.c_void_p * n)()
    for j in range(n):
        a, b = lrs[j], hrs[j]
        assert a.dtype == np.float32 and a.flags.c_contiguous
        assert b.dtype == np.float32 and b.flags.c_contiguous
        lptr[j] = a.ctypes.data
        hptr[j] = b.ctypes.data
        lr_ws[j] = a.shape[1]
        hr_ws[j] = b.shape[1]
    ys = np.ascontiguousarray(ys, np.int32)
    xs = np.ascontiguousarray(xs, np.int32)
    rots = np.ascontiguousarray(rots, np.int32)
    hflips = np.ascontiguousarray(hflips, np.int32)
    vflips = np.ascontiguousarray(vflips, np.int32)
    vpp = ctypes.POINTER(ctypes.c_void_p)
    lib.extract_patch_batch(
        ctypes.cast(lptr, vpp), _ip(lr_ws), ctypes.cast(hptr, vpp),
        _ip(hr_ws), n, lrs[0].shape[2], scale, lp,
        _ip(ys), _ip(xs), _ip(rots), _ip(hflips), _ip(vflips),
        _fp(out_lr), _fp(out_hr), int(nthreads))


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
