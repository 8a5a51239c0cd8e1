"""Dataset sources: image directories, .npy directories, HuggingFace hub.

Capability parity with the reference's three dataset classes
(reference srdata.py:172-354):
* ImageFolderSource  — image dir with extension filter; HR-only dirs get
  bicubic LR synthesis on the fly (srdata.py:227-233);
* NpySource          — .npy dirs (srdata.py:253-330);
* HuggingFaceSource  — eugenesiow/* LR+HR file-path datasets
  (srdata.py:333-354).

A source yields decoded float32 HWC arrays in [0,1]; patching/augmenting/
batching live in srtpu.data.pipeline (host side), device transfer in the
loader. Eval sources cache decoded images in RAM — benchmark eval sets are
tiny and re-read every validation epoch.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

_logger = logging.getLogger(__name__)

IMG_EXTENSIONS = {'.jpg', '.jpeg', '.png', '.ppm', '.bmp'}

# reference srdata.py:392-417 name mapping
HF_DATASET_NAMES = {
    'DIV2K': 'eugenesiow/Div2k',
    'B100': 'eugenesiow/BSD100',
    'Set5': 'eugenesiow/Set5',
    'Set14': 'eugenesiow/Set14',
    'Urban100': 'eugenesiow/Urban100',
}


def _to_float(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


# --------------------------------------------------------------------------
# On-disk decoded cache (VERDICT r4 #5).
#
# PNG/JPEG decode on this 1-core host runs ~80 patches/s — ~96x below the
# device rate — and the RAM cache above it is per-process, so EVERY run
# and every sweep cell (tools/run_comparisons.py) re-pays a decode-bound
# first epoch. The reference hides decode cost behind a per-worker decode
# pool (reference srdata.py:514-516) — multi-core only. Here each image's
# decoded RAW array (uint8/uint16, pre-_to_float: half the bytes of f32
# and bit-exact) is written once per machine to
# ``$SRTPU_DECODE_CACHE`` (a dir; default ~/.cache/srtpu/decoded;
# ``0``/``off`` disables), keyed by absolute path + mtime + size, and
# later loads are a raw read at disk bandwidth. Writes are atomic
# (tmp + rename) so concurrent processes can share the dir.
# --------------------------------------------------------------------------

def _decode_cache_dir():
    import os
    val = os.environ.get('SRTPU_DECODE_CACHE', '')
    if val.lower() in ('0', 'off', 'none', 'disable', 'disabled'):
        return None
    if val:
        return Path(val)
    return Path.home() / '.cache' / 'srtpu' / 'decoded'


def _decode_cache_path(path, suffix: str = '') -> Path | None:
    root = _decode_cache_dir()
    if root is None:
        return None
    import hashlib
    try:
        p = Path(path).resolve()
        st = p.stat()
    except OSError:
        return None
    key = hashlib.sha1(str(p).encode()).hexdigest()[:24]
    return root / f'{key}-{st.st_mtime_ns}-{st.st_size}{suffix}.npy'


def _cache_load(cache: Path | None) -> np.ndarray | None:
    if cache is None:
        return None
    try:
        if cache.exists():
            return np.load(cache)
    except Exception:  # torn/corrupt entry: fall through to re-decode
        _logger.warning('unreadable decode-cache entry %s; re-decoding',
                        cache)
    return None


def _cache_store(cache: Path | None, raw: np.ndarray) -> None:
    if cache is None:
        return
    import os
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        tmp = cache.with_suffix(f'.{os.getpid()}.tmp.npy')
        np.save(tmp, raw)
        os.replace(tmp, cache)
    except OSError as exc:  # full/read-only disk must not break training
        _logger.warning('decode-cache write failed (%s); continuing '
                        'uncached', exc)


def _load_image(path) -> np.ndarray:
    cache = _decode_cache_path(path)
    raw = _cache_load(cache)
    if raw is None:
        from PIL import Image
        with Image.open(path) as im:
            raw = np.asarray(im.convert('RGB'))
        _cache_store(cache, raw)
    return _to_float(raw)


def bicubic_downscale_raw(hr: np.ndarray, scale: int) -> np.ndarray:
    """PIL-equivalent bicubic downscale, returning the uint8 LR
    (reference srdata.py:227-233 uses torchvision's PIL-backed resize).
    The PIL output is already uint8-quantized, so caching this raw
    array (see ImageFolderSource._load) is bit-exact."""
    from PIL import Image
    h, w = hr.shape[:2]
    img = Image.fromarray(
        (np.clip(hr, 0, 1) * 255.0 + 0.5).astype(np.uint8))
    lr = img.resize((w // scale, h // scale), Image.BICUBIC)
    return np.asarray(lr)


def bicubic_downscale(hr: np.ndarray, scale: int) -> np.ndarray:
    return _to_float(bicubic_downscale_raw(hr, scale))


class Source:
    """Interface: len() items; get(i) -> (lr, hr|None, name)."""

    def __len__(self) -> int:
        raise NotImplementedError

    def get(self, index: int):
        raise NotImplementedError


class _CachedSource(Source):
    def __init__(self, cache: bool = False):
        self._cache_enabled = cache
        self._cache: dict[int, tuple] = {}

    def get(self, index: int):
        if self._cache_enabled and index in self._cache:
            return self._cache[index]
        item = self._load(index)
        if self._cache_enabled:
            self._cache[index] = item
        return item

    def _load(self, index: int):
        raise NotImplementedError


class ImageFolderSource(_CachedSource):
    def __init__(self, hr_dir=None, lr_dir=None, scale_factor: int = 4,
                 mode: str = 'train', cache: bool = False,
                 extensions=IMG_EXTENSIONS):
        super().__init__(cache)
        assert hr_dir is not None or mode == 'predict'
        assert lr_dir is not None or mode != 'predict'
        self._scale = scale_factor
        self._mode = mode

        def list_dir(d):
            if d is None:
                return None
            files = [f for f in Path(d).glob('*')
                     if f.suffix.lower() in extensions]
            return sorted(files)

        self._hr_files = list_dir(hr_dir)
        self._lr_files = list_dir(lr_dir)
        if mode == 'predict' and not self._lr_files:
            # a silent zero-image predict looks like success — fail loudly
            raise FileNotFoundError(
                f'predict dataset has no images in {lr_dir} '
                f'(extensions: {sorted(extensions)})')
        if self._hr_files is not None and self._lr_files is not None:
            assert len(self._hr_files) == len(self._lr_files), \
                f'LR/HR count mismatch: {len(self._lr_files)} vs ' \
                f'{len(self._hr_files)}'

    def __len__(self):
        files = self._hr_files if self._hr_files is not None \
            else self._lr_files
        if files is None:
            raise RuntimeError('No data available')
        return len(files)

    def _load(self, index):
        if self._mode == 'predict':
            path = self._lr_files[index]
            return _load_image(path), None, path.stem
        path = self._hr_files[index]
        hr = _load_image(path)
        if self._lr_files is not None:
            lr = _load_image(self._lr_files[index])
        else:
            # synthesized LR is cached too (keyed by the HR file + scale):
            # the full-size PIL bicubic dominated the warm-cache first
            # epoch (~measured, PERF.md round 5); the cached uint8 LR is
            # bit-exact with the PIL output
            cache = _decode_cache_path(path, f'-x{self._scale}lr')
            raw = _cache_load(cache)
            if raw is None:
                raw = bicubic_downscale_raw(hr, self._scale)
                _cache_store(cache, raw)
            lr = _to_float(raw)
        return lr, hr, path.stem


def _load_npy(path) -> np.ndarray:
    arr = np.load(path)
    if not isinstance(arr, np.ndarray):  # .npz archive: first array
        arr = arr[list(arr.files)[0]]
    return _to_float(arr)


class NpySource(_CachedSource):
    def __init__(self, hr_dir=None, lr_dir=None, scale_factor: int = 4,
                 mode: str = 'train', cache: bool = False,
                 extensions={'.npy', '.npz'}):
        super().__init__(cache)
        assert hr_dir is not None or mode == 'predict'
        self._scale = scale_factor
        self._mode = mode

        def list_dir(d):
            if d is None:
                return None
            return sorted(f for f in Path(d).glob('*')
                          if f.suffix.lower() in extensions)

        self._hr_files = list_dir(hr_dir)
        self._lr_files = list_dir(lr_dir)

    def __len__(self):
        files = self._hr_files if self._hr_files is not None \
            else self._lr_files
        if files is None:
            raise RuntimeError('No data available')
        return len(files)

    def _load(self, index):
        if self._mode == 'predict':
            path = self._lr_files[index]
            return _load_npy(path), None, path.stem
        path = self._hr_files[index]
        hr = _load_npy(path)
        if self._lr_files is not None:
            lr = _load_npy(self._lr_files[index])
        else:
            lr = bicubic_downscale(hr, self._scale)
        return lr, hr, path.stem


class HuggingFaceSource(_CachedSource):
    """eugenesiow/* datasets expose 'lr'/'hr' file-path columns
    (reference srdata.py:346-349)."""

    def __init__(self, name: str, scale_factor: int = 4,
                 split: str = 'train', cache: bool = False):
        super().__init__(cache)
        from datasets import load_dataset
        self._dataset = load_dataset(name, f'bicubic_x{scale_factor}',
                                     split=split)

    def __len__(self):
        return len(self._dataset)

    def _load(self, index):
        item = self._dataset[index]
        lr = _load_image(item['lr'])
        hr = _load_image(item['hr'])
        return lr, hr, Path(item['hr']).stem


class ConcatSource(Source):
    """Concatenation of sources (reference ConcatDataset, srdata.py:463)."""

    def __init__(self, sources: list[Source]):
        self._sources = sources
        self._offsets = np.cumsum([0] + [len(s) for s in sources])

    def __len__(self):
        return int(self._offsets[-1])

    def get(self, index):
        src = int(np.searchsorted(self._offsets, index, side='right')) - 1
        return self._sources[src].get(index - int(self._offsets[src]))
