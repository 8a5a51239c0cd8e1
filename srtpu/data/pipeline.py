"""Host-side data pipeline: patch sampling, augmentation, batching,
double-buffered device prefetch, per-host sharding.

Capability parity with the reference's item path (srdata.py:57-169):
aligned random LR/HR patch crops (LR coords x scale -> HR coords), 8-way
augmentation (rot {0,90,180,270} + hflip + vflip), eval center-crop to a
multiple of scale, LR/HR size reconciliation.

TPU-native design:
* training batches have ONE static shape (batch, patch/scale, patch/scale, C)
  so the train step compiles once;
* eval images are padded up to shape buckets (multiples of ``bucket``) with a
  validity mask so XLA compiles a handful of shapes instead of one per image
  (SURVEY.md §7 hard part 1), and metrics are computed masked;
* a background thread overlaps decode/augment with device compute and
  transfers batches with an explicit sharding (data-parallel layouts ride
  this path — reference delegates this to DDP samplers, srdata.py:427,
  all.yml:127).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import jax
import numpy as np

from .sources import Source


@dataclass
class Batch:
    lr: np.ndarray
    hr: np.ndarray | None
    mask: np.ndarray | None = None   # NHW1 validity of HR/SR pixels
    names: tuple[str, ...] = ()
    hr_size: tuple[int, int] | None = None  # original (unpadded) HR size


def random_patch(lr: np.ndarray, hr: np.ndarray, patch_size: int, scale: int,
                 rng: np.random.Generator):
    """Aligned random crop (reference srdata.py:137-169 semantics)."""
    assert patch_size % scale == 0, \
        f'patch size ({patch_size}) must be divisible by scale ({scale})'
    lp = patch_size // scale
    lh, lw = lr.shape[:2]
    x = rng.integers(0, lh - lp + 1)
    y = rng.integers(0, lw - lp + 1)
    lr_patch = lr[x:x + lp, y:y + lp]
    hr_patch = hr[scale * x:scale * x + patch_size,
                  scale * y:scale * y + patch_size]
    return lr_patch, hr_patch


def augment_pair(lr: np.ndarray, hr: np.ndarray, rng: np.random.Generator):
    """rot90 k in {0..3} + hflip + vflip (reference srdata.py:77-91)."""
    k = int(rng.integers(0, 4))
    if k:
        lr, hr = np.rot90(lr, k, axes=(0, 1)), np.rot90(hr, k, axes=(0, 1))
    if rng.integers(0, 2):
        lr, hr = lr[:, ::-1], hr[:, ::-1]
    if rng.integers(0, 2):
        lr, hr = lr[::-1, :], hr[::-1, :]
    return lr, hr


def reconcile_eval_pair(lr: np.ndarray, hr: np.ndarray, scale: int):
    """Center-crop HR to a multiple of scale and LR to HR/scale
    (reference srdata.py:101-112)."""
    hh, hw = hr.shape[:2]
    th, tw = hh - hh % scale, hw - hw % scale
    if (th, tw) != (hh, hw):
        top, left = (hh - th) // 2, (hw - tw) // 2
        hr = hr[top:top + th, left:left + tw]
    lh, lw = lr.shape[:2]
    tlh, tlw = th // scale, tw // scale
    if (lh, lw) != (tlh, tlw):
        top, left = max((lh - tlh) // 2, 0), max((lw - tlw) // 2, 0)
        lr = lr[top:top + tlh, left:left + tlw]
    return lr, hr


def center_crop(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """torchvision TF.center_crop semantics (reference srdata.py:97-99):
    zero-pads symmetrically when the image is smaller than the crop, so
    small eval images yield aligned patch_size crops instead of silently
    misaligned negative-index slices."""
    h, w = img.shape[:2]
    if h < th or w < tw:
        pt = max((th - h) // 2, 0)
        pb = max(th - h - pt, 0)
        pl = max((tw - w) // 2, 0)
        pr = max(tw - w - pl, 0)
        img = np.pad(img, ((pt, pb), (pl, pr), (0, 0)))
        h, w = img.shape[:2]
    top, left = (h - th) // 2, (w - tw) // 2
    return img[top:top + th, left:left + tw]


def pad_to_bucket(img: np.ndarray, bucket: int):
    """Pad H/W up to the next multiple of ``bucket`` (edge padding keeps
    conv statistics sane at the seam). Returns (padded, (h, w))."""
    h, w = img.shape[:2]
    ph = (h + bucket - 1) // bucket * bucket
    pw = (w + bucket - 1) // bucket * bucket
    if (ph, pw) == (h, w):
        return img, (h, w)
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode='edge')
    return padded, (h, w)


class TrainLoader:
    """Shuffled epoch iterator with static batch shape and device prefetch."""

    def __init__(self, source: Source, batch_size: int, patch_size: int,
                 scale_factor: int, augment: bool = True, seed: int = 0,
                 sharding=None, prefetch: int = 2,
                 drop_remainder: bool = True,
                 process_index: int | None = None,
                 process_count: int | None = None,
                 num_workers: int = 0):
        self._source = source
        self._batch = batch_size
        self._patch = patch_size
        self._scale = scale_factor
        self._augment = augment
        self._seed = seed
        self._sharding = sharding
        self._prefetch = prefetch
        self._drop = drop_remainder
        self._epoch = 0
        # item-level thread pool inside the producer: decode + the native
        # crop/augment call both release the GIL, so N workers scale the
        # pipeline on multi-core TPU-VM hosts. 0 = auto (cpu_count // 2,
        # the reference's torch DataLoader default, srdata.py:516 — but as
        # a knob, which the reference lacks); 1 = sequential.
        if num_workers == 0:
            import os
            num_workers = max(1, (os.cpu_count() or 2) // 2)
        self._workers = num_workers
        self._pool = None
        self._pool_lock = threading.Lock()
        # per-host sharding: every process sees the SAME shuffled order
        # (seeded identically) and takes an interleaved slice — the
        # TPU-native replacement for Lightning's DistributedSampler
        # (reference all.yml:127 use_distributed_sampler)
        self._pidx = process_index if process_index is not None \
            else jax.process_index()
        self._pcount = process_count if process_count is not None \
            else jax.process_count()

    def __len__(self):
        n = len(self._source) // self._pcount
        return n // self._batch if self._drop else \
            (n + self._batch - 1) // self._batch

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def peek(self) -> Batch:
        """One host-side batch for shape/dtype inspection — no prefetch
        thread, no device transfer (iterating instead would leak a producer
        thread holding prefetched, possibly device-resident batches)."""
        rng = np.random.default_rng((self._seed, 2 ** 31))
        n = len(self._source)
        idx = np.resize(np.arange(min(self._batch, n)), self._batch)
        return self._make_batch(idx, rng)

    def _run_items(self, fn, n: int):
        """Run ``fn(slot)`` for every batch slot — sequentially, or on the
        item thread pool (decode + the native crop call release the GIL,
        so workers scale on multi-core hosts)."""
        if self._workers <= 1 or n <= 1:
            for s in range(n):
                fn(s)
            return
        with self._pool_lock:   # two live producers must share one pool
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(
                    max_workers=self._workers,
                    thread_name_prefix='srtpu-data')
        list(self._pool.map(fn, range(n)))   # list() propagates exceptions

    def _fetch_items(self, indices):
        """source.get for every batch slot (threaded when workers > 1):
        decoded/cached float32 images + names, contiguous."""
        n = len(indices)
        lrs, hrs, names = [None] * n, [None] * n, [None] * n

        def fetch(slot):
            lr, hr, name = self._source.get(int(indices[slot]))
            if hr is None:
                raise ValueError(f'No HR image for {name}')
            lrs[slot] = np.ascontiguousarray(lr, np.float32)
            hrs[slot] = np.ascontiguousarray(hr, np.float32)
            names[slot] = name

        self._run_items(fetch, n)
        return lrs, hrs, names

    def _draw_params(self, rng, lrs):
        """Vectorized per-batch crop/augment draws from ONE stream —
        shared by the numpy and native paths so they stay bit-identical,
        and independent of the worker count by construction."""
        n = len(lrs)
        lp = self._patch // self._scale
        lhs = np.array([a.shape[0] for a in lrs])
        lws = np.array([a.shape[1] for a in lrs])
        ys = rng.integers(0, lhs - lp + 1).astype(np.int32)
        xs = rng.integers(0, lws - lp + 1).astype(np.int32)
        if self._augment:
            rots = rng.integers(0, 4, n).astype(np.int32)
            hfs = rng.integers(0, 2, n).astype(np.int32)
            vfs = rng.integers(0, 2, n).astype(np.int32)
        else:
            rots = hfs = vfs = np.zeros(n, np.int32)
        return ys, xs, rots, hfs, vfs

    def _make_batch(self, indices, rng) -> Batch:
        from . import native
        if native.available():
            return self._make_batch_native(indices, rng)
        n = len(indices)
        lp = self._patch // self._scale
        s = self._scale
        lrs, hrs, names = self._fetch_items(indices)
        ys, xs, rots, hfs, vfs = self._draw_params(rng, lrs)
        out_lr = np.empty((n, lp, lp, 3), np.float32)
        out_hr = np.empty((n, self._patch, self._patch, 3), np.float32)
        for j in range(n):
            y, x = int(ys[j]), int(xs[j])
            lr_p = lrs[j][y:y + lp, x:x + lp]
            hr_p = hrs[j][y * s:(y + lp) * s, x * s:(x + lp) * s]
            if rots[j]:
                lr_p = np.rot90(lr_p, rots[j])
                hr_p = np.rot90(hr_p, rots[j])
            if hfs[j]:
                lr_p, hr_p = lr_p[:, ::-1], hr_p[:, ::-1]
            if vfs[j]:
                lr_p, hr_p = lr_p[::-1], hr_p[::-1]
            out_lr[j] = lr_p
            out_hr[j] = hr_p
        return Batch(lr=out_lr, hr=out_hr, names=tuple(names))

    def _make_batch_native(self, indices, rng) -> Batch:
        """Native fast path: the whole batch's fused crop+augment+batch
        placement in ONE C++ call (native/patchops.cc) — per-item ctypes
        dispatch (~80 us/call) capped the loader at ~6k patches/s, below
        the device training rate. Draws the SAME random stream as the
        numpy path so both are interchangeable."""
        from . import native
        n = len(indices)
        lp = self._patch // self._scale
        out_lr = np.empty((n, lp, lp, 3), np.float32)
        out_hr = np.empty((n, self._patch, self._patch, 3), np.float32)
        lrs, hrs, names = self._fetch_items(indices)
        ys, xs, rots, hfs, vfs = self._draw_params(rng, lrs)
        native.extract_patch_batch(
            lrs, hrs, self._patch, self._scale, ys, xs, rots, hfs, vfs,
            out_lr, out_hr, nthreads=self._workers)
        return Batch(lr=out_lr, hr=out_hr, names=tuple(names))

    def __iter__(self):
        rng = np.random.default_rng((self._seed, self._epoch))
        order = rng.permutation(len(self._source))
        if self._pcount > 1:
            order = order[self._pidx::self._pcount]
            # decorrelate augmentation randomness across hosts
            rng = np.random.default_rng((self._seed, self._epoch,
                                         self._pidx))
        n_batches = len(self)
        if n_batches == 0:
            return

        # consumers may abandon the iterator mid-epoch (overfit_batches /
        # fast_dev_run / limit_train_batches break out of the batch loop);
        # without a stop signal the producer would stay blocked on q.put
        # forever, leaking a thread + ``prefetch`` (possibly device-
        # resident) batches EVERY epoch
        stop = threading.Event()

        def put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer(q):
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * self._batch:(b + 1) * self._batch]
                    if len(idx) < self._batch:
                        if self._drop:
                            break
                        idx = np.concatenate(
                            [idx, order[:self._batch - len(idx)]])
                    batch = self._make_batch(idx, rng)
                    lr, hr = batch.lr, batch.hr
                    if self._sharding is not None:
                        from srtpu.parallel import put_local_batch
                        lr = put_local_batch(lr, self._sharding)
                        hr = put_local_batch(hr, self._sharding)
                    if not put(q, Batch(lr=lr, hr=hr, names=batch.names)):
                        return
            except BaseException as e:  # surface worker errors to consumer
                put(q, e)
            finally:
                put(q, None)

        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        thread = threading.Thread(target=producer, args=(q,), daemon=True,
                                  name='srtpu-train-producer')
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while True:         # drain so a blocked producer wakes and exits
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            self._epoch += 1


class EvalLoader:
    """Per-image loader (batch 1) with shape bucketing + validity masks."""

    def __init__(self, source: Source, scale_factor: int, bucket: int = 32,
                 patch_size: int = 0, mode: str = 'eval'):
        self._source = source
        self._scale = scale_factor
        self._bucket = max(bucket, 1)
        self._patch = patch_size
        self._mode = mode

    def __len__(self):
        return len(self._source)

    def __iter__(self):
        for i in range(len(self._source)):
            lr, hr, name = self._source.get(i)
            if self._mode == 'predict':
                if self._patch > 0:
                    # reference test/predict mode crops LR to patch_size
                    # (srdata.py:116-117)
                    lr = center_crop(lr, self._patch, self._patch)
                lr_p, (h, w) = pad_to_bucket(lr, self._bucket)
                yield Batch(lr=lr_p[None], hr=None,
                            mask=None, names=(name,),
                            hr_size=(h * self._scale, w * self._scale))
                continue

            if hr is None:
                raise ValueError(f'No HR image for {name}')
            if self._patch > 0:
                # center-crop eval patches (reference srdata.py:97-99);
                # zero-pads images smaller than the patch like TF.center_crop
                hr = center_crop(hr, self._patch, self._patch)
                lp = self._patch // self._scale
                lr = center_crop(lr, lp, lp)
            else:
                lr, hr = reconcile_eval_pair(lr, hr, self._scale)

            lr_p, (h, w) = pad_to_bucket(lr, self._bucket)
            hr_p, _ = pad_to_bucket(hr, self._bucket * self._scale)
            hs, ws = h * self._scale, w * self._scale
            mask = np.zeros(hr_p.shape[:2] + (1,), np.float32)
            mask[:hs, :ws] = 1.0
            yield Batch(lr=lr_p[None], hr=hr_p[None], mask=mask[None],
                        names=(name,), hr_size=(hs, ws))
