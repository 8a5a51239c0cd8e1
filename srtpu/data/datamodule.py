"""SRData — dataset resolution, preparation and loader construction.

Capability parity with the reference datamodule (reference srdata.py:357-532):
* name resolution: DIV2K/B100/Set5/Set14/Urban100 map to eugenesiow/* hub
  datasets (srdata.py:392-417); anything else must exist as
  ``datasets_dir/<name>/HR`` (LR optional at ``LR/X{scale}``, synthesized
  bicubically otherwise);
* .npy dirs are detected and routed to NpySource (srdata.py:442-445);
* ``prepare`` performs the download-once step (process-0 only in multi-host,
  srdata.py:387-389); ``setup`` builds per-process sources (srdata.py:425);
* train loader: shuffled, batch_size, augment; eval/predict loaders:
  one image at a time (srdata.py:514-532) — here bucketed+masked for XLA.
"""

from __future__ import annotations

import logging
from pathlib import Path

from srtpu.utils.logging import PRINT

from .pipeline import EvalLoader, TrainLoader
from .sources import (HF_DATASET_NAMES, ConcatSource, HuggingFaceSource,
                      ImageFolderSource, NpySource)

_logger = logging.getLogger(__name__)


class SRData:
    def __init__(self,
                 augment: bool = True,
                 batch_size: int = 1,
                 datasets_dir: str = 'datasets',
                 eval_datasets: list[str] = ('DIV2K', 'Set5', 'Set14',
                                             'B100', 'Urban100'),
                 patch_size: int = 128,
                 predict_datasets: list[str] = (),
                 scale_factor: int = 4,
                 train_datasets: list[str] = ('DIV2K',),
                 eval_bucket: int = 32,
                 seed: int = 0,
                 prefetch: int = 2,
                 cache_train_images: bool = True,
                 num_workers: int = 0):
        self._augment = augment
        self._batch_size = batch_size
        self._datasets_dir = Path(datasets_dir)
        self._eval_names = list(eval_datasets)
        self._patch_size = patch_size
        self._predict_names = list(predict_datasets)
        self._scale = scale_factor
        self._train_names = list(train_datasets)
        self._eval_bucket = eval_bucket
        self._seed = seed
        self._prefetch = prefetch
        # item-level loader threads; 0 = auto (cpu_count // 2 — the
        # reference's torch DataLoader sizing, srdata.py:516, as a knob)
        self._num_workers = num_workers
        # decoded-image RAM cache for training sources: each image is
        # re-sampled every epoch, and on TPU-VM hosts with few cores the
        # PNG decode would otherwise bound the input pipeline (the
        # reference leans on torch DataLoader worker pools instead,
        # srdata.py:516)
        self._cache_train = cache_train_images
        self._train_source = None
        self._eval_sources = None
        self._predict_sources = None

    # -- name resolution ----------------------------------------------------

    def _is_hub_name(self, name: str) -> bool:
        return name in HF_DATASET_NAMES or name.startswith('eugenesiow/')

    def _local_dirs(self, name: str):
        hr = self._datasets_dir / name / 'HR'
        lr = self._datasets_dir / name / 'LR' / f'X{self._scale}'
        return hr, (lr if lr.exists() else None)

    def prepare(self) -> None:
        """Download-once step (reference prepare_data, srdata.py:387-422)."""
        roles = ([(n, 'train') for n in self._train_names]
                 + [(n, 'validation') for n in self._eval_names])
        for name, split in roles:
            if self._is_hub_name(name):
                hub = HF_DATASET_NAMES.get(name, name)
                try:
                    from datasets import load_dataset
                    load_dataset(hub, f'bicubic_x{self._scale}', split=split)
                except Exception as e:
                    raise FileNotFoundError(
                        f'Could not fetch hub dataset {hub} ({e}). In '
                        f'offline environments place images under '
                        f'{self._datasets_dir / name / "HR"} instead.') \
                        from e
            else:
                hr, _ = self._local_dirs(name)
                if not hr.exists():
                    raise FileNotFoundError(
                        f'Could not find HR images for dataset {name} '
                        f'in {hr}.')
        for name in self._predict_names:
            if not (self._datasets_dir / name).exists():
                raise FileNotFoundError(
                    f'Could not find images for predicting dataset {name} '
                    f'in {self._datasets_dir / name}.')

    def _build_source(self, name: str, mode: str, cache: bool):
        if self._is_hub_name(name):
            hub = HF_DATASET_NAMES.get(name, name)
            split = 'train' if mode == 'train' else 'validation'
            return HuggingFaceSource(hub, self._scale, split, cache=cache)
        hr, lr = self._local_dirs(name)
        has_npy = hr.exists() and (
            any(hr.glob('*.npy')) or any(hr.glob('*.npz')))
        cls = NpySource if has_npy else ImageFolderSource
        return cls(hr_dir=hr, lr_dir=lr, scale_factor=self._scale,
                   mode=mode, cache=cache)

    def setup(self, stage: str | None = None) -> None:
        _logger.info('Setup %s', stage)
        if stage in (None, 'fit'):
            self._train_source = ConcatSource([
                self._build_source(n, 'train', cache=self._cache_train)
                for n in self._train_names])
        if stage in (None, 'fit', 'validate'):
            self._eval_sources = [
                self._build_source(n, 'eval', cache=True)
                for n in self._eval_names]
        if stage in (None, 'predict'):
            self._predict_sources = [
                ImageFolderSource(lr_dir=self._predict_dir(n),
                                  scale_factor=self._scale, mode='predict')
                for n in self._predict_names]

    def _predict_dir(self, name: str):
        """LR input dir for a predict dataset: a flat folder of images
        (reference predict.py semantics), or the eval-style
        ``<name>/LR/X{scale}`` / ``<name>/LR`` sub-layout when present."""
        base = self._datasets_dir / name
        for sub in (base / 'LR' / f'X{self._scale}', base / 'LR'):
            if sub.is_dir():
                return sub
        if (base / 'HR').is_dir():
            # last resort for eval-layout dirs with no LR set; the model
            # will upscale the HR images x{scale} — almost never what the
            # user wants, so say it loudly (reference predict.py only ever
            # reads a flat LR folder)
            _logger.log(
                PRINT,
                'predict dataset %s has no LR images (%s); falling back to '
                'the HR folder — outputs will be HR x%d UPSCALES, not '
                'super-resolved LR images', name, base / 'LR', self._scale)
            return base / 'HR'
        return base

    # -- loaders --------------------------------------------------------------

    @property
    def eval_dataset_names(self) -> list[str]:
        return list(self._eval_names)

    @property
    def predict_dataset_names(self) -> list[str]:
        return list(self._predict_names)

    def train_loader(self, sharding=None) -> TrainLoader:
        assert self._train_source is not None, 'call setup("fit") first'
        return TrainLoader(self._train_source, self._batch_size,
                           self._patch_size, self._scale,
                           augment=self._augment, seed=self._seed,
                           sharding=sharding, prefetch=self._prefetch,
                           num_workers=self._num_workers)

    def eval_loaders(self) -> list[EvalLoader]:
        assert self._eval_sources is not None, 'call setup first'
        return [EvalLoader(s, self._scale, bucket=self._eval_bucket)
                for s in self._eval_sources]

    def predict_loaders(self) -> list[EvalLoader]:
        assert self._predict_sources is not None, 'call setup("predict")'
        return [EvalLoader(s, self._scale, bucket=self._eval_bucket,
                           mode='predict')
                for s in self._predict_sources]
