"""Data pipeline: sources, host-side sampling, device-prefetched loaders."""

from .datamodule import SRData
from .pipeline import (Batch, EvalLoader, TrainLoader, augment_pair,
                       pad_to_bucket, random_patch, reconcile_eval_pair)
from .sources import (HF_DATASET_NAMES, ConcatSource, HuggingFaceSource,
                      ImageFolderSource, NpySource, bicubic_downscale)

__all__ = [
    'Batch', 'ConcatSource', 'EvalLoader', 'HF_DATASET_NAMES',
    'HuggingFaceSource', 'ImageFolderSource', 'NpySource', 'SRData',
    'TrainLoader', 'augment_pair', 'bicubic_downscale', 'pad_to_bucket',
    'random_patch', 'reconcile_eval_pair',
]
