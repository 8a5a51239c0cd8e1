"""Logging: python logging setup, TensorBoard writer, image dumps.

Capability parity with the reference observability layer (SURVEY.md §5):
* setup_log — dual stderr + rotating-file handlers, silencing list, custom
  PRINT level 60 (reference main.py:96-166, train.py:84-143);
* TensorBoard scalars/images via tensorboardX (reference
  TensorBoardLogger usage, srmodel.py:319-322);
* PNG image dumps of SR outputs (reference torchvision save_image,
  srmodel.py:304-315) via PIL.
"""

from __future__ import annotations

import logging
import logging.handlers
import sys
from pathlib import Path

import numpy as np

PRINT = 60  # custom level above CRITICAL (reference train.py:90-93)
logging.addLevelName(PRINT, 'PRINT')


def setup_log(log_level: str = 'warning', file_log_level: str = 'info',
              log_dir: str | Path = '.', filename: str = 'run.log',
              silence: tuple[str, ...] = ('PIL', 'jax', 'orbax',
                                          'absl')) -> logging.Logger:
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    for h in list(root.handlers):
        root.removeHandler(h)

    stream = logging.StreamHandler(sys.stderr)
    stream.setLevel(getattr(logging, log_level.upper(), logging.WARNING))
    stream.setFormatter(logging.Formatter(
        '%(asctime)s %(levelname)s %(name)s: %(message)s'))
    root.addHandler(stream)

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    fileh = logging.handlers.RotatingFileHandler(
        Path(log_dir) / filename, maxBytes=5 * 1024 * 1024, backupCount=3)
    fileh.setLevel(getattr(logging, file_log_level.upper(), logging.INFO))
    fileh.setFormatter(logging.Formatter(
        '%(asctime)s %(levelname)s %(name)s: %(message)s'))
    root.addHandler(fileh)

    for name in silence:
        logging.getLogger(name).setLevel(logging.WARNING)
    return root


def attach_run_log(log_dir: str | Path, filename: str = 'run.log',
                   file_log_level: str = 'info') -> logging.Handler:
    """Attach ONLY a rotating run.log file handler to the root logger,
    leaving any handlers/levels the embedding application configured
    untouched (unlike setup_log, which rebuilds root logging for the CLI).
    """
    root = logging.getLogger()
    # Do NOT touch the root level: raising it to INFO would make the
    # application's own handlers emit INFO from every library. Instead
    # open only the 'srtpu' subtree so the framework's records reach the
    # file handler; third-party records flow per the app's own config.
    pkg = logging.getLogger('srtpu')
    if pkg.getEffectiveLevel() > logging.INFO:
        pkg.setLevel(logging.INFO)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    fileh = logging.handlers.RotatingFileHandler(
        Path(log_dir) / filename, maxBytes=5 * 1024 * 1024, backupCount=3)
    fileh.setLevel(getattr(logging, file_log_level.upper(), logging.INFO))
    fileh.setFormatter(logging.Formatter(
        '%(asctime)s %(levelname)s %(name)s: %(message)s'))
    root.addHandler(fileh)
    return fileh


class TBLogger:
    """Thin tensorboardX wrapper; becomes a no-op if unavailable."""

    def __init__(self, log_dir: str | Path | None):
        self._writer = None
        if log_dir is None:
            return
        try:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(str(log_dir))
        except Exception:  # pragma: no cover - tensorboardX is baked in
            logging.getLogger(__name__).warning(
                'tensorboardX unavailable; TB logging disabled')

    def scalars(self, values: dict[str, float], step: int):
        if self._writer is None:
            return
        for k, v in values.items():
            self._writer.add_scalar(k, float(v), step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self._writer is None:
            return
        self._writer.add_image(tag, np.clip(img_hwc, 0, 1),
                               step, dataformats='HWC')

    def close(self):
        if self._writer is not None:
            self._writer.close()


def save_image(img_hwc: np.ndarray, path: str | Path) -> None:
    """Save a float [0,1] HWC array as PNG (torchvision save_image parity:
    multiply by 255 and round)."""
    from PIL import Image
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    arr = np.clip(np.asarray(img_hwc), 0.0, 1.0)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)
