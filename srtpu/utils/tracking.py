"""Pluggable experiment trackers.

Capability parity with the reference's experiment tracking (SURVEY.md §5):
Comet logs code/config/param counts/histograms/images/model binaries and
uploads last.ckpt + run.log after fit (reference main.py:33-84,
srmodel.py:203-210,324-331, train.py:157-214,240-257); TensorBoard logs
scalars/images. Here the Trainer talks to ONE ``MultiTracker`` fan-out:

* TensorBoard (tensorboardX) — always attempted;
* JSONL — always on: every scalar dict appends one line to
  ``metrics.jsonl`` and hyperparameters land in ``params.json`` so runs
  are machine-readable without any tracker service;
* Comet — attached automatically when ``comet_ml`` is importable AND
  ``COMET_API_KEY`` is set (optional dependency, like the reference's
  ``logger: comet`` switch, train.py:157-189).

``asset()`` records run artifacts (checkpoint dir, run.log) — the JSONL
backend writes their paths to ``assets.json``; Comet uploads them.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path

import numpy as np

from .logging import TBLogger

_logger = logging.getLogger(__name__)


class JsonlTracker:
    """Always-on machine-readable export: metrics.jsonl + params.json +
    assets.json in the run root."""

    def __init__(self, root: str | Path):
        self._root = Path(root)
        self._root.mkdir(parents=True, exist_ok=True)
        self._fh = open(self._root / 'metrics.jsonl', 'a', buffering=1)
        self._assets: list[str] = []

    def params(self, params: dict) -> None:
        (self._root / 'params.json').write_text(
            json.dumps(params, indent=2, default=str))

    def scalars(self, values: dict, step: int) -> None:
        rec = {'step': int(step), 'time': time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._fh.write(json.dumps(rec) + '\n')

    def image(self, tag: str, img, step: int) -> None:
        pass  # images already land on disk via save_image

    def asset(self, path: str | Path) -> None:
        self._assets.append(str(path))
        (self._root / 'assets.json').write_text(
            json.dumps(self._assets, indent=2))

    def flush(self) -> None:
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class CometTracker:
    """Optional Comet backend (reference main.py:45-84). Constructed only
    when comet_ml imports and COMET_API_KEY is set."""

    def __init__(self, project: str | None = None):
        import comet_ml
        self._exp = comet_ml.Experiment(
            project_name=project or os.environ.get('COMET_PROJECT_NAME'))

    def params(self, params: dict) -> None:
        self._exp.log_parameters(params)

    def scalars(self, values: dict, step: int) -> None:
        self._exp.log_metrics({k: float(v) for k, v in values.items()},
                              step=step)

    def image(self, tag: str, img, step: int) -> None:
        self._exp.log_image(np.asarray(img), name=tag, step=step)

    def asset(self, path: str | Path) -> None:
        p = Path(path)
        if p.is_dir():
            self._exp.log_asset_folder(str(p))
        elif p.exists():
            self._exp.log_asset(str(p))

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self._exp.end()


class MultiTracker:
    """Fan-out facade the Trainer logs through. Never raises: a tracker
    backend failure must not kill training."""

    def __init__(self, root: str | Path, tb_dir: str | Path | None):
        self.tb = TBLogger(tb_dir)
        self._closed = False
        self._backends = [self.tb, JsonlTracker(root)]
        if os.environ.get('COMET_API_KEY'):
            try:
                self._backends.append(CometTracker())
                _logger.info('Comet tracking enabled')
            except Exception:
                _logger.warning('comet_ml unavailable or misconfigured; '
                                'Comet tracking disabled', exc_info=True)

    # TBLogger internals used by weight-histogram logging
    @property
    def _writer(self):
        return self.tb._writer

    def _fanout(self, method: str, *args) -> None:
        for b in self._backends:
            fn = getattr(b, method, None)
            if fn is None:
                continue
            try:
                fn(*args)
            except Exception:
                _logger.warning('tracker %s.%s failed',
                                type(b).__name__, method, exc_info=True)

    def params(self, params: dict) -> None:
        self._fanout('params', params)

    def scalars(self, values: dict, step: int) -> None:
        self._fanout('scalars', values, step)

    def image(self, tag: str, img, step: int) -> None:
        self._fanout('image', tag, img, step)

    def asset(self, path) -> None:
        self._fanout('asset', path)

    def flush(self) -> None:
        self._fanout('flush')

    def close(self) -> None:
        """Idempotent: ends the Comet experiment and closes the JSONL
        handle; the Trainer calls this when its work is done."""
        if self._closed:
            return
        self._closed = True
        self._fanout('close')
