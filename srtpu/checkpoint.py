"""Checkpointing: Orbax-backed top-k retention on a monitored metric + last.

Capability parity with the reference's ModelCheckpoint wiring
(reference train.py:217-226, configs/all.yml:69-79): monitor a
``{dataset}/{metric}`` key, mode max (or min for lower-is-better metrics),
save_top_k=3, save_last=True, cadence tied to the validation interval;
hyperparameters snapshot saved alongside so checkpoints are self-describing
(save_hyperparameters + load_from_checkpoint, srmodel.py:102,
predict.py:80).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

_logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str | Path, monitor: str = 'PSNR',
                 mode: str = 'max', save_top_k: int = 3,
                 save_last: bool = True, hparams: dict[str, Any] | None = None):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._monitor = monitor or ''
        monitor = self._monitor
        self._mode = mode
        self._save_last = save_last
        safe_key = monitor.replace('/', '__')
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k if save_top_k > 0 else None,
            best_fn=(lambda m: m[safe_key]) if save_top_k > 0 else None,
            best_mode=mode,
            enable_async_checkpointing=False,
        )
        self._safe_key = safe_key
        self._mngr = ocp.CheckpointManager(self._dir / 'top', options=options)
        self._last = ocp.PyTreeCheckpointer()
        if hparams is not None:
            (self._dir / 'hparams.json').write_text(
                json.dumps(hparams, indent=2, default=str))

    @property
    def monitor(self) -> str:
        return self._monitor

    def save(self, step: int, state, metrics: dict[str, float]) -> None:
        tree = _state_to_tree(state)
        if self._monitor in metrics:
            self._mngr.save(
                step, args=ocp.args.PyTreeSave(tree),
                metrics={self._safe_key: float(metrics[self._monitor])})
            self._mngr.wait_until_finished()
        if self._save_last:
            path = self._dir / 'last'
            if path.exists():
                import shutil
                shutil.rmtree(path)
            self._last.save(path, tree)

    def best_step(self):
        return self._mngr.best_step()

    def restore(self, state, step: int | None = None):
        """Restore into ``state``. With no explicit step: the best step by
        the monitored metric when available (load_from_checkpoint
        semantics), else the latest.

        Restores WITH ``state`` as the template so Orbax maps leaves into
        the live pytree structure (NamedTuple optimizer states included).
        A template-free read followed by order-based ``tree_unflatten`` is
        wrong: Orbax re-flattens dicts alphabetically, which silently
        permutes NamedTuple fields whose names aren't alphabetical (e.g.
        LookaheadState(inner, slow, count) — 'count' sorts first).
        Falls back to a template-free read + lenient adaptation when the
        stored structure genuinely differs (e.g. a GAN checkpoint restored
        for eval keeps a fresh optimizer)."""
        if step is None and self._monitor:
            try:
                step = self._mngr.best_step()
            except KeyError:
                # saved metrics were keyed by a different monitor
                step = None
        if step is None:
            step = self._mngr.latest_step()
        template = _state_to_tree(state)
        if step is not None:
            try:
                restored = self._mngr.restore(
                    step, args=ocp.args.PyTreeRestore(item=template))
            except Exception:
                restored = self._mngr.restore(step)
        else:
            restored = self._restore_last_tree(template)
        return _tree_to_state(state, restored)

    def restore_last(self, state):
        restored = self._restore_last_tree(_state_to_tree(state))
        return _tree_to_state(state, restored)

    def _restore_last_tree(self, template):
        path = self._dir / 'last'
        try:
            return self._last.restore(path, item=template)
        except Exception:
            return self._last.restore(path)

    def close(self):
        self._mngr.close()


def _state_to_tree(state) -> dict:
    return {
        'step': np.asarray(state.step),
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats),
        'loss_params': jax.device_get(state.loss_params),
        'opt_state': jax.device_get(state.opt_state),
    }


def _param_paths(tree) -> set:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path) for path, _ in flat}


def _tree_to_state(state, tree: dict):
    import jax.numpy as jnp
    live, stored = _param_paths(state.params), _param_paths(tree['params'])
    if live != stored:
        # the opaque failure mode this catches: a checkpoint trained with
        # use_pallas=False (per-block HWIO trees) restored into a
        # default-constructed CS model (stacked CS-arranged weights), or
        # vice versa — the param trees differ and downstream apply()
        # errors are unreadable. Name the fix instead.
        missing = sorted(live - stored)[:3]
        extra = sorted(stored - live)[:3]
        raise ValueError(
            'checkpoint parameter tree does not match the model\'s '
            f'(checkpoint lacks e.g. {missing}, has e.g. {extra}). '
            'Most likely the checkpoint was trained with a different '
            'use_pallas setting than this model (the CS kernel path '
            "stores stacked CS-arranged weights; use_pallas defaults to "
            "'cs' on EDSR/SRResNet/RCAN/RDN/DDBPN since round 4). "
            'Convert it with tools/convert_ckpt_layout.py, or construct '
            'the model with the checkpoint\'s original use_pallas value.')
    if (jax.tree_util.tree_structure(tree['opt_state'])
            == jax.tree_util.tree_structure(state.opt_state)):
        # template restore preserved the live structure (incl. NamedTuple
        # field order) — safe to adopt wholesale
        opt_state = tree['opt_state']
    else:
        # optimizer structure changed (e.g. restoring a GAN checkpoint with
        # two optimizers into a fresh single-optimizer state for eval/
        # predict, or a template-free fallback read that yielded plain
        # dicts): keep the fresh optimizer state — params are what matter.
        # NEVER order-based tree_unflatten here: Orbax re-flattens dicts
        # alphabetically, silently permuting NamedTuple optimizer fields.
        _logger.warning('optimizer state structure mismatch on restore; '
                        'keeping freshly initialized optimizer state')
        opt_state = state.opt_state
    return state.replace(
        step=jnp.asarray(tree['step']),
        params=tree['params'],
        batch_stats=tree['batch_stats'],
        loss_params=tree['loss_params'],
        opt_state=opt_state)


def load_hparams(directory: str | Path) -> dict[str, Any]:
    path = Path(directory) / 'hparams.json'
    if not path.exists():
        # allow pointing directly at .../checkpoints/top or a step dir
        for parent in Path(directory).parents:
            cand = parent / 'hparams.json'
            if cand.exists():
                path = cand
                break
    return json.loads(path.read_text())
