"""Loss library: registry + composite-loss DSL.

Capability parity with the reference's loss system:
* registry of 12 loss names (reference models/srmodel.py:30-44);
* composite DSL ``"0.5 * l1 + 0.5 * adaptive"`` (srmodel.py:435-501);
* per-loss dispatch rules — clamp for haarpsi/pieapp, residual-based
  adaptive with trainable parameters, mean-reduced lpips
  (srmodel.py:519-565);
* trainable loss parameters are exposed via ``init_params`` and joined into
  the optimizer by the TrainState (srmodel.py:145-154).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .adaptive import AdaptiveLoss
from .basic import l1_loss, l2_loss, psnr_gray, tv_loss
from .edge import edge_loss, extract_edges
from .flip import flip, flip_loss
from .gan import gan_loss
from .haarpsi import haarpsi, haarpsi_loss
from .pencil_sketch import pencil_sketch, pencil_sketch_loss
from .vgg import DISTS, LPIPS, VGGLoss

_logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SubLoss:
    name: str
    weight: float
    fn: Any            # callable(sr, hr) or callable(sr, hr, params)
    trainable: bool = False
    clamp_sr: bool = False

    def init_params(self, rng):
        if self.trainable and hasattr(self.fn, 'init'):
            return self.fn.init(rng)
        return None


def _loss_factories(patch_size: int = 128) -> dict[str, Callable[[], Any]]:
    from .pieapp import PieAPP
    return {
        'adaptive': lambda: AdaptiveLoss(num_levels=2),
        'dists': DISTS,
        'edge_loss': lambda: edge_loss,
        'flip': lambda: flip_loss,
        'haarpsi': lambda: haarpsi_loss,
        'l1': lambda: l1_loss,
        'l2': lambda: l2_loss,
        'lpips': LPIPS,
        'mae': lambda: l1_loss,
        'mse': lambda: l2_loss,
        'pencil_sketch': lambda: pencil_sketch_loss,
        'pieapp': PieAPP,
    }


def supported_losses() -> list[str]:
    return sorted(_loss_factories())


class CompositeLoss:
    """Weighted sum of named sub-losses with reference dispatch semantics."""

    def __init__(self, sub_losses: list[SubLoss]):
        self.sub_losses = sub_losses

    @property
    def names(self) -> list[str]:
        return [s.name for s in self.sub_losses]

    @property
    def has_trainable(self) -> bool:
        return any(s.trainable for s in self.sub_losses)

    def init_params(self, rng: jax.Array) -> dict[str, Any]:
        params = {}
        for i, s in enumerate(self.sub_losses):
            p = s.init_params(jax.random.fold_in(rng, i))
            if p is not None:
                params[f'{i}_{s.name}'] = p
        return params

    def __call__(self, sr: jax.Array, hr: jax.Array,
                 loss_params: dict[str, Any] | None = None
                 ) -> tuple[jax.Array, dict[str, jax.Array]]:
        loss_params = loss_params or {}
        total = 0.0
        per_loss: dict[str, jax.Array] = {}
        name_counts: dict[str, int] = {}
        for s in self.sub_losses:
            name_counts[s.name] = name_counts.get(s.name, 0) + 1
        for i, s in enumerate(self.sub_losses):
            x = jnp.clip(sr, 0.0, 1.0) if s.clamp_sr else sr
            key = f'{i}_{s.name}'
            if s.trainable:
                value = s.fn(x, hr, loss_params.get(key))
            else:
                value = s.fn(x, hr)
            weighted = s.weight * value
            # log key: bare name normally; index-qualified when the DSL
            # repeats a loss type (e.g. '0.3 * l1 + 0.7 * l1') so one term
            # doesn't silently overwrite the other in the logs
            log_key = s.name if name_counts[s.name] == 1 else key
            per_loss[log_key] = weighted
            total = total + weighted
        return total, per_loss


def parse_losses(losses_str: str, patch_size: int = 128) -> CompositeLoss:
    """Parse ``"w1 * name1 + w2 * name2"`` (srmodel.py:435-501 semantics)."""
    factories = _loss_factories(patch_size)
    subs = []
    for term in losses_str.split('+'):
        parts = term.split('*')
        if len(parts) > 2:
            raise ValueError(
                f'malformed loss term {term.strip()!r}: expected '
                f'"weight * name" or "name"')
        if len(parts) == 2:
            weight_str, loss_type = parts
            try:
                weight = float(weight_str)
            except ValueError:
                raise ValueError(
                    f'{weight_str!r} is not a valid number to be used as '
                    f'weight for loss function {loss_type.strip()}')
        else:
            weight, loss_type = 1.0, parts[0]

        loss_type = loss_type.strip().lower()
        if loss_type not in factories:
            raise AttributeError(
                f"Couldn't find loss {loss_type}. Supported losses: "
                f"{', '.join(supported_losses())}")

        fn = factories[loss_type]()
        _logger.info('%.3f * %s', weight, loss_type)
        subs.append(SubLoss(
            name=loss_type, weight=weight, fn=fn,
            trainable=getattr(fn, 'trainable', False),
            clamp_sr=loss_type in ('haarpsi', 'pieapp')))
    return CompositeLoss(subs)


__all__ = [
    'AdaptiveLoss', 'CompositeLoss', 'DISTS', 'LPIPS', 'SubLoss', 'VGGLoss',
    'edge_loss', 'extract_edges', 'flip', 'flip_loss', 'gan_loss', 'haarpsi',
    'haarpsi_loss', 'l1_loss', 'l2_loss', 'parse_losses', 'pencil_sketch',
    'pencil_sketch_loss', 'psnr_gray', 'supported_losses', 'tv_loss',
]
