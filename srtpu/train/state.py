"""TrainState: model params + batch stats + trainable loss params + optimizer.

Capability parity with the reference training core's parameter handling:
the optimizer runs over model parameters *and* trainable loss parameters
(adaptive loss, reference models/srmodel.py:145-154) in one update, and
batch-norm running statistics are carried alongside (SRResNet/SRGAN).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    loss_params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def trainable(self):
        return {'model': self.params, 'loss': self.loss_params}

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.trainable)
        new_trainable = optax.apply_updates(self.trainable, updates)
        return self.replace(
            step=self.step + 1,
            params=new_trainable['model'],
            loss_params=new_trainable['loss'],
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state)

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None,
               loss_params=None):
        import jax.numpy as jnp
        loss_params = loss_params or {}
        opt_state = tx.init({'model': params, 'loss': loss_params})
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   batch_stats=batch_stats or {}, loss_params=loss_params,
                   opt_state=opt_state, apply_fn=apply_fn, tx=tx)


def create_train_state(model, optimizer: optax.GradientTransformation,
                       rng: jax.Array, sample_lr: jax.Array,
                       composite_loss=None, init_method=None) -> TrainState:
    """Initialize model variables + loss params and build the TrainState.

    ``init_method``: alternate init entry point (flax ``method=``) for
    models whose ``__call__`` doesn't trace every submodule — SRGAN's
    forward is generator-only, so restore templates init via
    ``model.init_all`` to build the checkpoint's combined G+D tree."""
    variables = model.init(rng, sample_lr, train=True, method=init_method)
    loss_params = {}
    if composite_loss is not None and composite_loss.has_trainable:
        loss_params = composite_loss.init_params(
            jax.random.fold_in(rng, 1))
    return TrainState.create(
        apply_fn=model.apply, params=variables['params'], tx=optimizer,
        batch_stats=variables.get('batch_stats', {}),
        loss_params=loss_params)
