"""Jitted train/eval/predict steps.

The hot loop (reference training_step srmodel.py:160-171 + Lightning's
backward/step) becomes ONE compiled XLA program per static shape: forward,
composite loss, grads, optimizer update, all fused on device. Eval
(validation_step srmodel.py:214-232) is a second program per shape bucket
computing SR + masked metrics on device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from srtpu.metrics import NO_REFERENCE
from .state import TrainState


def dealias_state(state):
    """Force every state leaf onto its own buffer.

    Freshly initialized states can contain aliased buffers (identical
    zero-initialized optimizer moments may share storage); donated jits
    reject aliased inputs on some backends with an opaque
    INVALID_ARGUMENT. One copy at startup makes donation safe.
    """
    return jax.tree_util.tree_map(jnp.copy, state)


def train_step_body(composite_loss, remat: bool = False):
    """The ONE train-step body every step builder wraps: forward (with BN
    mutable-state threading), composite loss, grad, optimizer update, log
    dict. make_train_step jits it, make_multi_train_step scans it, and
    parallel/mesh.py's make_parallel_train_step jits it with shardings —
    a single definition so the three paths cannot drift.

    ``remat=True`` wraps the forward in jax.checkpoint, trading FLOPs for
    HBM (recompute activations in the backward) — the standard TPU move
    for deep models / large patches. Ignored for batch-norm models
    (mutable state does not thread through checkpointed functions).
    """

    def train_step(state: TrainState, lr_img: jax.Array, hr_img: jax.Array):
        has_bn = bool(state.batch_stats)

        def loss_fn(trainable):
            variables = {'params': trainable['model']}
            if has_bn:
                variables['batch_stats'] = state.batch_stats
                sr, mutated = state.apply_fn(
                    variables, lr_img, train=True, mutable=['batch_stats'])
                new_bs = mutated['batch_stats']
            else:
                def fwd(params, x):
                    return state.apply_fn({'params': params}, x, train=True)
                if remat:
                    fwd = jax.checkpoint(fwd)
                sr = fwd(trainable['model'], lr_img)
                new_bs = None
            total, parts = composite_loss(sr.astype(jnp.float32),
                                          hr_img.astype(jnp.float32),
                                          trainable['loss'])
            return total, (parts, new_bs)

        grads, (parts, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.trainable)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        logs = {'loss': sum(parts.values()) if parts else 0.0}
        logs.update({f'loss/{k}': v for k, v in parts.items()})
        return new_state, logs

    return train_step


def make_train_step(composite_loss, donate: bool = True,
                    remat: bool = False):
    """Build train_step(state, lr, hr) -> (state, logs) (jitted)."""
    body = train_step_body(composite_loss, remat)
    return jax.jit(body, donate_argnums=(0,) if donate else ())


def make_multi_train_step(composite_loss, steps_per_execution: int,
                          donate: bool = True, remat: bool = False):
    """Scan ``steps_per_execution`` train steps inside ONE jitted call.

    On hosts much slower than the chip (single-core TPU-VM frontends), the
    per-dispatch pytree flatten/unflatten dominates the step time; scanning
    k steps on device amortizes it k-fold. Batches arrive stacked as
    (k, B, ...); returns the last step's logs.
    """
    body = train_step_body(composite_loss, remat)

    def one_step(state: TrainState, batch):
        return body(state, *batch)

    def multi_step(state: TrainState, lr_stack: jax.Array,
                   hr_stack: jax.Array):
        state, logs = jax.lax.scan(one_step, state, (lr_stack, hr_stack))
        return state, jax.tree_util.tree_map(lambda x: x[-1], logs)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def _metric_results(metrics: dict[str, Callable], sr, hr_img, mask):
    """Clamp SR/HR to [0,1] (srmodel.py:224-225) and compute the masked
    metric dict; padded pixels are excluded via the mask so bucketed
    shapes score like the originals."""
    sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
    hr = jnp.clip(hr_img.astype(jnp.float32), 0.0, 1.0)
    results = {}
    for name, fn in metrics.items():
        if name in NO_REFERENCE:
            # no-reference metrics see the edge-padded SR here (static
            # bucket shapes inside jit); the Trainer overwrites BRISQUE
            # with the exact unpadded-shape value after the step
            # (srtpu.metrics.brisque_exact) — padding shifts the score
            # by up to ~8 points on small images (tests/test_metrics.py)
            results[name] = fn(sr)
        else:
            results[name] = fn(sr, hr, mask=mask)
    return sr, results


def _variables(state: TrainState) -> dict:
    variables = {'params': state.params}
    if state.batch_stats:
        variables['batch_stats'] = state.batch_stats
    return variables


def make_eval_step(metrics: dict[str, Callable]):
    """Build eval_step(state, lr, hr, mask) -> (sr, {metric: value})."""

    def eval_step(state: TrainState, lr_img, hr_img, mask):
        sr = state.apply_fn(_variables(state), lr_img, train=False)
        return _metric_results(metrics, sr, hr_img, mask)

    return jax.jit(eval_step)


def make_tiled_eval_step(metrics: dict[str, Callable], scale: int,
                         tile: int | tuple[int, int] = 64,
                         overlap: int = 8, batch: int = 16):
    """eval_step whose forward runs in fixed-shape tile batches so the CS
    Pallas kernels engage on full-size images (train/tiled.py rationale;
    reference hot loop: validation_step srmodel.py:214-343). Metrics are
    computed on the stitched SR inside the same program — nothing new
    crosses the host boundary."""
    from .tiled import make_tiled_apply
    th, tw = (tile, tile) if isinstance(tile, int) else tile
    tiler = make_tiled_apply(scale, th, tw, overlap, batch)

    def eval_step(state: TrainState, lr_img, hr_img, mask):
        variables = _variables(state)

        def fwd(t):
            return state.apply_fn(variables, t, train=False)

        sr = tiler(fwd, lr_img)
        return _metric_results(metrics, sr, hr_img, mask)

    return jax.jit(eval_step)


def make_tiled_predict_step(scale: int, tile: int | tuple[int, int] = 64,
                            overlap: int = 8, batch: int = 16):
    """predict_step running the tile-batched kernel-path forward
    (reference predict_step srmodel.py:375-433)."""
    from .tiled import make_tiled_apply
    th, tw = (tile, tile) if isinstance(tile, int) else tile
    tiler = make_tiled_apply(scale, th, tw, overlap, batch)

    def predict_step(state: TrainState, lr_img):
        variables = _variables(state)

        def fwd(t):
            return state.apply_fn(variables, t, train=False)

        sr = tiler(fwd, lr_img)
        return jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)

    return jax.jit(predict_step)


def make_predict_step():
    def predict_step(state: TrainState, lr_img):
        sr = state.apply_fn(_variables(state), lr_img, train=False)
        return jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)

    return jax.jit(predict_step)
