"""Device mesh, sharding rules, and collective helpers.

This is the TPU-native replacement for the reference's delegated DDP layer
(SURVEY.md §2.2): instead of NCCL all-reduce behind Lightning's
``strategy: auto`` (all.yml:125), we build an explicit
``jax.sharding.Mesh`` and let the XLA SPMD partitioner insert ICI
collectives:

* **data axis** — batch dimension sharded across chips; gradient psum is
  implicit in the jitted train step (the TPU analog of DDP all-reduce);
* **spatial axis** — the H dimension of images sharded across chips, with
  XLA inserting conv halo exchanges automatically. This is the framework's
  sequence/context-parallel analog (SURVEY.md §2.2): "long context" for SR
  is full-resolution validation images vs small training patches;
* **model axis hooks** — parameter sharding rules for channel-parallel
  convs (tensor parallel) are exposed for very wide models, though the SR
  zoo fits comfortably on one chip (documented non-goal, SURVEY.md §2.2).

Multi-host: ``initialize_distributed`` wraps jax.distributed.initialize
(DCN across slices); per-host data loading feeds only the local shard via
``host_local_batch``.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_logger = logging.getLogger(__name__)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op single-host).

    Reference counterpart: ``num_nodes`` (configs/all.yml:118) — Lightning
    delegates to torch.distributed; here jax.distributed.initialize brings
    up the cross-host runtime (DCN across slices) and ``jax.devices()``
    becomes the global device list. Config knobs ``trainer.num_nodes`` /
    ``trainer.coordinator_address`` / ``trainer.node_rank`` feed this via
    the CLI; env fallbacks SRTPU_COORDINATOR / SRTPU_NODE_RANK.
    """
    import os
    if not num_processes or num_processes <= 1:
        return
    coordinator = coordinator or os.environ.get('SRTPU_COORDINATOR',
                                                'localhost:12355')
    if process_id is None:
        rank = os.environ.get('SRTPU_NODE_RANK')
        if rank is None:
            # defaulting to 0 would make EVERY host claim rank 0 and hang
            # the coordinator with no pointer at the misconfiguration
            raise ValueError(
                f'num_nodes={num_processes} but the process rank is unset: '
                'pass trainer.node_rank (or set SRTPU_NODE_RANK) on every '
                'host, 0..num_nodes-1')
        process_id = int(rank)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _logger.info('multi-host runtime up: process %d/%d, %d global devices',
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))


def put_global(x, sharding: NamedSharding):
    """Place a host array under a (possibly multi-host) sharding when every
    process holds the identical GLOBAL value (replicated state, eval
    images). Single-process: plain device_put. Multi-process: build the
    global jax.Array from per-device slices of the local copy."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def put_local_batch(x, sharding: NamedSharding):
    """Place a PER-PROCESS batch shard under a multi-host batch sharding
    (each process's loader yields its own interleaved slice of the epoch;
    the global batch is the concatenation). Single-process: device_put."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def make_mesh(data: int | None = None, spatial: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // spatial
    assert data * spatial == n, \
        f'mesh {data}x{spatial} != {n} devices'
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=('data', 'spatial'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P('data', 'spatial'))


def eval_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC eval batch: H over ALL mesh devices, N replicated.

    Validation/prediction run one full-resolution image at a time
    (batch 1, reference srdata.py:518-524), so the batch axis cannot be
    sharded; the image's row axis is split across the whole mesh instead —
    the context-parallel analog (SURVEY.md §2.2), with XLA inserting conv
    halo exchanges.
    """
    return NamedSharding(mesh, P(None, ('data', 'spatial')))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh with batch/spatial sharding (each
    process contributes its local slice in multi-host runs)."""
    sh = batch_sharding(mesh)
    out = tuple(put_local_batch(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_eval_batch(mesh: Mesh, *arrays):
    """Place batch-1 eval arrays onto the mesh row-sharded (see
    :func:`eval_sharding`); eval images are loaded identically on every
    process."""
    sh = eval_sharding(mesh)
    out = tuple(put_global(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, state):
    """Replicate a TrainState's arrays across the mesh (state is built
    identically on every process — deterministic seeded init)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), state)


def make_parallel_train_step(composite_loss, mesh: Mesh,
                             donate: bool = True, remat: bool = False):
    """Data(+spatial)-parallel train step.

    The batch arrives sharded (N over 'data', H over 'spatial'); parameters
    and optimizer state are replicated. jax.jit + the SPMD partitioner turn
    the loss-mean into a psum over ICI — no hand-written collectives needed
    (scaling-book recipe: annotate shardings, let XLA insert collectives).
    ``remat`` rematerializes the forward exactly like the single-device
    step (trainer.remat works the same with or without a mesh).
    """
    from srtpu.train.steps import train_step_body

    train_step = train_step_body(composite_loss, remat)

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, data, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else ())


def make_parallel_eval_step(metrics, mesh: Mesh):
    """Row-sharded eval: one full-resolution image split over ALL mesh
    devices (halo exchange by XLA) with metric reductions inserted by the
    SPMD partitioner. Works under any ('data','spatial') mesh shape — the
    batch axis is 1 at eval time and stays replicated."""
    import jax.numpy as jnp
    from srtpu.metrics import NO_REFERENCE

    def eval_step(state, lr_img, hr_img, mask):
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        sr = state.apply_fn(variables, lr_img, train=False)
        sr = jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)
        hr = jnp.clip(hr_img.astype(jnp.float32), 0.0, 1.0)
        results = {}
        for name, fn in metrics.items():
            if name in NO_REFERENCE:
                results[name] = fn(sr)  # see make_eval_step note
            else:
                results[name] = fn(sr, hr, mask=mask)
        return sr, results

    rep = replicated(mesh)
    rows = eval_sharding(mesh)
    return jax.jit(eval_step,
                   in_shardings=(rep, rows, rows, rows),
                   out_shardings=(rows, rep))


def make_parallel_predict_step(mesh: Mesh):
    """Row-sharded inference: the LR image is split over all mesh devices
    (same layout as :func:`make_parallel_eval_step`)."""
    import jax.numpy as jnp

    def predict_step(state, lr_img):
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        sr = state.apply_fn(variables, lr_img, train=False)
        return jnp.clip(sr.astype(jnp.float32), 0.0, 1.0)

    rep = replicated(mesh)
    rows = eval_sharding(mesh)
    return jax.jit(predict_step, in_shardings=(rep, rows),
                   out_shardings=rows)


def psum_metrics(values: dict[str, Any], axis_name: str = 'data'):
    """Explicit cross-chip metric mean for shard_map-style loops."""
    return {k: jax.lax.pmean(v, axis_name) for k, v in values.items()}
