"""Parallelism: device mesh, sharding rules, parallel train/eval steps."""

from .mesh import (batch_sharding, eval_sharding, initialize_distributed,
                   make_mesh, make_parallel_eval_step,
                   make_parallel_predict_step, make_parallel_train_step,
                   psum_metrics, put_global, put_local_batch,
                   replicate_state, replicated, shard_batch,
                   shard_eval_batch)

__all__ = ['batch_sharding', 'eval_sharding', 'initialize_distributed',
           'make_mesh', 'make_parallel_eval_step',
           'make_parallel_predict_step', 'make_parallel_train_step',
           'psum_metrics', 'put_global', 'put_local_batch',
           'replicate_state', 'replicated', 'shard_batch',
           'shard_eval_batch']
