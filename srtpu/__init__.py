"""srtpu — a TPU-native (JAX/XLA/Pallas/pjit) single-image super-resolution
training & inference framework.

Re-designed from scratch with the capabilities of the reference suite
(george-gca/sr-pytorch-lightning): 8 CNN model families, a composable loss DSL,
full-reference/no-reference image-quality metrics, checkpointing on a monitored
metric, experiment tracking, per-epoch SR image dumps, and prediction entry
points — but architected TPU-first:

* models are flax.linen modules in NHWC layout feeding the MXU,
* the train/eval steps are jit/pjit-compiled with static shapes,
* scaling uses ``jax.sharding.Mesh`` (data + spatial axes) with XLA
  collectives over ICI instead of DDP/NCCL,
* hot ops have Pallas kernel implementations (srtpu.ops).
"""

__version__ = '0.1.0'
