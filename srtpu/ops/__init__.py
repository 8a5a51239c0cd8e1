"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 9).

Each kernel ships with an XLA reference implementation used for numerics
tests and as the fallback for shapes that don't fit VMEM (large eval
images). Kernels are opt-in on the model side; benchmarks
(tools/bench_kernels.py) decide the defaults per shape.
"""

from .ca_layer import (ca_layer_fits, ca_layer_fused,
                       ca_layer_fused_trainable, ca_layer_reference)
from .resblock import (resblock_fits, resblock_fused,
                       resblock_fused_trainable, resblock_reference)

__all__ = ['ca_layer_fits', 'ca_layer_fused', 'ca_layer_fused_trainable',
           'ca_layer_reference', 'resblock_fits', 'resblock_fused',
           'resblock_fused_trainable', 'resblock_reference']
