"""Model zoo registry.

Capability parity with the reference's reflection-based model discovery
(reference models/__init__.py:1-21, train.py:280, predict.py:166): every SR
model family is registered by name; CLIs and configs instantiate through
:func:`create_model`, which filters kwargs to the model's declared fields so
one shared config can drive any model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Type

from flax import linen as nn

from .common import (BasicBlock, Conv2d, ConvTranspose2d, PReLU, ResBlock,
                     UpscaleBlock, WNConv2d, bicubic_resize, mean_shift,
                     pixel_shuffle, pixel_unshuffle)
from .ddbpn import DDBPN
from .edsr import EDSR
from .rcan import RCAN
from .rdn import RDN
from .srcnn import SRCNN
from .srgan import SRGAN, SRGANDiscriminator, SRGANGenerator
from .srresnet import SRResNet
from .wdsr import WDSR

MODEL_REGISTRY: dict[str, Type[nn.Module]] = {
    'DDBPN': DDBPN,
    'EDSR': EDSR,
    'RCAN': RCAN,
    'RDN': RDN,
    'SRCNN': SRCNN,
    'SRGAN': SRGAN,
    'SRResNet': SRResNet,
    'WDSR': WDSR,
}

_LOWER = {k.lower(): k for k in MODEL_REGISTRY}


def available_models() -> list[str]:
    return sorted(MODEL_REGISTRY)


def resolve_model(name: str) -> Type[nn.Module]:
    key = _LOWER.get(name.lower())
    if key is None:
        raise ValueError(
            f'Unknown model {name!r}. Available: {", ".join(available_models())}')
    return MODEL_REGISTRY[key]


def model_field_names(cls: Type[nn.Module]) -> set[str]:
    return {f.name for f in dataclasses.fields(cls)
            if f.name not in ('parent', 'name')}


def create_model(name: str, **kwargs: Any) -> nn.Module:
    """Instantiate a registered model, dropping kwargs it doesn't declare."""
    cls = resolve_model(name)
    fields = model_field_names(cls)
    accepted = {k: v for k, v in kwargs.items() if k in fields}
    return cls(**accepted)


def param_count(params) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


__all__ = [
    'MODEL_REGISTRY', 'available_models', 'resolve_model', 'create_model',
    'model_field_names', 'param_count',
    'DDBPN', 'EDSR', 'RCAN', 'RDN', 'SRCNN', 'SRGAN', 'SRGANGenerator',
    'SRGANDiscriminator', 'SRResNet', 'WDSR',
    'BasicBlock', 'Conv2d', 'ConvTranspose2d', 'PReLU', 'ResBlock',
    'UpscaleBlock', 'WNConv2d', 'bicubic_resize', 'mean_shift',
    'pixel_shuffle', 'pixel_unshuffle',
]
