"""SRGAN — adversarially trained SRResNet generator + conv discriminator.

Capability parity with reference models/srgan.py:18-222. The reference file
is bit-rotted against modern Lightning (SURVEY.md §2.1); we implement the
*capability* cleanly: a reflection-padded tanh generator, a strided-conv
discriminator with global pooling head, and the D/G alternating training
semantics live in srtpu.train.gan (two TrainStates, wgangp/vanilla/lsgan
losses, MSE+VGG+adv+TV generator objective).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv2d, CSBNTrunk, PReLU, UpscaleBlock


def _reflect_pad(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='reflect')


class _SRGANBlock(nn.Module):
    """Generator residual block: two reflection-padded 3x3 convs with BN."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = Conv2d(self.dim, 3, padding='valid',
                     dtype=self.dtype)(_reflect_pad(x, 1))
        res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(res)
        res = PReLU()(res)
        res = Conv2d(self.dim, 3, padding='valid',
                     dtype=self.dtype)(_reflect_pad(res, 1))
        res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(res)
        return x + res


class SRGANGenerator(nn.Module):
    """Reference models/srgan.py:18-48 (_SRResNet).

    ``use_pallas='cs'`` runs the 16-block BN trunk + closing conv/BN/skip
    on the fused CS kernel path with REFLECT boundaries
    (CSBNTrunk(reflect=True) — the mirrored neighbor is the
    opposite-direction roll the 3x3 kernels already compute, see
    srtpu/ops/cs_conv.py). The 9x9 head/output convs and the upscale
    stay XLA (reflect 9x9 has no phase-dense form). Off-plan shapes and
    non-TPU backends fall back to identical XLA math inside CSBNTrunk.

    Default is the XLA formulation — a MEASURED negative (PERF.md r5):
    one-process interleaved A/B of the full adversarial step read CS
    20.52 ms vs XLA 19.22 ms (-6.7%). Reflect's mirror terms add ~10
    extra full-width VPU rolls per block across fwd+bwd, outweighing the
    CS layout's MXU win at C=64; the 'cs' path stays available, exact
    (gradient-parity tests in tests/test_bn_cs.py) for shapes where the
    trade flips.
    """

    scale_factor: int = 4
    channels: int = 3
    ngf: int = 64
    n_blocks: int = 16
    use_pallas: Any = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.ngf, 9, padding='valid',
                   dtype=self.dtype)(_reflect_pad(x, 4))
        x = PReLU()(x)

        if self.use_pallas == 'cs':
            x = CSBNTrunk(n_feats=self.ngf, n_resblocks=self.n_blocks,
                          reflect=True, dtype=self.dtype)(x, train)
        else:
            res = x
            for _ in range(self.n_blocks):
                res = _SRGANBlock(self.ngf, dtype=self.dtype)(res, train)
            res = Conv2d(self.ngf, 3, padding='valid',
                         dtype=self.dtype)(_reflect_pad(res, 1))
            res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)(res)
            x = x + res

        x = UpscaleBlock(self.scale_factor, self.ngf, act=PReLU,
                         dtype=self.dtype)(x)
        x = Conv2d(self.channels, 9, padding='valid',
                   dtype=self.dtype)(_reflect_pad(x, 4))
        x = nn.tanh(x)
        return (x + 1.0) / 2.0


class SRGANDiscriminator(nn.Module):
    """Reference models/srgan.py:72-108: conv tower, dense layers replaced by
    global average pooling + 1x1 convolutions, sigmoid output."""

    ndf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_block(h, feats, stride):
            h = Conv2d(feats, 3, strides=stride, padding=1,
                       dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(h)
            return h

        ndf = self.ndf
        x = Conv2d(ndf, 3, strides=1, padding=1, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = conv_block(x, ndf, 2)
        x = conv_block(x, ndf * 2, 1)
        x = conv_block(x, ndf * 2, 2)
        x = conv_block(x, ndf * 4, 1)
        x = conv_block(x, ndf * 4, 2)
        x = conv_block(x, ndf * 8, 1)
        x = conv_block(x, ndf * 8, 2)

        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = Conv2d(1024, 1, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = Conv2d(1, 1, dtype=self.dtype)(x)
        return nn.sigmoid(x)


class SRGAN(nn.Module):
    """Wrapper whose forward is the generator (reference srgan.py:133-134).

    The discriminator is exposed for the adversarial loop in
    srtpu.train.gan; calling the module runs the generator only, so predict/
    eval paths treat SRGAN exactly like any other SR model.
    """

    scale_factor: int = 4
    channels: int = 3
    ngf: int = 64
    ndf: int = 64
    n_blocks: int = 16
    use_pallas: Any = False   # measured negative (see SRGANGenerator)
    dtype: Any = None

    def setup(self):
        self.generator = SRGANGenerator(self.scale_factor, self.channels,
                                        self.ngf, self.n_blocks,
                                        self.use_pallas, self.dtype)
        self.discriminator = SRGANDiscriminator(self.ndf, self.dtype)

    def __call__(self, x, train: bool = False):
        return self.generator(x, train)

    def discriminate(self, x, train: bool = False):
        return self.discriminator(x, train)

    def init_all(self, x, train: bool = False):
        """Trace G AND D so ``model.init(..., method=model.init_all)``
        builds the FULL combined param tree. ``__call__`` is
        generator-only by design (reference srgan.py:133-134), but GAN
        checkpoints store the combined G+D view (train/loop.py
        _gan_eval_view) and restore templates must match it
        (cli._restore; create_train_state init_method)."""
        sr = self.generator(x, train)
        return self.discriminator(sr, train)
