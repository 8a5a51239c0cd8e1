"""SRGAN adversarial training loop: two optimizers, D/G alternation.

Capability parity with reference models/srgan.py:136-222 implemented
cleanly (the reference file targets removed Lightning APIs — SURVEY.md
"quirks" — so this is the capability, not the code):
* D step: d_loss = 1 + gan(D(hr), real) + gan(D(stop_grad(sr)), fake)
  (srgan.py:141-154);
* G step (with the freshly updated D): content = (VGG(relu5_4) + MSE on
  [-1,1]) / 2, g_loss = content + 1e-3 * adv + 2e-8 * tv
  (srgan.py:155-167);
* optimizers: Adam(1e-4) x2 with StepLR(1e5, gamma 0.1)
  (srgan.py:217-222).

TPU-native: both updates are fused into ONE jitted step — forward, both
backward passes, and both optimizer updates compile into a single XLA
program; batch-norm statistics for G and D are carried independently.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from srtpu.losses import gan_loss, tv_loss
from srtpu.losses.basic import l2_loss
from srtpu.losses.vgg import VGGLoss


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_batch_stats: Any
    d_batch_stats: Any
    g_opt_state: Any
    d_opt_state: Any
    g_apply: Callable = struct.field(pytree_node=False)
    d_apply: Callable = struct.field(pytree_node=False)
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)


def steplr_adam(lr: float = 1e-4, step_size: int = 100_000,
                gamma: float = 0.1) -> optax.GradientTransformation:
    """Adam + StepLR schedule (reference srgan.py:217-222)."""
    schedule = optax.exponential_decay(lr, step_size, gamma, staircase=True)
    return optax.adam(schedule)


def create_gan_state(generator, discriminator, rng, sample_lr,
                     g_tx=None, d_tx=None) -> GANTrainState:
    g_tx = g_tx or steplr_adam()
    d_tx = d_tx or steplr_adam()
    g_rng, d_rng = jax.random.split(rng)
    g_vars = generator.init(g_rng, sample_lr, train=True)
    sample_hr_shape = (sample_lr.shape[0],
                       sample_lr.shape[1] * generator.scale_factor,
                       sample_lr.shape[2] * generator.scale_factor,
                       sample_lr.shape[3])
    d_vars = discriminator.init(d_rng, jnp.zeros(sample_hr_shape),
                                train=True)
    return GANTrainState(
        step=jnp.zeros([], jnp.int32),
        g_params=g_vars['params'], d_params=d_vars['params'],
        g_batch_stats=g_vars.get('batch_stats', {}),
        d_batch_stats=d_vars.get('batch_stats', {}),
        g_opt_state=g_tx.init(g_vars['params']),
        d_opt_state=d_tx.init(d_vars['params']),
        g_apply=generator.apply, d_apply=discriminator.apply,
        g_tx=g_tx, d_tx=d_tx)


def make_gan_train_step(gan_mode: str = 'wgangp',
                        vgg_loss: VGGLoss | None = None,
                        adv_weight: float = 1e-3,
                        tv_weight: float = 2e-8,
                        mesh=None):
    """Fused D+G adversarial step. With ``mesh``, the step compiles with
    replicated G/D state and ('data','spatial')-sharded batches — the same
    SPMD recipe as make_parallel_train_step (gradient psum inserted by
    XLA), so SRGAN trains data-parallel instead of silently falling back
    to one device."""
    vgg = vgg_loss if vgg_loss is not None else VGGLoss(
        net_type='vgg19', layer='relu5_4')

    def train_step(state: GANTrainState, lr_img, hr_img):
        # ---- generator forward (old G) for the discriminator update
        g_vars = {'params': state.g_params,
                  'batch_stats': state.g_batch_stats}
        sr, g_mut = state.g_apply(g_vars, lr_img, train=True,
                                  mutable=['batch_stats'])
        sr_const = jax.lax.stop_gradient(sr)

        # ---- discriminator update (srgan.py:141-154)
        def d_loss_fn(d_params):
            d_vars = {'params': d_params,
                      'batch_stats': state.d_batch_stats}
            d_real, d_mut = state.d_apply(d_vars, hr_img, train=True,
                                          mutable=['batch_stats'])
            d_vars2 = {'params': d_params,
                       'batch_stats': d_mut['batch_stats']}
            d_fake, d_mut2 = state.d_apply(d_vars2, sr_const, train=True,
                                           mutable=['batch_stats'])
            loss = (1.0 + gan_loss(d_real, True, gan_mode)
                    + gan_loss(d_fake, False, gan_mode))
            return loss, d_mut2['batch_stats']

        (d_loss, new_d_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_d_opt = state.d_tx.update(d_grads, state.d_opt_state,
                                                 state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update with the refreshed D (srgan.py:155-167)
        def g_loss_fn(g_params):
            vars_g = {'params': g_params,
                      'batch_stats': state.g_batch_stats}
            sr_g, mut = state.g_apply(vars_g, lr_img, train=True,
                                      mutable=['batch_stats'])
            sr32 = sr_g.astype(jnp.float32)
            hr32 = hr_img.astype(jnp.float32)
            mse = l2_loss(sr32 * 2 - 1, hr32 * 2 - 1)
            vgg_l = vgg(sr32, hr32)
            content = (vgg_l + mse) / 2.0
            d_vars = {'params': new_d_params, 'batch_stats': new_d_bs}
            d_out = state.d_apply(d_vars, sr_g, train=False)
            adv = gan_loss(d_out, True, gan_mode)
            tv = tv_loss(sr32)
            g_loss = content + adv_weight * adv + tv_weight * tv
            return g_loss, (mut['batch_stats'],
                            {'g_loss': g_loss, 'content_loss': content,
                             'adv_loss': adv, 'tv_loss': tv,
                             'mse_loss': mse, 'vgg_loss': vgg_l})

        (g_loss, (new_g_bs, g_logs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, new_g_opt = state.g_tx.update(g_grads, state.g_opt_state,
                                                 state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        logs = {'d_loss': d_loss, **g_logs}
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, d_params=new_d_params,
            g_batch_stats=new_g_bs, d_batch_stats=new_d_bs,
            g_opt_state=new_g_opt, d_opt_state=new_d_opt)
        return new_state, logs

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    from srtpu.parallel import batch_sharding, replicated
    rep, data = replicated(mesh), batch_sharding(mesh)
    return jax.jit(train_step, in_shardings=(rep, data, data),
                   out_shardings=(rep, rep), donate_argnums=(0,))
