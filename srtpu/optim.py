"""Optimizer registry and config-string parsing.

Capability parity with the reference optimizer system
(reference models/srmodel.py:57-64, 595-621):
* registry: ADAM, Ranger, RangerVA, RangerQH, RMSprop, SGD;
* ``optimizer_params`` parsing of ``"name=value"`` strings with the same
  typed keys (eps/lr/lr_decay/weight_decay floats, betas tuple) — minus the
  reference bug where user params were silently dropped
  (srmodel.py:602 rebinds optimizer_params; SURVEY.md "quirks").

The Ranger family is built from optax primitives: RAdam (+ lookahead slow
weights); RangerQH uses QHAdam moments; RangerVA adds gradient
centralization. Lookahead is implemented as a self-contained
GradientTransformation so the TrainState keeps a plain param tree
(optax.lookahead's split param wrapper would leak into checkpoints).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """k-step lookahead over plain params (Zhang et al. 2019)."""

    def init(params):
        return LookaheadState(inner=inner.init(params), slow=params,
                              count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        assert params is not None, 'lookahead requires params'
        updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def blend(u, p, s):
            fast = p + u
            synced = s + slow_step_size * (fast - s)
            return jnp.where(sync, synced - p, u)

        def new_slow(u, p, s):
            fast = p + u
            synced = s + slow_step_size * (fast - s)
            return jnp.where(sync, synced, s)

        new_updates = jax.tree_util.tree_map(blend, updates, params,
                                             state.slow)
        slow = jax.tree_util.tree_map(new_slow, updates, params, state.slow)
        return new_updates, LookaheadState(inner_state, slow, count)

    return optax.GradientTransformation(init, update)


class QHAdamState(NamedTuple):
    count: jnp.ndarray
    m: Any
    v: Any


def scale_by_qhadam(b1: float = 0.9, b2: float = 0.999, nu1: float = 0.7,
                    nu2: float = 1.0, eps: float = 1e-8
                    ) -> optax.GradientTransformation:
    """Quasi-hyperbolic Adam moments (Ma & Yarats 2019)."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)
        return QHAdamState(count=jnp.zeros([], jnp.int32),
                           m=jax.tree_util.tree_map(zeros, params),
                           v=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        count = state.count + 1
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state.m, updates)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * g * g, state.v, updates)
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count

        def u(g, mm, vv):
            m_hat = mm / bc1
            v_hat = vv / bc2
            num = nu1 * m_hat + (1 - nu1) * g
            den = jnp.sqrt(nu2 * v_hat + (1 - nu2) * g * g) + eps
            return num / den

        return jax.tree_util.tree_map(u, updates, m, v), \
            QHAdamState(count, m, v)

    return optax.GradientTransformation(init, update)


def _centralize() -> optax.GradientTransformation:
    """Gradient centralization (Yong et al. 2020) for conv kernels."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def c(g):
            if g.ndim == 4:
                # HWIO conv kernel: per-output-channel mean over
                # (h, w, c_in) — matches torch GC-conv (mean over all
                # dims but dim 0 of OIHW); for HWOI transposed kernels
                # this is per-input-channel, which is ALSO what torch GC
                # does on ConvTranspose (its dim 0 is c_in)
                return g - jnp.mean(g, axis=(0, 1, 2), keepdims=True)
            if g.ndim == 3 and g.shape[1] % 3 == 0 and g.shape[2] % 3 == 0:
                # stacked CS-arranged conv weights (L, 3C', 3C) — rows are
                # (dy, c_out), cols (dx, c_in): per-(l, c_out) mean over
                # taps x c_in, so CS-path training matches the HWIO path
                l, r3, cols = g.shape
                v = g.reshape(l, 3, r3 // 3, cols)
                return (v - jnp.mean(v, axis=(1, 3), keepdims=True)) \
                    .reshape(g.shape)
            return g
        return jax.tree_util.tree_map(c, updates), state

    return optax.GradientTransformation(init, update)


def _scale_by_lr(lr: float) -> optax.GradientTransformation:
    return optax.scale(-lr)


def build_optimizer(name: str, params: dict[str, Any] | list[str] | None = None
                    ) -> optax.GradientTransformation:
    """Build an optimizer by registry name with parsed params."""
    kw = parse_optimizer_params(params) if not isinstance(params, dict) \
        else dict(params or {})
    lr = kw.pop('lr', 1e-3 if name not in ('SGD', 'RMSprop') else 1e-2)
    weight_decay = kw.pop('weight_decay', 0.0)
    key = name.lower()

    if key == 'adam':
        betas = kw.pop('betas', (0.9, 0.999))
        tx = optax.adam(lr, b1=betas[0], b2=betas[1],
                        eps=kw.pop('eps', 1e-8))
    elif key == 'sgd':
        tx = optax.sgd(lr, momentum=kw.pop('momentum', 0.0),
                       nesterov=bool(kw.pop('nesterov', False)))
    elif key == 'rmsprop':
        tx = optax.rmsprop(lr, decay=kw.pop('alpha', 0.99),
                           eps=kw.pop('eps', 1e-8),
                           momentum=kw.pop('momentum', 0.0))
    elif key in ('ranger', 'rangerva', 'rangerqh'):
        betas = kw.pop('betas', (0.95, 0.999))
        eps = kw.pop('eps', 1e-5)
        k = int(kw.pop('k', 6))
        alpha = kw.pop('alpha', 0.5)
        if key == 'rangerqh':
            nus = kw.pop('nus', (0.7, 1.0))
            core = optax.chain(scale_by_qhadam(betas[0], betas[1],
                                               nus[0], nus[1], eps),
                               _scale_by_lr(lr))
        else:
            chain = [optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps)]
            if key == 'rangerva':
                chain.insert(0, _centralize())
            chain.append(_scale_by_lr(lr))
            core = optax.chain(*chain)
        tx = lookahead(core, sync_period=k, slow_step_size=alpha)
    else:
        raise ValueError(
            f'Optimizer not recognized: {name}. Supported optimizers: '
            f'{", ".join(supported_optimizers())}')

    if kw:
        # the reference silently dropped user optimizer params
        # (srmodel.py:602); silently ignoring UNKNOWN ones would be the
        # same bug in a smaller box — fail loudly instead
        raise ValueError(
            f'optimizer params not supported by {name}: {sorted(kw)}')
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def supported_optimizers() -> list[str]:
    return ['ADAM', 'RMSprop', 'Ranger', 'RangerQH', 'RangerVA', 'SGD']


def parse_optimizer_params(params: list[str] | None) -> dict[str, Any]:
    """Parse ["lr=1e-4", "betas=0.9,0.99"] (srmodel.py:595-621 semantics,
    with the params actually honored)."""
    out: dict[str, Any] = {}
    for param in params or []:
        name, value = param.strip().split('=')
        name = name.strip()
        if name in ('eps', 'lr', 'lr_decay', 'weight_decay', 'momentum',
                    'alpha'):
            out[name] = float(value)
        elif name in ('betas', 'nus'):
            out[name] = tuple(float(v) for v in value.split(','))
        elif name in ('k', 'sync_period'):
            out['k'] = int(value)
        elif name == 'nesterov':
            out[name] = value.strip().lower() in ('1', 'true', 'yes')
        else:
            out[name] = value
    return out
