"""Checkpoint layout converter: XLA <-> CS EDSR param trees.

The default config trains with ``use_pallas: cs`` while older checkpoints
store the per-block XLA tree; tools/convert_ckpt_layout.py must map both
directions exactly (same forward outputs) so runs resume across the switch.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))


@pytest.fixture(autouse=True)
def cs_kernels_interpret(monkeypatch):
    """Opt in to interpret-mode CS kernels (TPU-gated in production;
    conftest no longer sets the flag globally — see its note)."""
    monkeypatch.setenv('SRTPU_CS_OFF_TPU', '1')


def _models():
    from srtpu.models import create_model
    kw = dict(scale_factor=4, n_feats=16, n_resblocks=2)
    return (create_model('EDSR', use_pallas=False, **kw),
            create_model('EDSR', use_pallas='cs', **kw))


def test_xla_to_cs_forward_equivalence():
    from convert_ckpt_layout import convert_params
    xla_model, cs_model = _models()
    x = jnp.asarray(np.random.default_rng(0).random((2, 12, 12, 3),
                                                    np.float32))
    p_xla = xla_model.init(jax.random.PRNGKey(0), x)['params']
    p_cs = convert_params(p_xla, 'auto')   # auto-detects xla2cs
    y_xla = xla_model.apply({'params': p_xla}, x)
    y_cs = cs_model.apply({'params': p_cs}, x)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_cs),
                               atol=1e-5, rtol=1e-5)


def test_cs_to_xla_forward_equivalence_and_roundtrip():
    from convert_ckpt_layout import convert_params
    xla_model, cs_model = _models()
    x = jnp.asarray(np.random.default_rng(1).random((2, 12, 12, 3),
                                                    np.float32))
    p_cs = cs_model.init(jax.random.PRNGKey(1), x)['params']
    p_xla = convert_params(p_cs, 'auto')   # auto-detects cs2xla
    y_cs = cs_model.apply({'params': p_cs}, x)
    y_xla = xla_model.apply({'params': p_xla}, x)
    np.testing.assert_allclose(np.asarray(y_cs), np.asarray(y_xla),
                               atol=1e-5, rtol=1e-5)

    back = convert_params(p_xla, 'xla2cs')
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(p_cs)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-6, err_msg=str(pa))


def test_convert_checkpoint_roundtrip(tmp_path):
    """End-to-end: save an XLA-layout 'last' checkpoint, convert it, and
    resume-restore into a CS-layout TrainState."""
    from convert_ckpt_layout import convert_checkpoint
    from srtpu.checkpoint import CheckpointManager
    from srtpu.losses import parse_losses
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state

    xla_model, cs_model = _models()
    x = jnp.asarray(np.random.default_rng(2).random((2, 12, 12, 3),
                                                    np.float32))
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    s_xla = create_train_state(xla_model, tx, jax.random.PRNGKey(2), x,
                               composite)
    s_xla = s_xla.replace(step=jnp.asarray(3))
    src = tmp_path / 'ckpt_xla'
    mngr = CheckpointManager(src, monitor='')
    mngr.save(3, s_xla, {})
    mngr.close()

    dst = tmp_path / 'ckpt_cs'
    assert convert_checkpoint(src, dst, 'auto') == 'xla2cs'

    s_cs = create_train_state(cs_model, tx, jax.random.PRNGKey(9), x,
                              composite)
    mngr2 = CheckpointManager(dst, monitor='')
    restored = mngr2.restore_last(s_cs)
    mngr2.close()
    assert int(restored.step) == 3
    y_src = xla_model.apply({'params': s_xla.params}, x)
    y_res = cs_model.apply({'params': restored.params}, x)
    np.testing.assert_allclose(np.asarray(y_src), np.asarray(y_res),
                               atol=1e-5, rtol=1e-5)


def test_restore_layout_mismatch_names_the_converter(tmp_path):
    """Restoring an XLA-layout checkpoint into a CS-default model must
    raise a readable error naming tools/convert_ckpt_layout.py instead of
    an opaque downstream pytree/apply failure (ADVICE r4)."""
    from srtpu.checkpoint import CheckpointManager
    from srtpu.losses import parse_losses
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state

    xla_model, cs_model = _models()
    x = jnp.asarray(np.random.default_rng(3).random((2, 12, 12, 3),
                                                    np.float32))
    composite = parse_losses('l1')
    tx = build_optimizer('ADAM', ['lr=1e-3'])
    s_xla = create_train_state(xla_model, tx, jax.random.PRNGKey(4), x,
                               composite)
    src = tmp_path / 'ckpt'
    mngr = CheckpointManager(src, monitor='')
    mngr.save(1, s_xla, {})
    mngr.close()

    s_cs = create_train_state(cs_model, tx, jax.random.PRNGKey(5), x,
                              composite)
    mngr2 = CheckpointManager(src, monitor='')
    with pytest.raises(ValueError, match='convert_ckpt_layout'):
        mngr2.restore_last(s_cs)
    mngr2.close()
