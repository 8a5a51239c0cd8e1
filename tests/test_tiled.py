"""Tiled inference: exactness vs direct forward, coverage, odd sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srtpu.models import create_model
from srtpu.train.tiled import _anchors, receptive_field_radius, tiled_predict


def _forward_fn(model, variables):
    fn = jax.jit(lambda x: model.apply(variables, x))
    return lambda x: fn(jnp.asarray(x))


@pytest.mark.parametrize('hw', [(40, 56), (33, 47), (72, 40)])
def test_tiled_matches_direct(hw):
    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=2)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
    fwd = _forward_fn(model, variables)

    lr = np.random.default_rng(0).random((*hw, 3)).astype(np.float32)
    direct = np.asarray(fwd(lr[None]))[0]
    # EDSR(2 blocks): receptive radius ~ 7 LR px; overlap 8 suffices
    tiled = tiled_predict(fwd, lr, scale=2, tile=32, overlap=8)
    assert tiled.shape == direct.shape
    np.testing.assert_allclose(tiled, direct, atol=2e-5)


def test_anchor_coverage():
    for size in (10, 32, 33, 63, 64, 65, 200):
        for tile, ov in ((32, 8), (64, 16)):
            stride = tile - 2 * ov
            ys = _anchors(size, tile, stride)
            assert ys[0] == 0
            # every pixel covered by some tile's valid region
            covered = np.zeros(size, bool)
            for i, y0 in enumerate(ys):
                y1 = min(y0 + tile, size)
                v0 = y0 if i == 0 else y0 + ov
                v1 = y1 if i == len(ys) - 1 else y1 - ov
                covered[v0:v1] = True
            assert covered.all(), (size, tile, ov)


def test_subtile_image_interior_matches():
    # sub-tile images get edge-padded: borders differ from direct zero-pad
    # context, interiors match
    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=2)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))
    fwd = _forward_fn(model, variables)
    lr = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
    direct = np.asarray(fwd(lr[None]))[0]
    tiled = tiled_predict(fwd, lr, scale=2, tile=32, overlap=8)
    m = 16  # crop SR-space border (8 LR px * scale)
    np.testing.assert_allclose(tiled[m:-m, m:-m], direct[m:-m, m:-m],
                               atol=2e-5)


def test_receptive_field_heuristic():
    model = create_model('EDSR', scale_factor=2, n_resblocks=16)
    assert 24 <= receptive_field_radius(model) <= 96


def test_trainer_predict_tiled(tmp_path):
    """predict with predict_tile set produces correct-size outputs for a
    large image, identical to untiled within tolerance."""
    from PIL import Image
    from srtpu.data import SRData
    from srtpu.train import Trainer, TrainerConfig, create_train_state
    from srtpu.optim import build_optimizer

    demo = tmp_path / 'ds' / 'Big'
    demo.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((96, 80, 3)) * 255).astype(np.uint8)).save(
        demo / 'big.png')

    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=2)
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))

    def run(tile):
        out_dir = tmp_path / f'pred{tile}'
        dm = SRData(datasets_dir=tmp_path / 'ds', predict_datasets=['Big'],
                    scale_factor=2, eval_datasets=[], train_datasets=[],
                    eval_bucket=16)
        cfg = TrainerConfig(default_root_dir=str(out_dir),
                            predict_tile=tile, predict_tile_overlap=8)
        Trainer(cfg).predict(state, dm)
        from PIL import Image as I
        return np.asarray(I.open(out_dir / 'Big' / 'big.png'),
                          dtype=np.float32)

    untiled = run(0)
    tiled = run(32)
    assert untiled.shape == tiled.shape == (192, 160, 3)
    np.testing.assert_allclose(tiled, untiled, atol=1.01)  # uint8 rounding


# ---------------------------------------------------------------------------
# In-jit tiled forward (kernel-path eval/predict/serving — VERDICT r4 #1)
# ---------------------------------------------------------------------------

def _small_edsr():
    model = create_model('EDSR', scale_factor=2, n_feats=8, n_resblocks=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, variables


@pytest.mark.parametrize('shape', [(1, 80, 96), (2, 70, 50), (1, 64, 64)])
def test_injit_tiled_matches_direct(shape):
    """make_tiled_apply == direct forward when overlap >= receptive
    radius, for B=1 and B>1 and non-stride-multiple sizes."""
    from srtpu.train.tiled import make_tiled_apply
    model, variables = _small_edsr()
    b, h, w = shape
    lr = jnp.asarray(np.random.default_rng(0).random(
        (b, h, w, 3)).astype(np.float32))
    direct = np.asarray(jax.jit(
        lambda x: model.apply(variables, x, train=False))(lr))

    tiler = make_tiled_apply(scale=2, tile_h=32, tile_w=32, overlap=8,
                             batch=4)

    @jax.jit
    def run(x):
        return tiler(lambda t: model.apply(variables, t, train=False), x)

    tiled = np.asarray(run(lr))
    assert tiled.shape == direct.shape
    np.testing.assert_allclose(tiled, direct, atol=2e-5)


def test_injit_tiled_subtile_interior():
    """Sub-tile images get edge-padded; interiors match direct."""
    from srtpu.train.tiled import make_tiled_apply
    model, variables = _small_edsr()
    lr = jnp.asarray(np.random.default_rng(1).random(
        (1, 16, 16, 3)).astype(np.float32))
    direct = np.asarray(model.apply(variables, lr, train=False))
    tiler = make_tiled_apply(scale=2, tile_h=32, tile_w=32, overlap=8)
    tiled = np.asarray(jax.jit(lambda x: tiler(
        lambda t: model.apply(variables, t, train=False), x))(lr))
    assert tiled.shape == direct.shape
    m = 16
    np.testing.assert_allclose(tiled[:, m:-m, m:-m], direct[:, m:-m, m:-m],
                               atol=2e-5)


def test_tiled_eval_step_matches_plain():
    """make_tiled_eval_step returns the same SR and metrics as the plain
    eval step (exact-interior overlap, masked metrics)."""
    from srtpu.metrics import build_metrics
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state
    from srtpu.train.steps import make_eval_step, make_tiled_eval_step

    model, _ = _small_edsr()
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    metrics = build_metrics(['PSNR', 'SSIM'])
    rng = np.random.default_rng(2)
    lr = jnp.asarray(rng.random((1, 72, 88, 3)).astype(np.float32))
    hr = jnp.asarray(rng.random((1, 144, 176, 3)).astype(np.float32))
    mask = jnp.ones((1, 144, 176, 1), np.float32)

    sr_p, m_p = make_eval_step(metrics)(state, lr, hr, mask)
    sr_t, m_t = make_tiled_eval_step(metrics, scale=2, tile=32,
                                     overlap=8)(state, lr, hr, mask)
    np.testing.assert_allclose(np.asarray(sr_t), np.asarray(sr_p),
                               atol=2e-5)
    for k in m_p:
        np.testing.assert_allclose(float(m_t[k]), float(m_p[k]), rtol=1e-4)


def test_tiled_predict_step_matches_plain():
    from srtpu.optim import build_optimizer
    from srtpu.train import create_train_state
    from srtpu.train.steps import make_predict_step, make_tiled_predict_step

    model, _ = _small_edsr()
    state = create_train_state(model, build_optimizer('ADAM', []),
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    lr = jnp.asarray(np.random.default_rng(3).random(
        (1, 60, 100, 3)).astype(np.float32))
    plain = np.asarray(make_predict_step()(state, lr))
    tiled = np.asarray(make_tiled_predict_step(
        scale=2, tile=32, overlap=8)(state, lr))
    np.testing.assert_allclose(tiled, plain, atol=2e-5)


def test_tiled_gate_and_routing(monkeypatch):
    """_tiled_gate excludes non-CS models / RCAN / eval_tile=0 / non-TPU;
    _route_tiled keeps plan-capable shapes direct, tiles the big ones."""
    from srtpu.ops import cs_conv
    from srtpu.train import Trainer, TrainerConfig

    tr = Trainer(TrainerConfig(default_root_dir='/tmp/srtpu_gate_test'))
    try:
        edsr_cs = create_model('EDSR', scale_factor=4, use_pallas='cs')
        edsr_xla = create_model('EDSR', scale_factor=4, use_pallas=False)
        rcan = create_model('RCAN', scale_factor=4, use_pallas='cs')

        # off-TPU (no opt-in): gate closed even for CS models
        assert tr._tiled_gate(edsr_cs) is None

        monkeypatch.setattr(cs_conv, '_cs_backend_ok', lambda: True)
        assert tr._tiled_gate(edsr_cs) == (4, 80, 8)  # 80/ov8: PERF.md r5
        assert tr._tiled_gate(edsr_xla) is None      # XLA model
        assert tr._tiled_gate(rcan) is None          # global pooling
        assert tr._tiled_gate(None) is None

        # routing: training-like shapes have a direct CS plan -> no tiling
        assert not tr._route_tiled(edsr_cs, (16, 32, 32, 3))
        assert not tr._route_tiled(edsr_cs, (1, 64, 64, 3))
        # full eval/serving images exceed every plan -> tiled
        assert tr._route_tiled(edsr_cs, (1, 256, 256, 3))
        assert tr._route_tiled(edsr_cs, (1, 510, 339, 3))

        tr2 = Trainer(TrainerConfig(default_root_dir='/tmp/srtpu_gate_test',
                                    eval_tile=0))
        try:
            assert tr2._tiled_gate(edsr_cs) is None  # disabled by config
        finally:
            tr2.close()
    finally:
        tr.close()
