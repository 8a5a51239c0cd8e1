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
