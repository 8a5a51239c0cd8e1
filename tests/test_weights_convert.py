"""End-to-end pretrained-weights pipeline tests.

torchvision and network access are unavailable here, so real ImageNet
weights cannot be fetched — instead these tests lock the MACHINERY with
deterministic fixtures: a torch model in the exact torchvision VGG16
layout is saved as a .pth, run through tools/convert_torch_weights.py,
loaded by the srtpu feature stack, and compared tap-by-tap against the
torch forward. The full LPIPS and DISTS pipelines are then golden-tested
against torch-side recomputations of the same published formulas. When
real vgg16-*.pth weights are provided, the identical code path converts
them (reference gets them via torchvision at runtime,
losses/losses.py:128,170).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from srtpu.losses.vgg import (DISTS, LPIPS, VGG16_PLAN, init_vgg_params,
                              vgg_features, _LPIPS_SHIFT, _LPIPS_SCALE)  # noqa: E402


def _build_torch_vgg16():
    layers, in_c = [], 3
    for p in VGG16_PLAN:
        if p == 'M':
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, p, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_c = p
    return torch.nn.Sequential(*layers)


def _torch_taps(model, x, tap_indices):
    """Forward through the Sequential, grabbing outputs at given indices."""
    outs = []
    for i, layer in enumerate(model):
        x = layer(x)
        if i in tap_indices:
            outs.append(x)
    return outs


def _last_relu_indices():
    """Index (in the Sequential) of the last ReLU in each block —
    torchvision relu{k}_last, the LPIPS/DISTS tap points."""
    idx, out = 0, []
    for p in VGG16_PLAN:
        if p == 'M':
            out.append(idx - 1)  # the ReLU just before this pool
            idx += 1
        else:
            idx += 2
    return out


@pytest.fixture(scope='module')
def converted_weights(tmp_path_factory):
    """Save a torchvision-layout VGG16 .pth + LPIPS/DISTS fixtures, run the
    converter, and return (weights_dir, torch_model, lin_ws, alpha, beta)."""
    import sys
    sys.path.insert(0, 'tools')
    import convert_torch_weights as cw

    wdir = tmp_path_factory.mktemp('weights')
    torch.manual_seed(0)
    model = _build_torch_vgg16()
    model.eval()
    state = {f'features.{k}': v for k, v in model.state_dict().items()}
    pth = wdir / 'vgg16_fixture.pth'
    torch.save(state, pth)

    dims = (64, 128, 256, 512, 512)
    lin_state = {f'lin{i}.weight': torch.rand(1, d, 1, 1) * 0.1
                 for i, d in enumerate(dims)}
    lin_pth = wdir / 'lpips_fixture.pth'
    torch.save(lin_state, lin_pth)

    total = 3 + sum(dims)
    ab_state = {'alpha': torch.rand(1, total, 1, 1) * 0.01,
                'beta': torch.rand(1, total, 1, 1) * 0.01}
    ab_pth = wdir / 'dists_fixture.pth'
    torch.save(ab_state, ab_pth)

    import os
    old = os.environ.get('SRTPU_WEIGHTS_DIR')
    os.environ['SRTPU_WEIGHTS_DIR'] = str(wdir)
    try:
        assert cw.main(['vgg16', str(pth)]) == 0
        assert cw.main(['lpips', str(lin_pth)]) == 0
        assert cw.main(['dists', str(ab_pth)]) == 0
    finally:
        if old is None:
            os.environ.pop('SRTPU_WEIGHTS_DIR')
        else:
            os.environ['SRTPU_WEIGHTS_DIR'] = old

    lin_ws = [lin_state[f'lin{i}.weight'].squeeze().numpy()
              for i in range(5)]
    return wdir, model, lin_ws, ab_state['alpha'].squeeze().numpy(), \
        ab_state['beta'].squeeze().numpy()


def test_converted_vgg16_features_match_torch(converted_weights):
    """convert -> load -> forward: every LPIPS tap activation equals the
    torch model's, proving OIHW->HWIO conversion and the srtpu conv/pool
    stack reproduce torchvision's features exactly."""
    wdir, model, *_ = converted_weights
    params, loaded = init_vgg_params(
        'vgg16', weights=wdir / 'vgg16_features.npz', return_loaded=True)
    assert loaded

    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    taps = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')
    ours, _ = vgg_features(params, VGG16_PLAN, jnp.asarray(x), taps)

    with torch.no_grad():
        theirs = _torch_taps(model, torch.from_numpy(x).permute(0, 3, 1, 2),
                             set(_last_relu_indices()))
    for tap, t in zip(taps, theirs):
        np.testing.assert_allclose(
            np.asarray(ours[tap]), t.permute(0, 2, 3, 1).numpy(),
            atol=1e-4, err_msg=tap)


def test_lpips_pipeline_matches_torch_formula(converted_weights):
    """Full LPIPS with converted weights == the published formula computed
    torch-side: shift/scale prep, VGG16 taps, channel-unit-normalize,
    squared diff, learned per-channel weights, spatial mean, layer sum."""
    wdir, model, lin_ws, *_ = converted_weights
    lp = LPIPS(weights_dir=wdir)
    assert lp.pretrained

    rng = np.random.default_rng(1)
    x = rng.random((1, 48, 56, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape), 0, 1) \
        .astype(np.float32)
    ours = float(lp(jnp.asarray(x), jnp.asarray(y)))

    shift = torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1)

    def prep(a):
        t = torch.from_numpy(a).permute(0, 3, 1, 2) * 2.0 - 1.0
        return (t - shift) / scale

    with torch.no_grad():
        taps = set(_last_relu_indices())
        fx = _torch_taps(model, prep(x), taps)
        fy = _torch_taps(model, prep(y), taps)
        total = 0.0
        for a, b, lin in zip(fx, fy, lin_ws):
            a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            d = (a - b) ** 2
            d = (d * torch.from_numpy(lin).view(1, -1, 1, 1)).sum(1)
            total = total + d.mean(dim=(1, 2))
        theirs = float(total.mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_dists_pipeline_matches_torch_formula(converted_weights):
    """Full DISTS with converted weights == the published formula computed
    torch-side: VGG16 with hann-window L2-pooling, per-stage texture
    (means) and structure (covariances) terms, learned alpha/beta."""
    wdir, model, _, alpha, beta = converted_weights
    di = DISTS(weights_dir=wdir)
    assert di.pretrained

    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + 0.08 * rng.standard_normal(x.shape), 0, 1) \
        .astype(np.float32)
    ours = float(di(jnp.asarray(x), jnp.asarray(y)))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def l2pool(t):
        c = t.shape[1]
        w = np.hanning(5)[1:-1]
        k = np.outer(w, w)
        k = torch.from_numpy((k / k.sum()).astype(np.float32))
        k = k.view(1, 1, 3, 3).repeat(c, 1, 1, 1)
        out = torch.nn.functional.conv2d(t ** 2, k, stride=2, padding=1,
                                         groups=c)
        return torch.sqrt(out + 1e-12)

    def feats(a):
        t = (torch.from_numpy(a).permute(0, 3, 1, 2) - mean) / std
        outs = [torch.from_numpy(a).permute(0, 3, 1, 2)]
        x_t = t
        for layer in model:
            if isinstance(layer, torch.nn.MaxPool2d):
                outs.append(x_t)
                x_t = l2pool(x_t)
            else:
                x_t = layer(x_t)
        outs.append(x_t)  # relu5_3 (no pool after in our tap set)
        return outs

    with torch.no_grad():
        fx, fy = feats(x), feats(y)
        dims = (3, 64, 128, 256, 512, 512)
        c1 = c2 = 1e-6
        off, score = 0, 0.0
        for a, b, d in zip(fx, fy, dims):
            al = torch.from_numpy(alpha[off:off + d]).view(1, -1)
            be = torch.from_numpy(beta[off:off + d]).view(1, -1)
            off += d
            mx, my = a.mean(dim=(2, 3)), b.mean(dim=(2, 3))
            vx = (a ** 2).mean(dim=(2, 3)) - mx ** 2
            vy = (b ** 2).mean(dim=(2, 3)) - my ** 2
            cxy = (a * b).mean(dim=(2, 3)) - mx * my
            tex = (2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)
            struct = (2 * cxy + c2) / (vx + vy + c2)
            score = score + (al * tex + be * struct).sum(dim=1).mean()
        theirs = float(1.0 - score)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_fit_warns_loudly_without_pretrained_weights(tmp_path, caplog):
    """Selecting a perceptual loss without converted weights emits a
    PRINT-level banner at fit time (not just a buried module warning)."""
    import logging
    from PIL import Image
    from srtpu.data import SRData
    from srtpu.models import create_model
    from srtpu.train import Trainer, TrainerConfig

    hr_dir = tmp_path / 'ds' / 'W' / 'HR'
    hr_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = np.kron(rng.random((8, 8, 3)), np.ones((8, 8, 1)))
        Image.fromarray((img * 255).astype(np.uint8)).save(
            hr_dir / f'i{i}.png')
    dm = SRData(batch_size=2, datasets_dir=tmp_path / 'ds', patch_size=32,
                scale_factor=2, train_datasets=['W'], eval_datasets=[])
    model = create_model('SRCNN', scale_factor=2)
    cfg = TrainerConfig(max_epochs=1, default_root_dir=str(tmp_path / 'r'),
                        enable_checkpointing=False, num_sanity_val_steps=0,
                        enable_progress_log=False,
                        log_weights_every_n_epochs=0)
    with caplog.at_level(logging.WARNING):
        Trainer(cfg).fit(model, dm, losses='0.9 * l1 + 0.1 * lpips')
    assert any('WITHOUT converted pretrained weights' in r.message
               for r in caplog.records)


def test_pieapp_converter_roundtrip(tmp_path, monkeypatch):
    """A PieAPPv0.1-layout state dict converts and loads: the loss then
    consumes the exact tensors (conv kernels transposed to HWIO, Linear
    weights transposed to (in, out))."""
    import sys
    sys.path.insert(0, 'tools')
    import convert_torch_weights as cw
    from srtpu.losses import pieapp as pa

    torch.manual_seed(1)
    state, in_c = {}, 3
    for i, (out_c, _) in enumerate(pa._CONV_PLAN):
        state[f'conv{i + 1}.weight'] = torch.randn(out_c, in_c, 3, 3) * .05
        state[f'conv{i + 1}.bias'] = torch.randn(out_c) * .05
        in_c = out_c
    for name, in_dim in (('fc_score', pa._feature_length()),
                         ('fc_weight', 512 * 2 * 2)):
        for j, (a, b) in enumerate([(in_dim, 512), (512, 1)]):
            state[f'{name}{j + 1}.weight'] = torch.randn(b, a) * .01
            state[f'{name}{j + 1}.bias'] = torch.randn(b) * .01
    pth = tmp_path / 'PieAPPv0.1_fixture.pth'
    torch.save(state, pth)

    monkeypatch.setenv('SRTPU_WEIGHTS_DIR', str(tmp_path))
    assert cw.main(['pieapp', str(pth)]) == 0
    params, loaded = pa._init_params(return_loaded=True)
    assert loaded
    np.testing.assert_allclose(
        np.asarray(params['convs'][0][0]),
        np.transpose(state['conv1.weight'].numpy(), (2, 3, 1, 0)),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params['fc_score'][0][0]),
        state['fc_score1.weight'].numpy().T, rtol=1e-6)


def test_brisque_converter_svr(tmp_path, monkeypatch):
    """libsvm allmodel/allrange (LIVE BRISQUE release format) parse into
    the RBF-SVR npz; the metric scores with it, matching a numpy
    recomputation of sum_i alpha_i exp(-gamma ||sv_i - f||^2) - rho."""
    import sys
    sys.path.insert(0, 'tools')
    import convert_torch_weights as cw

    rng = np.random.default_rng(0)
    n_sv, n_feat = 4, 36
    svs = rng.normal(size=(n_sv, n_feat))
    alphas = rng.normal(size=n_sv)
    gamma, rho = 0.05, -0.3
    lines = ['svm_type epsilon_svr', 'kernel_type rbf', f'gamma {gamma}',
             'nr_class 2', f'total_sv {n_sv}', f'rho {rho}', 'SV']
    for a, v in zip(alphas, svs):
        lines.append(' '.join(
            [f'{a}'] + [f'{i + 1}:{x}' for i, x in enumerate(v)]))
    (tmp_path / 'allmodel').write_text('\n'.join(lines))
    lo = -np.abs(rng.normal(size=n_feat)) - 1.0
    hi = np.abs(rng.normal(size=n_feat)) + 1.0
    rows = [f'{i + 1} {a} {b}' for i, (a, b) in enumerate(zip(lo, hi))]
    (tmp_path / 'allrange').write_text('-1 1\n' + '\n'.join(rows))

    monkeypatch.setenv('SRTPU_WEIGHTS_DIR', str(tmp_path))
    assert cw.main(['brisque', str(tmp_path / 'allmodel'),
                    str(tmp_path / 'allrange')]) == 0
    d = np.load(tmp_path / 'brisque_svm.npz')
    assert d['sv'].shape == (n_sv, n_feat)
    assert float(d['gamma']) == pytest.approx(gamma)

    from srtpu.metrics.brisque import brisque, brisque_features
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    score = float(brisque(x))
    feats = np.asarray(brisque_features(x))
    f = -1.0 + 2.0 * (feats - d['scale_min']) / (d['scale_max']
                                                 - d['scale_min'])
    dist = ((d['sv'][None] - f[:, None]) ** 2).sum(-1)
    want = (d['alpha'][None] * np.exp(-float(d['gamma']) * dist)).sum(-1) \
        - float(d['rho'])
    np.testing.assert_allclose(score, want.mean(), rtol=1e-3, atol=1e-4)


def test_convert_all_from_directory(tmp_path, monkeypatch, capsys):
    """`convert_torch_weights.py all <dir>` produces every artifact it can
    recognize in one command (the connected-host story; VGGs report their
    torchvision dependency instead of failing the run)."""
    import sys
    sys.path.insert(0, 'tools')
    import convert_torch_weights as cw
    from srtpu.losses import pieapp as pa

    torch.manual_seed(2)
    dl = tmp_path / 'downloads'
    dl.mkdir()
    dims = (64, 128, 256, 512, 512)
    torch.save({f'lin{i}.weight': torch.rand(1, d, 1, 1)
                for i, d in enumerate(dims)}, dl / 'lpips_weights.pt')
    torch.save({'alpha': torch.rand(1, 3 + sum(dims), 1, 1),
                'beta': torch.rand(1, 3 + sum(dims), 1, 1)},
               dl / 'dists_weights.pt')
    state, in_c = {}, 3
    for i, (out_c, _) in enumerate(pa._CONV_PLAN):
        state[f'conv{i + 1}.weight'] = torch.randn(out_c, in_c, 3, 3) * .05
        state[f'conv{i + 1}.bias'] = torch.randn(out_c) * .05
        in_c = out_c
    for name, in_dim in (('fc_score', pa._feature_length()),
                         ('fc_weight', 512 * 2 * 2)):
        for j, (a, b) in enumerate([(in_dim, 512), (512, 1)]):
            state[f'{name}{j + 1}.weight'] = torch.randn(b, a) * .01
            state[f'{name}{j + 1}.bias'] = torch.randn(b) * .01
    torch.save(state, dl / 'PieAPPv0.1.pth')
    (dl / 'allmodel').write_text(
        'gamma 0.1\nrho 0.5\nSV\n1.0 ' +
        ' '.join(f'{i + 1}:0.0' for i in range(36)))
    (dl / 'allrange').write_text(
        '\n'.join(f'{i + 1} 0 1' for i in range(36)))

    wdir = tmp_path / 'weights'
    monkeypatch.setenv('SRTPU_WEIGHTS_DIR', str(wdir))
    assert cw.main(['all', str(dl)]) == 0
    for out in ('lpips_lin.npz', 'dists_ab.npz', 'pieapp.npz',
                'brisque_svm.npz'):
        assert (wdir / out).exists(), out
