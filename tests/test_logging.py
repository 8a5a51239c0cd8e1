"""Observability tests: logging setup, TB events, image save."""

import logging
import numpy as np

from srtpu.utils.logging import PRINT, TBLogger, save_image, setup_log


def test_setup_log_writes_file(tmp_path):
    setup_log('warning', 'info', log_dir=tmp_path, filename='x.log')
    logging.getLogger('test').info('hello-info')
    logging.getLogger('test').log(PRINT, 'hello-print')
    content = (tmp_path / 'x.log').read_text()
    assert 'hello-info' in content and 'hello-print' in content


def test_tb_logger_writes_events(tmp_path):
    tb = TBLogger(tmp_path)
    tb.scalars({'a/b': 1.0, 'loss/total': 0.5}, step=3)
    tb.image('img/x', np.random.rand(8, 8, 3).astype(np.float32), step=3)
    tb.close()
    events = list(tmp_path.glob('events.out.tfevents.*'))
    assert events and events[0].stat().st_size > 0
    # tags present in the raw event file
    raw = events[0].read_bytes()
    assert b'a/b' in raw and b'loss/total' in raw and b'img/x' in raw


def test_save_image_roundtrip(tmp_path):
    from PIL import Image
    img = np.random.rand(10, 12, 3).astype(np.float32)
    save_image(img, tmp_path / 'sub' / 'x.png')
    back = np.asarray(Image.open(tmp_path / 'sub' / 'x.png'),
                      dtype=np.float32) / 255.0
    assert back.shape == (10, 12, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_save_image_grayscale_replicates(tmp_path):
    from PIL import Image
    img = np.random.rand(6, 6, 1).astype(np.float32)
    save_image(img, tmp_path / 'g.png')
    back = np.asarray(Image.open(tmp_path / 'g.png'))
    assert back.shape == (6, 6, 3)


def test_run_assets_written_on_fit(tmp_path):
    """Source snapshot + model summary land in the run root before
    training (reference Comet log_code/set_model_graph, main.py:45-74)."""
    import json
    import zipfile

    from PIL import Image
    from srtpu.data import SRData
    from srtpu.models import create_model
    from srtpu.train import Trainer, TrainerConfig

    hr = tmp_path / 'ds' / 'A' / 'HR'
    hr.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = np.kron(rng.random((8, 8, 3)), np.ones((4, 4, 1)))
        Image.fromarray((img * 255).astype(np.uint8)).save(hr / f'{i}.png')

    dm = SRData(batch_size=2, datasets_dir=tmp_path / 'ds', patch_size=16,
                scale_factor=2, train_datasets=['A'], eval_datasets=['A'],
                eval_bucket=16)
    model = create_model('SRCNN', scale_factor=2)
    root = tmp_path / 'run'
    cfg = TrainerConfig(max_epochs=1, check_val_every_n_epoch=5,
                        default_root_dir=str(root), metrics=('PSNR',),
                        num_sanity_val_steps=0, enable_checkpointing=False,
                        enable_progress_log=False,
                        log_weights_every_n_epochs=0)
    Trainer(cfg).fit(model, dm)

    summary = (root / 'model_summary.txt').read_text()
    assert 'total parameters' in summary and 'SRCNN' in summary
    with zipfile.ZipFile(root / 'source_snapshot.zip') as zf:
        names = zf.namelist()
    assert 'srtpu/train/loop.py' in names
    assert any(n.startswith('native/') for n in names)
    assets = json.loads((root / 'assets.json').read_text())
    assert any('model_summary' in a for a in assets)
    assert any('source_snapshot' in a for a in assets)
    # model graph (reference set_model_graph main.py:45-74 / TB log_graph
    # srmodel.py:105-108): the forward's StableHLO text is the XLA-native
    # graph artifact
    graph = (root / 'model_graph.stablehlo.txt').read_text()
    assert 'stablehlo' in graph or 'func.func' in graph
    assert any('model_graph' in a for a in assets)


def test_attach_run_log_preserves_app_logging(tmp_path):
    """Embedding apps keep their root level/handlers untouched; srtpu INFO
    still reaches run.log (the handler the Trainer attaches)."""
    from srtpu.utils.logging import attach_run_log
    root = logging.getLogger()
    old_handlers, old_level = root.handlers[:], root.level
    pkg = logging.getLogger('srtpu')
    old_pkg_level = pkg.level
    try:
        for h in root.handlers[:]:
            root.removeHandler(h)
        root.setLevel(logging.WARNING)   # the app's own choice
        fileh = attach_run_log(tmp_path, filename='r.log')
        assert root.level == logging.WARNING     # untouched
        logging.getLogger('srtpu.train.loop').info('from-srtpu')
        logging.getLogger('otherlib').info('from-otherlib')
        fileh.flush()
        content = (tmp_path / 'r.log').read_text()
        assert 'from-srtpu' in content           # framework records captured
        assert 'from-otherlib' not in content    # app's WARNING still rules
        root.removeHandler(fileh)
    finally:
        root.handlers[:] = old_handlers
        root.setLevel(old_level)
        pkg.setLevel(old_pkg_level)
