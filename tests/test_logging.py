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
