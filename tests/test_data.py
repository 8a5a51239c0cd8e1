"""Data pipeline tests with synthetic on-disk datasets."""

import numpy as np
import pytest

from srtpu.data import (ConcatSource, EvalLoader, ImageFolderSource,
                        NpySource, SRData, TrainLoader, augment_pair,
                        pad_to_bucket, random_patch, reconcile_eval_pair)


@pytest.fixture(scope='module')
def image_dataset(tmp_path_factory):
    """datasets/Tiny/{HR, LR/X2} with 6 images of varying sizes."""
    from PIL import Image
    root = tmp_path_factory.mktemp('datasets')
    hr_dir = root / 'Tiny' / 'HR'
    lr_dir = root / 'Tiny' / 'LR' / 'X2'
    hr_dir.mkdir(parents=True)
    lr_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        h, w = 48 + 2 * i, 64 + 4 * i
        hr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f'img{i:02d}.png')
        lr = np.asarray(Image.fromarray(hr).resize((w // 2, h // 2),
                                                   Image.BICUBIC))
        Image.fromarray(lr).save(lr_dir / f'img{i:02d}.png')
    # HR-only dataset (LR synthesized on the fly)
    hr_only = root / 'HROnly' / 'HR'
    hr_only.mkdir(parents=True)
    for i in range(3):
        hr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_only / f'h{i}.png')
    # npy dataset
    npy_dir = root / 'Npy' / 'HR'
    npy_dir.mkdir(parents=True)
    for i in range(3):
        np.save(npy_dir / f'n{i}.npy',
                (rng.random((32, 32, 3)) * 255).astype(np.uint8))
    return root


def test_image_folder_source_paired(image_dataset):
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='eval')
    assert len(src) == 6
    lr, hr, name = src.get(0)
    assert name == 'img00'
    assert hr.shape == (48, 64, 3) and lr.shape == (24, 32, 3)
    assert hr.dtype == np.float32 and 0 <= hr.min() and hr.max() <= 1


def test_image_folder_source_synthesizes_lr(image_dataset):
    src = ImageFolderSource(hr_dir=image_dataset / 'HROnly' / 'HR',
                            scale_factor=4, mode='train')
    lr, hr, _ = src.get(0)
    assert hr.shape == (40, 40, 3) and lr.shape == (10, 10, 3)


def test_npy_source(image_dataset):
    src = NpySource(hr_dir=image_dataset / 'Npy' / 'HR', scale_factor=2)
    lr, hr, name = src.get(1)
    assert hr.shape == (32, 32, 3) and lr.shape == (16, 16, 3)
    assert name == 'n1'


def test_concat_source(image_dataset):
    a = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                          scale_factor=2)
    b = NpySource(hr_dir=image_dataset / 'Npy' / 'HR', scale_factor=2)
    c = ConcatSource([a, b])
    assert len(c) == 9
    assert c.get(6)[2] == 'n0'


def test_random_patch_alignment():
    rng = np.random.default_rng(0)
    hr = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    lr = hr[::2, ::2]  # fake aligned LR
    for _ in range(10):
        lr_p, hr_p = random_patch(lr, hr, 16, 2, rng)
        assert lr_p.shape == (8, 8, 3) and hr_p.shape == (16, 16, 3)
        # alignment: hr patch at 2x lr coords
        assert hr_p[0, 0, 0] == lr_p[0, 0, 0]


def test_patch_divisibility_assert():
    rng = np.random.default_rng(0)
    x = np.zeros((16, 16, 3))
    with pytest.raises(AssertionError, match='divisible'):
        random_patch(x, x, 15, 2, rng)


def test_augment_applies_same_transform_to_both():
    rng = np.random.default_rng(3)
    hr = np.random.rand(16, 16, 3).astype(np.float32)
    lr = np.random.rand(8, 8, 3).astype(np.float32)

    def transforms(x):
        out = {}
        for k in range(4):
            r = np.rot90(x, k, axes=(0, 1))
            for hf in (False, True):
                h = r[:, ::-1] if hf else r
                for vf in (False, True):
                    out[(k, hf, vf)] = h[::-1, :] if vf else h
        return out

    seen = set()
    for _ in range(32):
        lr_a, hr_a = augment_pair(lr, hr, rng)
        hr_t = transforms(hr)
        lr_t = transforms(lr)
        matches = [key for key, v in hr_t.items()
                   if v.shape == hr_a.shape and np.allclose(v, hr_a)]
        assert matches, 'augmented HR is not one of the 16 transforms'
        assert any(np.allclose(lr_t[m], lr_a) for m in matches), \
            'LR did not receive the same transform as HR'
        seen.add(matches[0])
    assert len(seen) > 4  # augmentation actually varies


def test_reconcile_eval_pair():
    hr = np.random.rand(49, 50, 3).astype(np.float32)
    lr = np.random.rand(12, 12, 3).astype(np.float32)
    lr2, hr2 = reconcile_eval_pair(lr, hr, 4)
    assert hr2.shape[:2] == (48, 48)
    assert lr2.shape[:2] == (12, 12)


def test_pad_to_bucket():
    img = np.random.rand(30, 45, 3).astype(np.float32)
    padded, (h, w) = pad_to_bucket(img, 32)
    assert padded.shape[:2] == (32, 64) and (h, w) == (30, 45)
    assert np.allclose(padded[:30, :45], img)


def test_train_loader_static_shapes(image_dataset):
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='train')
    loader = TrainLoader(src, batch_size=3, patch_size=16, scale_factor=2,
                         seed=0)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert np.asarray(b.lr).shape == (3, 8, 8, 3)
        assert np.asarray(b.hr).shape == (3, 16, 16, 3)


def test_train_loader_deterministic_and_epoch_varying(image_dataset):
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='train')

    def first_batch(seed, epoch):
        loader = TrainLoader(src, 2, 16, 2, seed=seed)
        loader.set_epoch(epoch)
        return np.asarray(next(iter(loader)).lr)

    assert np.allclose(first_batch(0, 0), first_batch(0, 0))
    assert not np.allclose(first_batch(0, 0), first_batch(0, 1))


def test_eval_loader_masks(image_dataset):
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='eval', cache=True)
    loader = EvalLoader(src, scale_factor=2, bucket=32)
    for b in loader:
        assert b.lr.shape[1] % 32 == 0 and b.lr.shape[2] % 32 == 0
        assert b.hr.shape[1] == b.lr.shape[1] * 2
        hs, ws = b.hr_size
        assert b.mask[0, :hs, :ws, 0].all()
        assert b.mask.sum() == hs * ws


def test_srdata_end_to_end(image_dataset):
    dm = SRData(batch_size=2, datasets_dir=image_dataset,
                eval_datasets=['Tiny'], train_datasets=['Tiny', 'HROnly'],
                patch_size=16, scale_factor=2)
    dm.prepare()
    dm.setup('fit')
    train = dm.train_loader()
    assert len(train) == 4  # (6 + 3) // 2
    b = next(iter(train))
    assert np.asarray(b.lr).shape == (2, 8, 8, 3)
    evals = dm.eval_loaders()
    assert len(evals) == 1 and len(evals[0]) == 6


def test_srdata_missing_dataset_raises(image_dataset):
    dm = SRData(datasets_dir=image_dataset, train_datasets=['Nope'],
                eval_datasets=[])
    with pytest.raises(FileNotFoundError, match='Nope'):
        dm.prepare()


def test_per_host_sharding_partitions_data(image_dataset):
    """Two simulated hosts see disjoint, covering index sets."""
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='train')

    def names_for(pidx):
        loader = TrainLoader(src, batch_size=1, patch_size=16,
                             scale_factor=2, seed=0, process_index=pidx,
                             process_count=2)
        seen = []
        for b in loader:
            seen.extend(b.names)
        return seen

    a, b = names_for(0), names_for(1)
    assert len(a) == len(b) == 3  # 6 images / 2 hosts
    assert set(a).isdisjoint(set(b))
    assert set(a) | set(b) == {f'img{i:02d}' for i in range(6)}


def test_abandoned_iterator_stops_producer(image_dataset):
    """Breaking out of an epoch mid-iteration (overfit_batches /
    fast_dev_run / limit_train_batches in the Trainer) must stop the
    prefetch producer thread — otherwise every epoch leaks a thread
    pinning ``prefetch`` batches."""
    import threading
    import time
    src = ImageFolderSource(hr_dir=image_dataset / 'Tiny' / 'HR',
                            lr_dir=image_dataset / 'Tiny' / 'LR' / 'X2',
                            scale_factor=2, mode='train')
    loader = TrainLoader(src, batch_size=1, patch_size=16, scale_factor=2,
                         seed=0, prefetch=1)
    for _ in range(5):
        it = iter(loader)
        next(it)
        it.close()   # what the Trainer's ``break`` triggers via GC

    def producers():
        return [t for t in threading.enumerate()
                if t.name.startswith('srtpu-train-producer')]

    deadline = time.time() + 5.0
    while producers() and time.time() < deadline:
        time.sleep(0.05)
    assert not producers(), f'{len(producers())} producer threads leaked'


def test_loader_worker_count_invariance(tmp_path):
    """Batches are identical for any num_workers (per-item spawned RNG
    streams are order-independent)."""
    import numpy as np
    from PIL import Image
    hr_dir = tmp_path / 'T' / 'HR'
    hr_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                        ).save(hr_dir / f'i{i}.png')
    src = ImageFolderSource(hr_dir=hr_dir, lr_dir=None, scale_factor=2,
                            mode='train')
    batches = {}
    for workers in (1, 3):
        loader = TrainLoader(src, batch_size=4, patch_size=16,
                             scale_factor=2, seed=7, num_workers=workers)
        batches[workers] = next(iter(loader))
    np.testing.assert_array_equal(batches[1].lr, batches[3].lr)
    np.testing.assert_array_equal(batches[1].hr, batches[3].hr)
    assert batches[1].names == batches[3].names


def test_eval_center_crop_pads_small_images(tmp_path):
    """Images smaller than eval patch_size zero-pad like torchvision
    center_crop (reference srdata.py:97-99) instead of producing
    misaligned negative-index slices."""
    from PIL import Image
    from srtpu.data.pipeline import EvalLoader, center_crop
    hr_dir = tmp_path / 'S' / 'HR'
    hr_dir.mkdir(parents=True)
    img = np.zeros((12, 12, 3), np.uint8)
    img[:, :, 0] = 200
    Image.fromarray(img).save(hr_dir / 'small.png')
    src = ImageFolderSource(hr_dir=hr_dir, lr_dir=None, scale_factor=2,
                            mode='eval')
    loader = EvalLoader(src, scale_factor=2, bucket=1, patch_size=32)
    batch = next(iter(loader))
    assert batch.hr.shape[1:3] == (32, 32)
    assert batch.lr.shape[1:3] == (16, 16)
    # original content centered, zero padding around it
    hr = batch.hr[0]
    assert np.all(hr[10:22, 10:22, 0] > 0.5)
    assert np.all(hr[:10] == 0) and np.all(hr[22:] == 0)
    # helper semantics directly
    out = center_crop(np.ones((4, 4, 1), np.float32), 8, 8)
    assert out.shape == (8, 8, 1)
    assert out[4, 4, 0] == 1.0 and out[0, 0, 0] == 0.0


def test_decode_cache_roundtrip(tmp_path, monkeypatch):
    """On-disk decoded cache: second load comes from the cache (PIL not
    touched), bit-identical; stale entries are keyed out by mtime+size;
    corrupt entries fall back to re-decode."""
    import os
    import time

    from PIL import Image
    from srtpu.data import sources

    img_path = tmp_path / 'img.png'
    rng = np.random.default_rng(0)
    first = (rng.random((24, 20, 3)) * 255).astype(np.uint8)
    Image.fromarray(first).save(img_path)

    cache_dir = tmp_path / 'cache'
    monkeypatch.setenv('SRTPU_DECODE_CACHE', str(cache_dir))

    a = sources._load_image(img_path)
    entries = list(cache_dir.glob('*.npy'))
    assert len(entries) == 1
    # cached raw is the pre-float uint8 array (half the bytes of f32)
    assert np.load(entries[0]).dtype == np.uint8

    # second load: cache hit, identical, and PIL is not consulted
    def boom(*a, **k):
        raise AssertionError('decode ran on a cache hit')
    monkeypatch.setattr(Image, 'open', boom)
    b = sources._load_image(img_path)
    np.testing.assert_array_equal(a, b)
    monkeypatch.undo()
    monkeypatch.setenv('SRTPU_DECODE_CACHE', str(cache_dir))

    # rewrite the image (newer mtime) -> new key, fresh decode
    second = (rng.random((24, 20, 3)) * 255).astype(np.uint8)
    time.sleep(0.01)
    Image.fromarray(second).save(img_path)
    os.utime(img_path)
    c = sources._load_image(img_path)
    np.testing.assert_allclose(c, second.astype(np.float32) / 255.0)

    # corrupt entry -> re-decode, not a crash
    entry = sources._decode_cache_path(img_path)
    entry.write_bytes(b'garbage')
    d = sources._load_image(img_path)
    np.testing.assert_array_equal(d, c)


def test_decode_cache_disabled(tmp_path, monkeypatch):
    from PIL import Image
    from srtpu.data import sources

    img_path = tmp_path / 'img.png'
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    monkeypatch.setenv('SRTPU_DECODE_CACHE', '0')
    assert sources._decode_cache_path(img_path) is None
    sources._load_image(img_path)  # no cache dir created anywhere in tmp
    assert not list(tmp_path.glob('**/*.npy'))


def test_lr_synthesis_cache(tmp_path, monkeypatch):
    """HR-only directory datasets cache the synthesized bicubic LR too
    (keyed by HR path + scale): the full-size PIL downscale dominated
    the warm-cache first epoch (PERF.md round 5). Cache hit is
    bit-exact (the PIL output is already uint8-quantized) and must not
    consult PIL at all."""
    from PIL import Image
    from srtpu.data import sources

    hr_dir = tmp_path / 'HR'
    hr_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray((rng.random((32, 24, 3)) * 255).astype(np.uint8)) \
        .save(hr_dir / 'a.png')
    cache_dir = tmp_path / 'cache'
    monkeypatch.setenv('SRTPU_DECODE_CACHE', str(cache_dir))

    src = sources.ImageFolderSource(hr_dir=hr_dir, scale_factor=2)
    lr1, hr1, _ = src.get(0)
    assert lr1.shape == (16, 12, 3)
    # two entries: decoded HR + synthesized LR (distinct keys)
    assert len(list(cache_dir.glob('*.npy'))) == 2
    lr_entry = sources._decode_cache_path(hr_dir / 'a.png', '-x2lr')
    assert lr_entry.exists() and np.load(lr_entry).dtype == np.uint8

    # fresh source (no RAM cache), PIL fully disabled -> cache hits only
    def boom(*a, **k):
        raise AssertionError('PIL ran on a cache hit')
    monkeypatch.setattr(Image, 'open', boom)
    monkeypatch.setattr(Image, 'fromarray', boom)
    src2 = sources.ImageFolderSource(hr_dir=hr_dir, scale_factor=2)
    lr2, hr2, _ = src2.get(0)
    np.testing.assert_array_equal(lr1, lr2)
    np.testing.assert_array_equal(hr1, hr2)

    # with the cache disabled the LR synthesis still works (no cache IO)
    monkeypatch.undo()
    monkeypatch.setenv('SRTPU_DECODE_CACHE', '0')
    src3 = sources.ImageFolderSource(hr_dir=hr_dir, scale_factor=2)
    lr3, _, _ = src3.get(0)
    np.testing.assert_array_equal(lr1, lr3)
