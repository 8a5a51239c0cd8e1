"""Native C++ data-loader core vs the pure-Python path."""

import numpy as np
import pytest

from srtpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='g++ unavailable')


def test_native_patch_matches_numpy_path():
    """The native fused crop+augment equals crop-then-augment in numpy for
    every (rot, hflip, vflip) combination."""
    rng = np.random.default_rng(0)
    scale, patch = 2, 8
    lp = patch // scale
    lr = rng.random((12, 14, 3)).astype(np.float32)
    hr = rng.random((24, 28, 3)).astype(np.float32)

    for rot in range(4):
        for hflip in (False, True):
            for vflip in (False, True):
                y, x = 3, 5
                out_lr = np.empty((lp, lp, 3), np.float32)
                out_hr = np.empty((patch, patch, 3), np.float32)
                native.extract_patch_pair(lr, hr, patch, scale, y, x,
                                          rot, hflip, vflip, out_lr, out_hr)

                lr_p = lr[y:y + lp, x:x + lp]
                hr_p = hr[scale * y:scale * y + patch,
                          scale * x:scale * x + patch]

                def ref(a):
                    a = np.rot90(a, rot, axes=(0, 1))
                    if hflip:
                        a = a[:, ::-1]
                    if vflip:
                        a = a[::-1, :]
                    return np.ascontiguousarray(a)

                np.testing.assert_allclose(out_lr, ref(lr_p), rtol=1e-6)
                np.testing.assert_allclose(out_hr, ref(hr_p), rtol=1e-6)


def test_native_loader_batch_matches_python_loader(tmp_path):
    """Full TrainLoader batches identical with/without the native path."""
    from PIL import Image
    from srtpu.data import ImageFolderSource, TrainLoader
    hr_dir = tmp_path / 'D' / 'HR'
    hr_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(
            np.uint8)).save(hr_dir / f'{i}.png')
    src = ImageFolderSource(hr_dir=hr_dir, scale_factor=2, mode='train',
                            cache=True)

    def batch(force_python):
        loader = TrainLoader(src, batch_size=4, patch_size=16,
                             scale_factor=2, seed=7)
        if force_python:
            loader._make_batch_native = None
            b = TrainLoader.__dict__['_make_batch']
            order = np.random.default_rng((7, 0)).permutation(4)
            return b(loader, order[:4], np.random.default_rng((7, 0)))
        order = np.random.default_rng((7, 0)).permutation(4)
        return loader._make_batch_native(order[:4],
                                         np.random.default_rng((7, 0)))

    # call the two implementations with identical rng streams
    loader = TrainLoader(src, batch_size=4, patch_size=16, scale_factor=2,
                         seed=7)
    order = np.random.default_rng((7, 0)).permutation(4)
    native_b = loader._make_batch_native(order, np.random.default_rng(9))

    # python path: temporarily disable native
    import srtpu.data.native as nat
    saved = nat._lib
    nat._lib, nat._tried = None, True
    try:
        py_b = loader._make_batch(order, np.random.default_rng(9))
    finally:
        nat._lib, nat._tried = saved, True

    np.testing.assert_allclose(np.asarray(native_b.lr),
                               np.asarray(py_b.lr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(native_b.hr),
                               np.asarray(py_b.hr), rtol=1e-6)
    assert native_b.names == py_b.names


def test_native_batch_threaded_matches_serial():
    """extract_patch_batch with nthreads > 1 is bit-identical to serial
    (items are striped across std::threads; no shared mutable state)."""
    rng = np.random.default_rng(3)
    n, scale, patch = 7, 2, 16
    lp = patch // scale
    lrs = [np.ascontiguousarray(rng.random((20 + i, 22, 3)), np.float32)
           for i in range(n)]
    hrs = [np.ascontiguousarray(rng.random(
        (2 * (20 + i), 44, 3)), np.float32) for i in range(n)]
    ys = rng.integers(0, 5, n).astype(np.int32)
    xs = rng.integers(0, 5, n).astype(np.int32)
    rots = rng.integers(0, 4, n).astype(np.int32)
    hfs = rng.integers(0, 2, n).astype(np.int32)
    vfs = rng.integers(0, 2, n).astype(np.int32)

    def run(nthreads):
        out_lr = np.empty((n, lp, lp, 3), np.float32)
        out_hr = np.empty((n, patch, patch, 3), np.float32)
        native.extract_patch_batch(lrs, hrs, patch, scale, ys, xs, rots,
                                   hfs, vfs, out_lr, out_hr,
                                   nthreads=nthreads)
        return out_lr, out_hr

    lr1, hr1 = run(1)
    lr4, hr4 = run(4)
    np.testing.assert_array_equal(lr1, lr4)
    np.testing.assert_array_equal(hr1, hr4)


def test_native_bicubic_matches_pil():
    from PIL import Image
    rng = np.random.default_rng(2)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    ours = native.bicubic_downscale(img, 2)
    pil = np.asarray(Image.fromarray(img).resize((32, 24), Image.BICUBIC))
    assert ours.shape == pil.shape
    # PIL computes in 8-bit fixed point, we in double — values agree to
    # within one uint8 step everywhere
    diff = np.abs(ours.astype(int) - pil.astype(int))
    assert diff.max() <= 1


def test_native_patch_with_non_multiple_hr_dims():
    """Regression: HR images whose dims are not exact multiples of scale
    (e.g. odd-sized HR at scale 3) must use the TRUE HR row stride."""
    rng = np.random.default_rng(5)
    scale, patch = 3, 9
    lp = patch // scale
    lr = rng.random((10, 12, 3)).astype(np.float32)
    hr = rng.random((10 * scale + 2, 12 * scale + 1, 3)).astype(np.float32)

    y, x = 2, 4
    out_lr = np.empty((lp, lp, 3), np.float32)
    out_hr = np.empty((patch, patch, 3), np.float32)
    native.extract_patch_pair(lr, hr, patch, scale, y, x, 0, False, False,
                              out_lr, out_hr)
    np.testing.assert_allclose(out_lr, lr[y:y + lp, x:x + lp], rtol=1e-6)
    np.testing.assert_allclose(
        out_hr, hr[scale * y:scale * y + patch, scale * x:scale * x + patch],
        rtol=1e-6)
