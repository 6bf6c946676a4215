"""Native C++ data-path tests: builds the .so, decodes real JPEGs, matches
the PIL reference path to pixel tolerance, and exercises failure backfill
and the prefetch pipeline."""

import os
import pickle

import numpy as np
import pytest

from s2i_tpu import native
from s2i_tpu.data.pipeline import ParallelMap, prefetch


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        # smooth images so JPEG loss stays small
        yy, xx = np.meshgrid(np.linspace(0, 4, 300), np.linspace(0, 4, 320))
        img = np.stack(
            [
                127 + 120 * np.sin(yy + i),
                127 + 120 * np.cos(xx * (i + 1) / 3),
                127 + 120 * np.sin(yy * xx / 4),
            ],
            -1,
        ).astype(np.uint8)
        p = str(d / f"img_{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds():
    assert native.native_available(), "native loader failed to build"


def test_native_probe(jpeg_dir):
    import ctypes

    lib = native.get_lib()
    w, h = ctypes.c_int(), ctypes.c_int()
    assert lib.il_probe(jpeg_dir[0].encode(), ctypes.byref(w), ctypes.byref(h)) == 0
    assert (w.value, h.value) == (300, 320)


def test_native_matches_pil_center_crop(jpeg_dir):
    """augment=0 path vs an equivalent PIL computation."""
    from PIL import Image

    imsize = 128
    outs, failed = native.load_batch(
        jpeg_dir[:4], None, imsize, 2, seed=0, augment=False
    )
    assert failed == 0
    assert [o.shape for o in outs] == [(4, 64, 64, 3), (4, 128, 128, 3)]
    load_size = imsize * 76 // 64
    for j, p in enumerate(jpeg_dir[:4]):
        img = Image.open(p).convert("RGB").resize(
            (load_size, load_size), Image.BILINEAR
        )
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        off = (load_size - imsize) // 2
        ref = arr[off : off + imsize, off : off + imsize]
        diff = np.abs(outs[1][j] - ref)
        # small tolerance: independent bilinear implementations + JPEG round
        assert diff.mean() < 0.02, diff.mean()
        # pyramid consistency: 64 = area-pooled 128
        pooled = outs[1][j].reshape(64, 2, 64, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(outs[0][j], pooled, atol=1e-5)


def test_native_augment_deterministic(jpeg_dir):
    a, _ = native.load_batch(jpeg_dir[:2], None, 64, 1, seed=7, augment=True)
    b, _ = native.load_batch(jpeg_dir[:2], None, 64, 1, seed=7, augment=True)
    c, _ = native.load_batch(jpeg_dir[:2], None, 64, 1, seed=8, augment=True)
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.allclose(a[0], c[0])


def test_native_bbox_crop_changes_output(jpeg_dir):
    bb = np.array([[10, 10, 60, 60]] * 2, np.float32)
    a, _ = native.load_batch(jpeg_dir[:2], bb, 64, 1, seed=0, augment=False)
    b, _ = native.load_batch(jpeg_dir[:2], None, 64, 1, seed=0, augment=False)
    assert not np.allclose(a[0], b[0])


def test_native_matches_pil_bbox_crop(jpeg_dir):
    """The 'matches stackgan.load_image' contract must hold WITH a bbox:
    PIL crops first and resizes the cropped array, so its edge taps
    replicate the crop border — the native fused pass must clamp its taps
    to the crop region too (regression: it clamped to the full frame,
    sampling pixels outside the bbox at region edges)."""
    from s2i_tpu.data.stackgan import pil_load_transform

    imsize = 64
    bb = np.array([[40, 30, 120, 160]] * 2, np.float32)
    outs, failed = native.load_batch(
        jpeg_dir[:2], bb, imsize, 1, seed=0, augment=False
    )
    assert failed == 0
    for j, p in enumerate(jpeg_dir[:2]):
        ref = pil_load_transform(
            p, imsize, rng=None, bbox=tuple(bb[j]), flip_and_crop=False
        )
        diff = np.abs(outs[0][j] - np.asarray(ref, np.float32))
        assert diff.mean() < 0.02, diff.mean()
        # border rows/cols are exactly where full-frame tap clamping leaked
        # out-of-bbox pixels — hold them to the same tolerance explicitly
        border = np.concatenate(
            [diff[0], diff[-1], diff[:, 0], diff[:, -1]]
        )
        assert border.mean() < 0.03, border.mean()


def test_prefetch_early_exit_stops_producer():
    """A consumer that stops early (max_steps window, SIGTERM) must release
    the producer: it previously blocked forever in q.put, pinning buffered
    batches for the life of the process."""
    import threading

    from s2i_tpu.data.pipeline import Prefetcher

    produced = []
    done = threading.Event()

    def src():
        for i in range(10_000):
            produced.append(i)
            yield i
        done.set()

    pf = Prefetcher(src(), depth=2)
    it = iter(pf)
    assert next(it) == 0 and next(it) == 1
    it.close()  # generator finally → Prefetcher.close()
    pf._thread.join(5.0)
    assert not pf._thread.is_alive(), "producer still running after close"
    assert not done.is_set() and len(produced) < 100, (
        "producer kept consuming the source after the consumer left"
    )


def test_native_failure_reported(tmp_path, jpeg_dir):
    bad = str(tmp_path / "not_a_jpeg.jpg")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    outs, failed = native.load_batch(
        [jpeg_dir[0], bad], None, 64, 1, seed=0, augment=False
    )
    assert failed == 1
    assert np.any(outs[0][0]) and not np.any(outs[0][1])


def test_epoch_iterator_native_vs_pil(tmp_path, jpeg_dir):
    """Full iterator equivalence in distribution: same shapes, finite, and
    native enabled by default when available."""
    from s2i_tpu.data.stackgan import GanEpochIterator, StackGanSplit

    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    (root / "images").mkdir()
    names = []
    from PIL import Image

    for i, p in enumerate(jpeg_dir):
        name = f"n{i}"
        Image.open(p).save(root / "images" / f"{name}.jpg")
        names.append(name)
    with open(root / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(names, f)
    with open(root / "train" / "char-CNN-RNN-embeddings.pickle", "wb") as f:
        pickle.dump(np.zeros((len(names), 2, 8), np.float32), f)

    split = StackGanSplit(str(root), "train")
    it_n = GanEpochIterator(split, 4, 2, seed=3, use_native=True)
    it_p = GanEpochIterator(split, 4, 2, seed=3, use_native=False)
    bn, bp = next(iter(it_n)), next(iter(it_p))
    assert bn["images"][1].shape == bp["images"][1].shape == (4, 128, 128, 3)
    assert np.isfinite(bn["images"][1]).all()
    # same shuffle order (shared seed) → same embedding selection
    np.testing.assert_array_equal(bn["embedding"], bp["embedding"])


def test_prefetch_and_parallel_map():
    items = list(prefetch(iter(range(100)), depth=8))
    assert items == list(range(100))
    pm = ParallelMap(lambda x: x * x, workers=4)
    assert pm([1, 2, 3]) == [1, 4, 9]
    pm.close()

    def boom():
        yield 1
        raise RuntimeError("inner")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
