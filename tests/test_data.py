"""Data-layer tests against a synthesized on-disk StackGAN-layout fixture
(SURVEY.md §7 step 3: loaders written now, exercised via fixtures until the
real CUB/Oxford assets exist)."""

import os
import pickle

import numpy as np
import pytest

from s2i_tpu.audio.wavio import read_wav, resample_linear, write_wav
from s2i_tpu.data.stackgan import (
    GanEpochIterator,
    SpeechEpochIterator,
    StackGanSplit,
    multiscale,
)

N_IMG, N_CAP, EMB = 6, 3, 32


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("birds")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        d = root / split
        d.mkdir()
        names = [f"{split}_img_{i}" for i in range(N_IMG)]
        with open(d / "filenames.pickle", "wb") as f:
            pickle.dump(names, f)
        with open(d / "char-CNN-RNN-embeddings.pickle", "wb") as f:
            pickle.dump(
                rng.normal(size=(N_IMG, N_CAP, EMB)).astype(np.float32), f
            )
        with open(d / "class_info.pickle", "wb") as f:
            pickle.dump(list(range(N_IMG)), f)
        for i, name in enumerate(names):
            img = (rng.uniform(0, 255, (300, 300, 3))).astype(np.uint8)
            (root / "images").mkdir(exist_ok=True)
            Image.fromarray(img).save(root / "images" / f"{name}.jpg")
            wav_dir = root / "audio" / name
            wav_dir.mkdir(parents=True, exist_ok=True)
            for c in range(N_CAP):
                write_wav(
                    str(wav_dir / f"{c}.wav"),
                    rng.uniform(-0.5, 0.5, 8000).astype(np.float32),
                    16000,
                )
    return str(root)


def test_wavio_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.7
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(x, y, atol=1e-4)
    z = resample_linear(y, 16000, 8000)
    assert abs(len(z) - 8000) <= 1


def test_wavio_pcm_widths(tmp_path):
    """PCM32/24/8 decode: stdlib ``wave`` only opens integer-PCM files, so a
    4-byte width is int32 PCM — the round-2 float32 interpretation turned
    real samples into ~1e-40 denormals (silence). Also covers file-like
    input (the serving layer reads request bytes via BytesIO)."""
    import io
    import wave as _wave

    x = (np.sin(np.linspace(0, 50, 4000)) * 0.6).astype(np.float32)

    def write(path, width, payload):
        with _wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(16000)
            w.writeframes(payload)

    # int32 PCM
    p32 = str(tmp_path / "i32.wav")
    write(p32, 4, (x * 2147483647).astype("<i4").tobytes())
    y, sr = read_wav(p32)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-6)
    # int24 PCM (3-byte little-endian, sign-extended)
    i24 = np.round(x * 8388607).astype(np.int32)
    b = np.zeros((len(i24), 3), np.uint8)
    b[:, 0] = i24 & 0xFF
    b[:, 1] = (i24 >> 8) & 0xFF
    b[:, 2] = (i24 >> 16) & 0xFF
    p24 = str(tmp_path / "i24.wav")
    write(p24, 3, b.tobytes())
    y, _ = read_wav(p24)
    np.testing.assert_allclose(y, x, atol=2e-7)
    # uint8 PCM
    p8 = str(tmp_path / "u8.wav")
    write(p8, 1, (np.round(x * 127) + 128).astype(np.uint8).tobytes())
    y, _ = read_wav(p8)
    np.testing.assert_allclose(y, x, atol=1.5e-2)  # 8-bit quantization
    # file-like object == path (serving request-body path)
    with open(p32, "rb") as f:
        data = f.read()
    y2, sr2 = read_wav(io.BytesIO(data))
    np.testing.assert_array_equal(y2, read_wav(p32)[0])
    # the serving decoder delegates to read_wav (one source of truth)
    from s2i_tpu.serving import _decode_wav_bytes

    y3 = _decode_wav_bytes(data, 16000)
    np.testing.assert_allclose(y3, x, atol=1e-6)


def test_tone_synthesize_process_stable():
    """Fixture audio must be identical across interpreter runs: built-in
    hash() is salted per process (PYTHONHASHSEED), so the generator derives
    seeds from crc32 instead."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        f"import sys; sys.path.insert(0, {repo!r});"
        "from tools.synthesize_speech import tone_synthesize;"
        "import hashlib; x = tone_synthesize('a bird with red wings', 16000);"
        "print(hashlib.sha1(x.tobytes()).hexdigest())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            check=True,
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1, f"tone fixture differs across processes: {outs}"


def test_split_loading(fake_dataset):
    split = StackGanSplit(fake_dataset, "train")
    assert len(split) == N_IMG
    assert split.embeddings.shape == (N_IMG, N_CAP, EMB)
    assert split.captions_per_image == N_CAP
    img = split.load_image(0, 256, np.random.default_rng(0))
    assert img.shape == (256, 256, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    wav = split.load_wav(0, 1, 16000)
    assert wav.shape == (8000,)


def test_multiscale_consistency():
    rng = np.random.default_rng(0)
    top = rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32)
    scales = multiscale(top, 3)
    assert [s.shape[0] for s in scales] == [64, 128, 256]
    # area pooling preserves the mean
    np.testing.assert_allclose(scales[0].mean(), top.mean(), atol=1e-5)


def test_gan_epoch_iterator(fake_dataset):
    split = StackGanSplit(fake_dataset, "train")
    batches = list(GanEpochIterator(split, 4, 3, seed=1))
    assert len(batches) == N_IMG // 4
    b = batches[0]
    assert [im.shape for im in b["images"]] == [
        (4, 64, 64, 3),
        (4, 128, 128, 3),
        (4, 256, 256, 3),
    ]
    assert b["embedding"].shape == (4, EMB)
    # different seeds shuffle differently
    b2 = next(iter(GanEpochIterator(split, 4, 3, seed=2)))
    assert not np.allclose(b["embedding"], b2["embedding"])


def test_speech_epoch_iterator(fake_dataset):
    split = StackGanSplit(fake_dataset, "train")
    it = SpeechEpochIterator(split, 4, 16000, max_samples=10000, seed=0)
    b = next(iter(it))
    assert b["wav"].shape == (4, 10000)
    assert (b["wav_len"] == 8000).all()
    assert (b["wav"][:, 8000:] == 0).all()
    assert b["teacher"].shape == (4, EMB)


def test_frontend_consumes_speech_batches(fake_dataset):
    import jax.numpy as jnp

    from s2i_tpu.audio import FrontendParams, extract_features

    split = StackGanSplit(fake_dataset, "train")
    p = FrontendParams(max_frames=64)
    it = SpeechEpochIterator(split, 4, p.sample_rate, 10000, seed=0)
    b = next(iter(it))
    feats, mask = extract_features(
        jnp.asarray(b["wav"]), p, wav_len=jnp.asarray(b["wav_len"])
    )
    assert feats.shape == (4, 64, 40)
    n_valid = int(mask[0].sum())
    # 8000 samples -> 1 + (8000-400)//160 = 48 valid frames
    assert n_valid == 48


def test_grain_pipeline(fake_dataset):
    from s2i_tpu.data.grain_pipeline import make_grain_gan_dataset

    split = StackGanSplit(fake_dataset, "train")
    ds = make_grain_gan_dataset(split, 4, 2, seed=5)
    batches = list(ds)
    assert len(batches) == N_IMG // 4
    b = batches[0]
    assert b["images"][1].shape == (4, 128, 128, 3)
    assert b["embedding"].shape == (4, EMB)
    # deterministic across re-iterations with the same seed
    b2 = next(iter(make_grain_gan_dataset(split, 4, 2, seed=5)))
    np.testing.assert_array_equal(b["embedding"], b2["embedding"])


def test_grain_source_redraws_augmentation_per_epoch(fake_dataset):
    """The factory passes seed=SEED+epoch: the per-example transform must
    RE-DRAW crop/flip and the caption choice each epoch (regression: the
    rng was keyed by index alone, freezing one caption of 10 and one
    augmentation per image for the entire run)."""
    from s2i_tpu.data.grain_pipeline import _GanSource

    split = StackGanSplit(fake_dataset, "train")
    a = _GanSource(split, 2, 64, seed=0)
    b = _GanSource(split, 2, 64, seed=1)
    a2 = _GanSource(split, 2, 64, seed=0)
    # same seed → byte-identical example (Grain determinism contract)
    ea, ea2 = a[0], a2[0]
    np.testing.assert_array_equal(ea["images"][-1], ea2["images"][-1])
    np.testing.assert_array_equal(ea["embedding"], ea2["embedding"])
    # across epochs (different seeds) SOME example must see a different
    # caption and a different crop/flip
    diff_cap = any(
        not np.array_equal(a[i]["embedding"], b[i]["embedding"])
        for i in range(len(split))
    )
    diff_img = any(
        not np.array_equal(a[i]["images"][-1], b[i]["images"][-1])
        for i in range(len(split))
    )
    assert diff_cap, "caption choice frozen across epochs"
    assert diff_img, "augmentation frozen across epochs"


def test_embedding_extraction_writes_consumable_pickles(fake_dataset, tmp_path):
    """SURVEY.md §3.2: pretrained encoder -> speech-embeddings.pickle for
    BOTH splits -> GAN dataset consumes them via TEXT.EMBEDDING_FILE. This
    is the only coupling between the two halves when not joint-training."""
    import jax
    from s2i_tpu import cli, config
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    cfg = config.default_cfg()
    cfg.DATA_DIR = fake_dataset
    cfg.TEXT.DIMENSION = EMB
    cfg.ENCODER.CONV_CHANNELS = [8]
    cfg.ENCODER.RNN_HIDDEN = 8
    cfg.ENCODER.CLS_HEAD = False
    cfg.ENCODER.BATCH_SIZE = 4
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.DTYPE.COMPUTE = "float32"

    # materialize an encoder checkpoint (no training needed for plumbing)
    model = enc_train.build_encoder(cfg)
    dummy = {
        "feats": np.zeros((1, 32, 8), np.float32),
        "feat_mask": np.ones((1, 32), bool),
    }
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), dummy)
    mgr = CheckpointManager(str(tmp_path / "enc"))
    mgr.save(1, state, force=True)
    mgr.wait()
    mgr.close()

    cli.run_embedding_extraction(cfg, str(tmp_path / "enc"), "speech-embeddings.pickle")

    for split_name in ("train", "test"):
        p = os.path.join(fake_dataset, split_name, "speech-embeddings.pickle")
        assert os.path.exists(p)
        emb = pickle.load(open(p, "rb"))
        assert emb.shape == (N_IMG, N_CAP, EMB)
        assert np.isfinite(emb).all()
        # embeddings vary across captions (not degenerate)
        assert not np.allclose(emb[0, 0], emb[0, 1])

    # the GAN loader consumes them
    split = StackGanSplit(
        fake_dataset, "train", embedding_file="speech-embeddings.pickle"
    )
    b = next(iter(GanEpochIterator(split, 4, 2, seed=0)))
    assert b["embedding"].shape == (4, EMB)


def test_grain_mp_prefetch_matches_in_process(fake_dataset):
    """DATA.GRAIN_WORKERS>0 decodes in worker processes; batches must be
    bit-identical to the in-process path (per-example index-derived rng)."""
    from s2i_tpu.data.grain_pipeline import make_grain_gan_dataset

    split = StackGanSplit(fake_dataset, "train")
    inproc = list(make_grain_gan_dataset(split, 2, 2, seed=3, num_workers=0))
    mp = list(make_grain_gan_dataset(split, 2, 2, seed=3, num_workers=2))
    assert len(inproc) == len(mp)
    for a, b in zip(inproc, mp):
        np.testing.assert_array_equal(a["embedding"], b["embedding"])
        np.testing.assert_array_equal(a["class_id"], b["class_id"])
        for s in range(2):
            np.testing.assert_array_equal(a["images"][s], b["images"][s])


def test_gan_batch_factory_pipeline_selection(fake_dataset):
    """cfg.DATA.PIPELINE routes L1: grain and pil produce trainer-ready
    batches; unknown values fail loudly."""
    from s2i_tpu import cli, config

    def cfg_with(pipeline):
        c = config.default_cfg()
        c.DATASET_NAME = "birds"
        c.DATA_DIR = fake_dataset
        c.TEXT.DIMENSION = EMB
        c.TREE.BRANCH_NUM = 2
        c.TRAIN.BATCH_SIZE = 2
        c.DATA.PIPELINE = pipeline
        return c

    for pipeline in ("grain", "pil", "native"):
        # product defaults: uint8 pixels, top scale only (the jitted step
        # normalizes and derives the pyramid on device)
        factory = cli.gan_batch_factory(cfg_with(pipeline))
        b = next(iter(factory(0)))
        assert len(b["images"]) == 1, pipeline
        assert b["images"][0].shape == (2, 128, 128, 3), pipeline
        assert b["images"][0].dtype == np.uint8, pipeline
        assert b["embedding"].shape == (2, EMB), pipeline

        # reference layout on request
        c = cfg_with(pipeline)
        c.DATA.SHIP_SCALES = "all"
        c.DATA.IMAGE_DTYPE = "float32"
        b = next(iter(cli.gan_batch_factory(c)(0)))
        assert b["images"][1].shape == (2, 128, 128, 3), pipeline
        assert b["images"][0].dtype == np.float32, pipeline

    with pytest.raises(ValueError):
        cli.gan_batch_factory(cfg_with("bogus"))


def test_uint8_image_pipeline_matches_float(fake_dataset):
    """DATA.IMAGE_DTYPE=uint8 ships raw [0,255] bytes; after the device-side
    normalize they must agree with the float32 path within quantization
    (same crops/flips — both paths consume the same rng stream)."""
    from s2i_tpu.train.gan import normalize_images

    split = StackGanSplit(fake_dataset, "train")
    bf = next(iter(GanEpochIterator(split, 4, 3, seed=7, use_native=False)))
    bu = next(
        iter(
            GanEpochIterator(
                split, 4, 3, seed=7, use_native=False, image_dtype="uint8"
            )
        )
    )
    assert all(im.dtype == np.uint8 for im in bu["images"])
    normed = normalize_images(bu["images"])
    for f32, u8n in zip(bf["images"], normed):
        assert u8n.dtype == np.float32 or str(u8n.dtype) == "float32"
        np.testing.assert_allclose(
            f32, np.asarray(u8n), atol=1.01 / 127.5
        )  # ±1 pixel-step quantization


def test_uint8_native_loader_matches_float(fake_dataset):
    """The C++ loader's uint8 entry equals its float32 entry up to the final
    quantization (identical decode/crop/flip/pool math)."""
    from s2i_tpu import native

    if not native.native_available():
        pytest.skip("native loader unavailable")
    split = StackGanSplit(fake_dataset, "train")
    paths = [split.image_path(i) for i in range(4)]
    outs_f, fail_f = native.load_batch(
        paths, None, 256, 3, seed=5, augment=True, dtype="float32"
    )
    outs_u, fail_u = native.load_batch(
        paths, None, 256, 3, seed=5, augment=True, dtype="uint8"
    )
    assert fail_f == fail_u == 0
    for f32, u8 in zip(outs_f, outs_u):
        assert u8.dtype == np.uint8
        np.testing.assert_allclose(
            f32, u8.astype(np.float32) / 127.5 - 1.0, atol=1.01 / 127.5
        )


def test_native_fast_decode(fake_dataset):
    """DATA.FAST_DECODE (DCT-scaled decode): bit-identical whenever the
    crop region does not cover the resize target (the scale rounds up to
    8/8 — a full decode), and a bounded approximation when a power-of-two
    scale triggers (300² source at imsize=64 → 4/8 decode)."""
    from s2i_tpu import native

    if not native.native_available():
        pytest.skip("native loader unavailable")
    split = StackGanSplit(fake_dataset, "train")
    paths = [split.image_path(i) for i in range(4)]

    # 300² < load_size 304 at imsize=256: fast must take the full-decode
    # path and match the exact loader bit for bit.
    exact, _ = native.load_batch(
        paths, None, 256, 1, seed=5, augment=True, dtype="uint8"
    )
    fast, _ = native.load_batch(
        paths, None, 256, 1, seed=5, augment=True, dtype="uint8",
        fast_decode=True,
    )
    np.testing.assert_array_equal(exact[0], fast[0])

    # imsize=64 (load_size 76): the 4/8 scale triggers. Deterministic,
    # same crop/flip draws, and close to the full-res transform (the
    # fixture is uniform noise — the worst case for any decode
    # approximation; natural images sit far below this bound).
    exact, _ = native.load_batch(
        paths, None, 64, 1, seed=5, augment=True, dtype="uint8"
    )
    fast, _ = native.load_batch(
        paths, None, 64, 1, seed=5, augment=True, dtype="uint8",
        fast_decode=True,
    )
    fast2, _ = native.load_batch(
        paths, None, 64, 1, seed=5, augment=True, dtype="uint8",
        fast_decode=True,
    )
    np.testing.assert_array_equal(fast[0], fast2[0])
    diff = np.abs(exact[0].astype(np.int32) - fast[0].astype(np.int32))
    assert diff.mean() < 48, diff.mean()  # noise fixture: loose bound


def test_synthetic_uint8_batches():
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.train.gan import normalize_images

    ds_f = SyntheticGanDataset(num_classes=2, examples_per_class=2, seed=3)
    ds_u = SyntheticGanDataset(
        num_classes=2, examples_per_class=2, seed=3, image_dtype="uint8"
    )
    bf = ds_f.batch(np.arange(4))
    bu = ds_u.batch(np.arange(4))
    for f32, u8 in zip(bf["images"], bu["images"]):
        assert u8.dtype == np.uint8
        np.testing.assert_allclose(
            f32, np.asarray(normalize_images([u8])[0]), atol=1.01 / 127.5
        )


def test_ship_top_only_iterator(fake_dataset):
    """ship_scales='top' yields a 1-tuple with only the largest scale, for
    both the PIL and native loader paths, and the device-side pyramid
    matches the host pyramid within quantization."""
    from s2i_tpu.train.gan import expand_image_pyramid, normalize_images

    split = StackGanSplit(fake_dataset, "train")
    b_all = next(
        iter(GanEpochIterator(split, 4, 3, seed=9, use_native=False))
    )
    b_top = next(
        iter(
            GanEpochIterator(
                split, 4, 3, seed=9, use_native=False, ship_scales="top"
            )
        )
    )
    assert len(b_top["images"]) == 1
    assert b_top["images"][0].shape == (4, 256, 256, 3)
    derived = expand_image_pyramid(normalize_images(b_top["images"]), 3)
    for host, dev in zip(b_all["images"], derived):
        np.testing.assert_allclose(host, np.asarray(dev), atol=2e-5)


def test_prefetch_early_break_reaps_producer_thread():
    """An early-stopping consumer (max_steps windows, eval-chunked certs)
    must leave no live producer thread behind: a daemon worker abandoned
    inside native dispatch aborts the process at interpreter shutdown
    ("FATAL: exception not rethrown"), so close() joins after stopping."""
    from s2i_tpu.data.pipeline import Prefetcher

    p = Prefetcher(iter(range(100)), depth=2)
    for x in iter(p):
        assert x == 0
        break  # finalizes the iterator -> close() -> bounded join
    assert not p._thread.is_alive()

    # and close() stays idempotent after a normal full drain
    p2 = Prefetcher(iter(range(3)), depth=2)
    assert list(iter(p2)) == [0, 1, 2]
    assert not p2._thread.is_alive()
    p2.close()
