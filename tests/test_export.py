"""AOT export artifacts (s2i_tpu/export.py): the serialized StableHLO
program must reproduce the live pipeline bit-for-bit, survive a
serialize→deserialize round trip through disk with no model code, batch-pad
correctly, and refuse mismatched stage/output-dtype/platform requests."""

import json
import os

import numpy as np
import jax
import pytest

from s2i_tpu import config
from s2i_tpu.export import export_pipeline, load
from s2i_tpu.pipeline import SpeechToImage
from s2i_tpu.train import encoder as enc_train
from s2i_tpu.train import gan as gan_train


def _tiny_pipe():
    cfg = config.default_cfg()
    cfg.DATASET_NAME = "synthetic"
    cfg.TREE.BRANCH_NUM = 1
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.GAN.Z_DIM = 16
    cfg.GAN.EMBEDDING_DIM = 16
    cfg.TEXT.DIMENSION = 32
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.DTYPE.COMPUTE = "float32"
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.CLS_HEAD = False

    model = enc_train.build_encoder(cfg)
    dummy = {
        "feats": np.zeros((1, 32, 8), np.float32),
        "feat_mask": np.ones((1, 32), bool),
    }
    enc_state = enc_train.init_encoder_state(
        cfg, model, jax.random.key(0), dummy
    )
    models = gan_train.build_models(cfg)
    b = 2
    batch = {
        "images": (np.random.default_rng(0)
                   .standard_normal((b, 64, 64, 3)).astype(np.float32),),
        "embedding": np.zeros((b, 32), np.float32),
    }
    gan_state = gan_train.init_state(
        cfg, models, jax.random.key(1), batch
    )
    return SpeechToImage(cfg, enc_state, gan_state)


def _max_samples(pipe):
    p = pipe.p
    return (p.max_frames - 1) * p.hop_length + p.win_length


def _wavs(n, length):
    # full exported length so the live pipe and the artifact see the
    # identical zero-padded input (the artifact pads internally)
    rng = np.random.default_rng(7)
    t = np.linspace(0, 60.0, length)
    return (np.sin(np.outer(np.arange(1, n + 1), t))
            + 0.01 * rng.standard_normal((n, length))).astype(np.float32)


def test_export_roundtrip_matches_live_pipeline(tmp_path):
    pipe = _tiny_pipe()
    out = str(tmp_path / "artifact")
    meta = export_pipeline(pipe, out, batch_sizes=(2, 4), quantize=True)
    assert meta["batch_sizes"] == [2, 4]
    assert meta["output_dtype"] == "uint8"
    assert os.path.exists(os.path.join(out, "model_b2.shlo"))
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["format_version"] == meta["format_version"]

    loaded = load(out)
    wav = _wavs(2, _max_samples(pipe))
    lens = np.full((2,), wav.shape[1], np.int32)
    got = loaded.generate(wav, lens, seed=3)
    want = pipe.generate(wav, lens, seed=3, output_dtype="uint8")
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)
    # drop-in contract extends to seeds the live pipeline accepts: a
    # negative seed must not raise from the artifact's uint32 chunk-seed
    # derivation (NumPy 2 rejects np.uint32(-1)); -1 & 0xFFFFFFFF folds to
    # int32 -1 == the live pipeline's key(-1)
    np.testing.assert_array_equal(
        loaded.generate(wav, lens, seed=-1),
        pipe.generate(wav, lens, seed=-1, output_dtype="uint8"),
    )


def test_export_batch_padding(tmp_path):
    """B=3 requests pad up to the exported b4 program; rows beyond the
    request are trimmed and real rows are unaffected by the padding."""
    pipe = _tiny_pipe()
    out = str(tmp_path / "artifact")
    export_pipeline(pipe, out, batch_sizes=(4,), quantize=True)
    loaded = load(out)
    wav = _wavs(3, _max_samples(pipe))
    got = loaded.generate(wav, seed=5)
    want = pipe.generate(
        np.concatenate([wav, np.zeros((1, wav.shape[1]), np.float32)]),
        None, seed=5, output_dtype="uint8",
    )[:3]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_export_chunked_requests_draw_distinct_latents(tmp_path):
    """B larger than every exported batch splits into chunks; each chunk
    must advance the seed (seed + i*2654435761, mod 2^32) or identical
    wavs in different chunks would render byte-identical images — and the
    derivation must not alias ADJACENT user seeds (with seed+i, a seed=7
    call's chunk 1 reuses a seed=8 call's chunk-0 draws)."""
    pipe = _tiny_pipe()
    out = str(tmp_path / "artifact")
    export_pipeline(pipe, out, batch_sizes=(2,), quantize=True)
    loaded = load(out)
    one = _wavs(1, _max_samples(pipe))
    wav = np.concatenate([one, one, one, one])  # 4 identical rows → 2 chunks
    got = loaded.generate(wav, seed=7)
    assert got.shape[0] == 4
    # within a chunk, rows 0/1 share the wav but draw different z already;
    # ACROSS chunks rows 0 and 2 must differ too (the regression case)
    assert not np.array_equal(got[0], got[2])
    # chunk 0 is the caller's seed (single-chunk bit-equality contract);
    # chunk 1 equals the live pipe at the derived chunk seed
    seed1 = int(np.int32(np.uint32(7) + np.uint32(2654435761)))
    want0 = pipe.generate(wav[:2], None, seed=7, output_dtype="uint8")
    want1 = pipe.generate(wav[2:], None, seed=seed1, output_dtype="uint8")
    np.testing.assert_array_equal(got[:2], want0)
    np.testing.assert_array_equal(got[2:], want1)
    # adjacent-seed independence: seed=8's first chunk must NOT reproduce
    # seed=7's second chunk (the seed+i aliasing this derivation removes)
    got8 = loaded.generate(wav, seed=8)
    assert not np.array_equal(got8[:2], got[2:])


def test_loaded_artifact_drops_into_serving_batcher(tmp_path):
    """LoadedPipeline presents the live pipeline's serving surface
    (``.p`` frame geometry + ``generate(..., output_dtype='uint8')``), so
    serving.Batcher collates against it unchanged."""
    from s2i_tpu.serving import Batcher

    pipe = _tiny_pipe()
    out = str(tmp_path / "artifact")
    export_pipeline(pipe, out, batch_sizes=(2,), quantize=True)
    loaded = load(out)
    assert loaded.p.sample_rate == pipe.p.sample_rate
    assert loaded.p.hop_length == pipe.p.hop_length

    batcher = Batcher(loaded, batch_size=2, wait_ms=1)
    try:
        wav = _wavs(1, _max_samples(pipe))[0]
        job = batcher.submit(wav)
        assert job.done.wait(timeout=120)
        assert job.error is None
        assert job.result.dtype == np.uint8
        assert job.result.ndim == 3 and job.result.shape[-1] == 3
    finally:
        batcher.close()


def test_export_refuses_mismatches(tmp_path):
    pipe = _tiny_pipe()
    out = str(tmp_path / "artifact")
    export_pipeline(pipe, out, batch_sizes=(2,), quantize=True)
    loaded = load(out)
    wav = _wavs(1, _max_samples(pipe))
    with pytest.raises(ValueError, match="re-export"):
        loaded.generate(wav, output_dtype="float32")

    # platform mismatch: corrupt meta to claim a platform we are not on
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    meta["platforms"] = ["nonexistent_backend"]
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="backend"):
        load(out)
