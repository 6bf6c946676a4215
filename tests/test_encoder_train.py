"""Distillation pretrain tests (SURVEY.md §4): loss decreases on the
synthetic corpus; extraction is deterministic and batch-size invariant;
checkpoint save/restore round-trips the full state."""

import os
import numpy as np
import jax
import jax.numpy as jnp

from s2i_tpu import config
from s2i_tpu.data import SyntheticSpeechDataset
from s2i_tpu.train import encoder as enc_train
from s2i_tpu.utils import CheckpointManager


def tiny_cfg():
    c = config.default_cfg()
    c.TEXT.DIMENSION = 32
    c.ENCODER.CONV_CHANNELS = [8, 16]
    c.ENCODER.RNN_HIDDEN = 16
    c.ENCODER.N_CLASSES = 4
    c.ENCODER.LR = 3.0e-3
    c.AUDIO.N_MELS = 8
    c.AUDIO.MAX_FRAMES = 32
    c.DTYPE.COMPUTE = "float32"
    return c


def make_ds(cfg):
    return SyntheticSpeechDataset(
        num_classes=4,
        examples_per_class=8,
        max_frames=int(cfg.AUDIO.MAX_FRAMES),
        n_mels=int(cfg.AUDIO.N_MELS),
        emb_dim=int(cfg.TEXT.DIMENSION),
    )


def test_distillation_loss_decreases():
    cfg = tiny_cfg()
    model = enc_train.build_encoder(cfg)
    ds = make_ds(cfg)
    batch = ds.batch(np.arange(16))
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), batch)
    step = jax.jit(enc_train.make_encoder_train_step(cfg, model))
    first = None
    for b in ds.batches(16, 60):
        state, mets = step(state, b, jax.random.key(0))
        if first is None:
            first = float(mets["mse"])
    last = float(mets["mse"])
    assert np.isfinite(last)
    assert last < 0.5 * first, f"mse {first} -> {last}: no learning"
    assert "cls_acc" in mets


def test_extract_deterministic_and_batchsize_invariant():
    cfg = tiny_cfg()
    model = enc_train.build_encoder(cfg)
    ds = make_ds(cfg)
    batch = ds.batch(np.arange(8))
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), batch)
    e1 = enc_train.extract_all(model, state, ds.feats, ds.mask, batch_size=8)
    e2 = enc_train.extract_all(model, state, ds.feats, ds.mask, batch_size=5)
    assert e1.shape == (ds.n, 32)
    np.testing.assert_allclose(e1, e2, rtol=2e-5, atol=2e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = enc_train.build_encoder(cfg)
    ds = make_ds(cfg)
    batch = ds.batch(np.arange(8))
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), batch)
    step = jax.jit(enc_train.make_encoder_train_step(cfg, model))
    state, _ = step(state, batch, jax.random.key(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(int(state.step), state)
    mgr.wait()
    restored, rstep = mgr.restore_latest(state)
    assert rstep == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_image_grid_and_logger(tmp_path):
    from s2i_tpu.utils import save_image_grid, to_uint8, ScalarLogger

    imgs = np.random.default_rng(0).uniform(-1, 1, (5, 16, 16, 3)).astype(
        np.float32
    )
    p = tmp_path / "grid.png"
    save_image_grid(imgs, str(p), nrow=3)
    assert p.exists() and p.stat().st_size > 0
    assert to_uint8(np.array([[-1.0, 1.0]])).tolist() == [[0, 255]]

    lg = ScalarLogger(str(tmp_path))
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": jnp.asarray(0.25)})
    lg.close()
    lines = (tmp_path / "scalars.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2


def test_checkpoint_keep_n_retention(tmp_path):
    cfg = tiny_cfg()
    model = enc_train.build_encoder(cfg)
    ds = make_ds(cfg)
    state = enc_train.init_encoder_state(
        cfg, model, jax.random.key(0), ds.batch(np.arange(8))
    )
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(step, state.replace(step=jnp.asarray(step)), force=True)
    mgr.wait()
    assert mgr.latest_step == 4
    restored, s = mgr.restore_latest(state)
    assert s == 4 and int(restored.step) == 4
    # only the newest two survive
    kept = sorted(
        int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit()
    )
    assert kept == [3, 4]
    mgr.close()
