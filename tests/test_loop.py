"""Trainer-driver tests: end-to-end train loop on synthetic data, crash
auto-resume from Orbax, sampling tree output, NaN guard, CLI smoke via
subprocess on the CPU backend (SURVEY.md §4 "Integration", §5 rows)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from s2i_tpu import config
from s2i_tpu.cli import gan_batch_factory
from s2i_tpu.train.loop import GanTrainer


def tiny_cfg(**kw):
    c = config.default_cfg()
    c.DATASET_NAME = "synthetic"
    c.TREE.BRANCH_NUM = 1
    c.GAN.GF_DIM = 8
    c.GAN.DF_DIM = 8
    c.GAN.Z_DIM = 16
    c.GAN.EMBEDDING_DIM = 16
    c.TEXT.DIMENSION = 32
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.MAX_EPOCH = 1
    c.TRAIN.SNAPSHOT_INTERVAL = 8
    c.DTYPE.COMPUTE = "float32"
    for k, v in kw.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c


def test_trainer_runs_and_resumes(tmp_path):
    cfg = tiny_cfg()
    out = str(tmp_path / "run")
    t1 = GanTrainer(cfg, out, gan_batch_factory(cfg), image_every=8)
    t1.train(max_epoch=1)
    steps_after_first = int(t1.state.step)
    t1.close()
    assert steps_after_first == 16  # 128 examples / batch 8

    # same output dir → restores latest checkpoint and continues.
    # max_epoch counts TOTAL epochs (reference MAX_EPOCH semantics): the
    # already-complete 1-epoch job is a no-op; max_epoch=2 trains the
    # remaining epoch.
    t2 = GanTrainer(cfg, out, gan_batch_factory(cfg), image_every=1000)
    assert int(t2.state.step) == steps_after_first
    t2.train(max_epoch=1)
    assert int(t2.state.step) == steps_after_first  # no-op: job complete
    t2.train(max_epoch=2)
    assert int(t2.state.step) == 2 * steps_after_first
    t2.close()

    assert os.path.exists(os.path.join(out, "scalars.jsonl"))
    grids = os.listdir(os.path.join(out, "images"))
    assert any(g.endswith(".png") for g in grids)


def test_resume_is_bitwise_equal_to_uninterrupted_run(tmp_path):
    """Checkpoint COMPLETENESS: a run interrupted at an epoch boundary and
    resumed must land bitwise equal to the uninterrupted run — per-step rng
    is fold_in(base_rng, state.step) and batches are (SEED, epoch)-seeded,
    so any state leaf missing from the Orbax checkpoint (params, both
    optimizer states, BN stats, EMA, step) shows up as a float diff here.
    The progress sidecar aligns the resumed data stream automatically —
    production resume IS the tested path, no epoch offset needed."""
    cfg = tiny_cfg()
    factory = gan_batch_factory(cfg)

    ta = GanTrainer(
        cfg, str(tmp_path / "straight"), factory, image_every=10**6
    )
    ta.train(max_epoch=2)
    state_a = jax.device_get(ta.state)
    ta.close()

    out_b = str(tmp_path / "interrupted")
    tb = GanTrainer(cfg, out_b, factory, image_every=10**6)
    tb.train(max_epoch=1)  # SNAPSHOT_INTERVAL=8 → saved at step 16
    tb.close()
    tb2 = GanTrainer(cfg, out_b, factory, image_every=10**6)
    assert int(tb2.state.step) == 16  # restored, not re-initialized
    tb2.train(max_epoch=2)  # completes the remaining epoch
    state_b = jax.device_get(tb2.state)
    tb2.close()

    _assert_states_bitwise_equal(state_a, state_b)


def _assert_states_bitwise_equal(state_a, state_b):
    leaves_a, treedef_a = jax.tree.flatten(state_a)
    leaves_b, treedef_b = jax.tree.flatten(state_b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_mid_epoch_resume_is_bitwise_equal(tmp_path):
    """Preemption at an ARBITRARY step (not an epoch boundary): the
    progress sidecar records (epoch, step_in_epoch) with every checkpoint
    and resume fast-forwards the deterministic batch stream past the
    consumed prefix — the resumed run must be bitwise identical to the
    uninterrupted one, including the mid-epoch data order."""
    cfg = tiny_cfg()
    factory = gan_batch_factory(cfg)

    ta = GanTrainer(
        cfg, str(tmp_path / "straight"), factory, image_every=10**6
    )
    ta.train(max_epoch=2)  # 32 steps total (16/epoch)
    state_a = jax.device_get(ta.state)
    ta.close()

    out_b = str(tmp_path / "interrupted")
    tb = GanTrainer(cfg, out_b, factory, image_every=10**6)
    tb.train(max_epoch=2, max_steps=21)  # stops 5 steps into epoch 1
    assert int(tb.state.step) == 21
    tb.close()
    tb2 = GanTrainer(cfg, out_b, factory, image_every=10**6)
    assert int(tb2.state.step) == 21
    tb2.train(max_epoch=2)
    assert int(tb2.state.step) == 32
    state_b = jax.device_get(tb2.state)
    tb2.close()

    _assert_states_bitwise_equal(state_a, state_b)


def test_mesh_trainer_resume_bitwise(tmp_path):
    """Checkpoint round-trip THROUGH the mesh path (the production
    multi-chip topology): the sharded state is saved by the async Orbax
    manager, restored into the host-side template, and re-replicated onto
    the mesh — an 8-way run interrupted mid-epoch must be bitwise equal to
    the uninterrupted 8-way run, leaf for leaf. Covers the
    save(sharded) → restore(host) → replicate_state chain no other test
    exercises."""
    from s2i_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()), "data")
    cfg = tiny_cfg()
    factory = gan_batch_factory(cfg)

    ta = GanTrainer(
        cfg, str(tmp_path / "straight"), factory, mesh=mesh,
        image_every=10**6,
    )
    ta.train(max_epoch=1)  # 16 steps
    state_a = jax.device_get(ta.state)
    ta.close()

    out_b = str(tmp_path / "interrupted")
    tb = GanTrainer(cfg, out_b, factory, mesh=mesh, image_every=10**6)
    tb.train(max_epoch=1, max_steps=11)  # stops mid-epoch
    assert int(tb.state.step) == 11
    tb.close()
    tb2 = GanTrainer(cfg, out_b, factory, mesh=mesh, image_every=10**6)
    assert int(tb2.state.step) == 11  # restored through the mesh path
    tb2.train(max_epoch=1)
    assert int(tb2.state.step) == 16
    state_b = jax.device_get(tb2.state)
    tb2.close()

    _assert_states_bitwise_equal(state_a, state_b)


def test_trainer_sample_to_dir(tmp_path):
    cfg = tiny_cfg()
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    emb = np.random.default_rng(0).normal(size=(5, 32)).astype(np.float32)
    t.sample_to_dir(emb, str(tmp_path / "samples"), batch_size=4)
    t.close()
    assert len(os.listdir(tmp_path / "samples")) == 5


def test_eval_state_bn_recalc_knob(tmp_path):
    """EVAL.EMA_BN_RECALC wires gan.make_bn_recalc_fn into the trainer's
    EMA sampling: eval_state returns a state whose G batch_stats were
    re-estimated under the EMA weights (structure preserved, values
    changed) and the sample path consumes it; with the knob off,
    eval_state is the identity."""
    cfg = tiny_cfg(**{"EVAL.EMA_BN_RECALC": 3})
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    t.train(max_epoch=1)
    emb = np.random.default_rng(0).normal(size=(6, 32)).astype(np.float32)
    es = t.eval_state(emb, seed=1)
    same_tree = jax.tree.structure(es.g_stats) == jax.tree.structure(
        t.state.g_stats
    )
    assert same_tree
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(es.g_stats["g"]),
            jax.tree.leaves(t.state.g_stats["g"]),
        )
    )
    assert changed
    # params/opt untouched; only stats swapped
    assert es.g_params is t.state.g_params
    # the production sample path runs on it end-to-end
    t.sample_to_dir(emb, str(tmp_path / "samples"), batch_size=4)
    assert len(os.listdir(tmp_path / "samples")) == 6
    t.close()

    cfg2 = tiny_cfg()
    t2 = GanTrainer(cfg2, str(tmp_path / "run2"), gan_batch_factory(cfg2))
    assert t2.eval_state(emb) is t2.state
    # EMA on + recalc off is the certified-broken combination
    # (docs/QUALITY.md "The EMA collapse") — the production sample path
    # must warn instead of silently pairing averaged weights with
    # raw-trajectory BN stats
    with pytest.warns(UserWarning, match="EMA_BN_RECALC"):
        t2.sample_to_dir(emb, str(tmp_path / "samples2"), batch_size=4)
    t2.close()


def test_debug_nans_guard(tmp_path):
    cfg = tiny_cfg(**{"TRAIN.DEBUG_NANS": True, "TRAIN.GENERATOR_LR": 1.0e6})
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    # absurd lr drives the G loss non-finite within an epoch
    with pytest.raises(FloatingPointError):
        t.train(max_epoch=6)
    t.close()


def test_scalars_jsonl_schema(tmp_path):
    cfg = tiny_cfg()
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg), log_every=8)
    t.train(max_epoch=1)
    t.close()
    lines = open(os.path.join(out, "scalars.jsonl")).read().strip().splitlines()
    rec = json.loads(lines[-1])
    for key in ("step", "g_loss", "d_loss", "kl", "images_per_sec"):
        assert key in rec


@pytest.mark.slow
def test_tensorboard_mirror(tmp_path):
    """TRAIN.TENSORBOARD mirrors the JSONL scalars into event files under
    <run>/tb (the reference's tensorboard logging, SURVEY.md §5)."""
    pytest.importorskip("tensorflow")
    from s2i_tpu.utils import ScalarLogger

    out = str(tmp_path / "run")
    lg = ScalarLogger(out, use_tensorboard=True)
    lg.log(1, {"g_loss": 1.5})
    lg.log(2, {"g_loss": 1.25})
    grid = np.random.default_rng(0).integers(
        0, 256, (16, 24, 3), dtype=np.uint8
    )
    lg.log_image(2, "samples", grid)
    lg.close()
    tb = os.path.join(out, "tb")
    assert os.path.isdir(tb) and any(
        "tfevents" in f for f in os.listdir(tb)
    )
    assert json.loads(
        open(os.path.join(out, "scalars.jsonl")).read().splitlines()[-1]
    )["g_loss"] == 1.25

    # read the events back: both the scalar and the image summary landed
    import tensorflow as tf

    tags = set()
    for f in os.listdir(tb):
        for ev in tf.compat.v1.train.summary_iterator(os.path.join(tb, f)):
            for v in ev.summary.value:
                tags.add(v.tag)
    assert "g_loss" in tags
    assert "samples" in tags

    # TB off: log_image is a no-op, not an error
    lg2 = ScalarLogger(str(tmp_path / "run2"), use_tensorboard=False)
    lg2.log_image(1, "samples", grid)
    lg2.close()
    assert not os.path.isdir(os.path.join(str(tmp_path / "run2"), "tb"))


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    """main.py end-to-end in a subprocess on the CPU backend."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "main.py"),
            "--cfg",
            os.path.join(repo, "cfg", "debug_tiny.yml"),
            "--output_dir",
            str(tmp_path),
            "--set",
            "TRAIN.MAX_EPOCH=1",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    runs = os.listdir(tmp_path)
    assert any("train" in d for d in runs)


def test_speech_to_image_pipeline(tmp_path):
    """wav -> image end-to-end through checkpoints (tiny config)."""
    import jax
    from s2i_tpu.audio.wavio import write_wav
    from s2i_tpu.pipeline import SpeechToImage
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    cfg = tiny_cfg()
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.CLS_HEAD = False

    # train nothing; just materialize checkpoints for both halves
    out = str(tmp_path / "gan")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    t.ckpt.save(0, t.state, force=True)
    t.ckpt.wait()
    t.close()

    model = enc_train.build_encoder(cfg)
    dummy = {
        "feats": np.zeros((1, 32, 8), np.float32),
        "feat_mask": np.ones((1, 32), bool),
    }
    est = enc_train.init_encoder_state(cfg, model, jax.random.key(0), dummy)
    emgr = CheckpointManager(str(tmp_path / "enc"))
    emgr.save(0, est, force=True)
    emgr.wait()
    emgr.close()

    pipe = SpeechToImage.from_checkpoints(
        cfg, str(tmp_path / "enc"), os.path.join(out, "ckpt")
    )
    wav = np.sin(np.linspace(0, 800, 6000)).astype(np.float32)[None]
    imgs = pipe.generate(wav, seed=3)
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs).all()
    # determinism per seed
    np.testing.assert_array_equal(imgs, pipe.generate(wav, seed=3))
    assert not np.allclose(imgs, pipe.generate(wav, seed=4))

    # uint8 output (device-side quantize, what serving reads back) matches
    # host-side to_uint8 of the float output byte-for-byte
    from s2i_tpu.utils.images import to_uint8

    u8 = pipe.generate(wav, seed=3, output_dtype="uint8")
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, to_uint8(imgs))

    # out-of-range stage is rejected, not silently wrapped to stage 0
    # (stage=BRANCH_NUM would otherwise serve the lowest resolution)
    branch = int(cfg.TREE.BRANCH_NUM)
    with pytest.raises(ValueError, match="stage"):
        pipe.generate(wav, seed=3, stage=branch)
    with pytest.raises(ValueError, match="stage"):
        pipe.generate(wav, seed=3, stage=-branch - 1)

    # file path
    wp = str(tmp_path / "a.wav")
    write_wav(wp, wav[0], 16000)
    op = str(tmp_path / "a.png")
    pipe.generate_files([wp], [op])
    assert os.path.exists(op)


def test_speech_to_image_pipeline_joint(tmp_path):
    """Joint-finetuned GAN checkpoints carry 'enc' subtrees in
    g_params/g_stats; from_checkpoints must build the matching restore
    template and serve the embedded fine-tuned encoder — no separate
    encoder checkpoint needed."""
    from s2i_tpu.pipeline import SpeechToImage

    cfg = tiny_cfg()
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.CLS_HEAD = False
    cfg.TRAIN.JOINT_FT = True
    cfg.TRAIN.COEFF.DISTILL = 1.0

    from s2i_tpu.cli import joint_batch_factory

    out = str(tmp_path / "gan")
    t = GanTrainer(cfg, out, joint_batch_factory(cfg))
    assert "enc" in t.state.g_params
    t.ckpt.save(0, t.state, force=True)
    t.ckpt.wait()
    t.close()

    pipe = SpeechToImage.from_checkpoints(cfg, None, os.path.join(out, "ckpt"))
    wav = np.sin(np.linspace(0, 800, 6000)).astype(np.float32)[None]
    imgs = pipe.generate(wav, seed=3)
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs).all()
    np.testing.assert_array_equal(imgs, pipe.generate(wav, seed=3))

    # non-joint cfg without an encoder checkpoint must fail loudly
    cfg2 = tiny_cfg()
    with pytest.raises(ValueError):
        SpeechToImage.from_checkpoints(cfg2, None, os.path.join(out, "ckpt"))


def test_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-training → clean stop with a checkpoint at the
    interrupted step (preemption robustness)."""
    import signal
    import threading

    cfg = tiny_cfg()
    cfg.TRAIN.SNAPSHOT_INTERVAL = 10**9  # only the final save may happen
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    # deliver SIGTERM to ourselves shortly after training starts
    killer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    t.train(max_epoch=50)  # would run 800 steps if not interrupted
    steps = int(t.state.step)
    assert 0 < steps < 800
    assert t.ckpt.latest_step == steps
    t.close()
    killer.cancel()


def test_joint_training_cli_with_encoder_warmstart(tmp_path):
    """Full joint-finetune workflow (SURVEY.md §3.5): distillation-pretrain
    an encoder, then joint GAN training warm-starts from its checkpoint via
    TRAIN.NET_E and updates encoder params."""
    import jax
    from s2i_tpu import cli

    cfg = tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TRAIN.JOINT_FT = True
    cfg.TRAIN.COEFF.DISTILL = 1.0
    cfg.TRAIN.MAX_EPOCH = 1
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.N_CLASSES = 8
    cfg.ENCODER.BATCH_SIZE = 16
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.MESH.NUM_DEVICES = 1  # force single-device jit path

    cfg.ENCODER.LOG_EVERY = 2
    cfg.ENCODER.SNAPSHOT_INTERVAL = 4
    cli.run_encoder_pretrain(cfg, epochs=1)
    enc_run = [d for d in os.listdir(tmp_path) if "encoder" in d][0]
    cfg.TRAIN.NET_E = os.path.join(str(tmp_path), enc_run, "ckpt")

    # step-level observability: multiple JSONL records within one epoch,
    # with throughput, plus a mid-epoch checkpoint (VERDICT r1 item 8)
    scalars = [
        json.loads(line)
        for line in open(
            os.path.join(str(tmp_path), enc_run, "scalars.jsonl")
        )
    ]
    assert len(scalars) >= 2, scalars
    assert all("examples_per_sec" in r and "loss" in r for r in scalars)
    assert scalars[0]["step"] < scalars[-1]["step"]

    mets = cli.run_gan_training(cfg, max_epoch=1)
    assert np.isfinite(mets["g_loss"])
    assert "distill_mse" in mets


def test_encoder_warmstart_rejects_config_drift(tmp_path):
    """TRAIN.NET_E pointing at a pretrain checkpoint whose encoder geometry
    differs from the joint config must fail loudly at graft time (a silent
    partial graft left random subtrees in a run that logged 'warm-started')."""
    from s2i_tpu import cli
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    def joint_cfg(rnn_hidden):
        cfg = tiny_cfg()
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.TRAIN.JOINT_FT = True
        cfg.TRAIN.COEFF.DISTILL = 1.0
        cfg.ENCODER.CONV_CHANNELS = [8, 16]
        cfg.ENCODER.RNN_HIDDEN = rnn_hidden
        cfg.AUDIO.N_MELS = 8
        cfg.AUDIO.MAX_FRAMES = 32
        return cfg

    # encoder checkpoint at RNN_HIDDEN=16 (no pretrain loop needed: the
    # graft reads any EncoderTrainState-shaped checkpoint)
    src_cfg = joint_cfg(16)
    enc = enc_train.build_encoder(src_cfg)
    dummy = {
        "feats": np.zeros((1, 32, 8), np.float32),
        "feat_mask": np.ones((1, 32), np.float32),
    }
    est = enc_train.init_encoder_state(src_cfg, enc, jax.random.key(0), dummy)
    mgr = CheckpointManager(str(tmp_path / "enc_ckpt"))
    mgr.save(0, est, force=True)
    mgr.wait()
    mgr.close()

    bad = joint_cfg(8)  # geometry drift vs the checkpoint
    bad.TRAIN.NET_E = str(tmp_path / "enc_ckpt")
    with pytest.raises(ValueError, match="NET_E"):
        GanTrainer(
            bad, str(tmp_path / "run"), cli.joint_batch_factory(bad)
        )

    # matching geometry still warm-starts
    good = joint_cfg(16)
    good.TRAIN.NET_E = str(tmp_path / "enc_ckpt")
    t = GanTrainer(
        good, str(tmp_path / "run2"), cli.joint_batch_factory(good)
    )
    def check(dst, src):
        for k, v in dst.items():
            if isinstance(v, dict):
                check(v, src[k])
            else:
                np.testing.assert_array_equal(np.asarray(v), np.asarray(src[k]))

    check(t.state.g_params["enc"], dict(est.params))
    t.close()


def test_encoder_pretrain_resume_counts_total_epochs(tmp_path):
    """run_encoder_pretrain(epochs=N, run_dir=existing) resumes from the
    progress sidecar and treats N as TOTAL epochs (GanTrainer.train
    semantics) — a resumed run finishes the remainder instead of
    re-running the consumed prefix (regression: it restarted at epoch 0
    and trained N more)."""
    from s2i_tpu import cli

    cfg = tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.ENCODER.CONV_CHANNELS = [8]
    cfg.ENCODER.RNN_HIDDEN = 8
    cfg.ENCODER.N_CLASSES = 8
    cfg.ENCODER.BATCH_SIZE = 16
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.MESH.NUM_DEVICES = 1
    cfg.ENCODER.LOG_EVERY = 0
    cfg.ENCODER.SNAPSHOT_INTERVAL = 0

    run_dir = str(tmp_path / "enc_run")
    os.makedirs(run_dir)
    cli.run_encoder_pretrain(cfg, epochs=1, run_dir=run_dir)
    prog = json.load(open(os.path.join(run_dir, "train_progress.json")))
    assert prog["epoch"] == 1
    spe = prog["step"]  # steps per epoch at this dataset/batch size
    assert spe > 0

    # resume for a 2-epoch TOTAL: exactly one more epoch runs
    cli.run_encoder_pretrain(cfg, epochs=2, run_dir=run_dir)
    prog = json.load(open(os.path.join(run_dir, "train_progress.json")))
    assert prog["epoch"] == 2 and prog["step"] == 2 * spe

    # already complete: a third call is a no-op
    cli.run_encoder_pretrain(cfg, epochs=2, run_dir=run_dir)
    prog = json.load(open(os.path.join(run_dir, "train_progress.json")))
    assert prog["epoch"] == 2 and prog["step"] == 2 * spe


def test_http_serving_roundtrip(tmp_path):
    """Spin up the HTTP server on a random port, POST a wav, get a PNG."""
    import io
    import threading
    import urllib.request

    import jax
    from s2i_tpu.audio.wavio import write_wav
    from s2i_tpu.pipeline import SpeechToImage
    from s2i_tpu.serving import make_server
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    cfg = tiny_cfg()
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.CLS_HEAD = False

    out = str(tmp_path / "gan")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    t.ckpt.save(0, t.state, force=True)
    t.ckpt.wait()
    t.close()
    model = enc_train.build_encoder(cfg)
    dummy = {
        "feats": np.zeros((1, 32, 8), np.float32),
        "feat_mask": np.ones((1, 32), bool),
    }
    est = enc_train.init_encoder_state(cfg, model, jax.random.key(0), dummy)
    emgr = CheckpointManager(str(tmp_path / "enc"))
    emgr.save(0, est, force=True)
    emgr.wait()
    emgr.close()

    pipe = SpeechToImage.from_checkpoints(
        cfg, str(tmp_path / "enc"), os.path.join(out, "ckpt")
    )
    srv = make_server(pipe, "127.0.0.1", 0, batch_size=2)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert b"ok" in r.read()
        buf = io.BytesIO()
        wav = (0.4 * np.sin(np.linspace(0, 600, 5000))).astype(np.float32)
        wp = str(tmp_path / "req.wav")
        write_wav(wp, wav, 16000)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=open(wp, "rb").read(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        from PIL import Image

        img = Image.open(io.BytesIO(png))
        assert img.size == (64, 64)

        def post_wav(width, payload):
            import wave as _wave

            b = io.BytesIO()
            with _wave.open(b, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(width)
                w.setframerate(16000)
                w.writeframes(payload)
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=b.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(rq, timeout=120) as r:
                return np.asarray(Image.open(io.BytesIO(r.read())), np.int16)

        # int32-PCM body is accepted end-to-end and matches the PCM16 post
        # up to quantization (sample-level decode correctness — the old
        # width==4 float32 reinterpretation collapsing int32 to ~1e-40
        # silence — is asserted in tests/test_data.py::test_wavio_pcm_widths;
        # an untrained tiny model is too audio-insensitive to see it in
        # pixels, so this covers the HTTP route, not the decode math)
        img16 = post_wav(2, (wav * 32767).astype("<i2").tobytes())
        img32 = post_wav(4, (wav * 2147483647).astype("<i4").tobytes())
        assert np.abs(img32 - img16).max() <= 2  # 16- vs 32-bit quantization
    finally:
        srv.shutdown()


def test_profile_dir_writes_trace(tmp_path):
    """TRAIN.PROFILE_DIR captures a jax.profiler trace of steps 5-10."""
    cfg = tiny_cfg()
    cfg.TRAIN.PROFILE_DIR = str(tmp_path / "trace")
    cfg.TRAIN.MAX_EPOCH = 1
    out = str(tmp_path / "run")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    t.train(max_epoch=1)
    t.close()
    # a plugins/profile/<ts>/ tree with at least one trace artifact
    found = []
    for root, _dirs, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no profiler artifacts written"


def test_serving_micro_batches_concurrent_requests(tmp_path):
    """Concurrent POSTs must collate into shared device batches and all get
    correct independent responses."""
    import io
    import threading
    import urllib.request

    import jax
    from s2i_tpu.audio.wavio import write_wav
    from s2i_tpu.pipeline import SpeechToImage
    from s2i_tpu.serving import make_server
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    cfg = tiny_cfg()
    cfg.AUDIO.N_MELS = 8
    cfg.AUDIO.MAX_FRAMES = 32
    cfg.ENCODER.CONV_CHANNELS = [8, 16]
    cfg.ENCODER.RNN_HIDDEN = 16
    cfg.ENCODER.CLS_HEAD = False

    out = str(tmp_path / "gan")
    t = GanTrainer(cfg, out, gan_batch_factory(cfg))
    t.ckpt.save(0, t.state, force=True)
    t.ckpt.wait()
    t.close()
    model = enc_train.build_encoder(cfg)
    est = enc_train.init_encoder_state(
        cfg, model, jax.random.key(0),
        {"feats": np.zeros((1, 32, 8), np.float32),
         "feat_mask": np.ones((1, 32), bool)},
    )
    emgr = CheckpointManager(str(tmp_path / "enc"))
    emgr.save(0, est, force=True)
    emgr.wait()
    emgr.close()

    pipe = SpeechToImage.from_checkpoints(
        cfg, str(tmp_path / "enc"), os.path.join(out, "ckpt")
    )
    srv = make_server(pipe, "127.0.0.1", 0, batch_size=4)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    bodies = []
    for k in range(6):
        wav = (0.4 * np.sin(np.linspace(0, 300 * (k + 1), 4000))).astype(
            np.float32
        )
        wp = str(tmp_path / f"w{k}.wav")
        write_wav(wp, wav, 16000)
        bodies.append(open(wp, "rb").read())

    results = [None] * 6

    def post(k):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=bodies[k], method="POST"
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            results[k] = r.read()

    threads = [threading.Thread(target=post, args=(k,)) for k in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    try:
        from PIL import Image

        imgs = []
        for k, png in enumerate(results):
            assert png is not None and png[:8] == b"\x89PNG\r\n\x1a\n", k
            imgs.append(np.asarray(Image.open(io.BytesIO(png))))
        # different inputs -> different outputs (no response mix-up/aliasing)
        assert not np.array_equal(imgs[0], imgs[5])
    finally:
        srv.shutdown()
