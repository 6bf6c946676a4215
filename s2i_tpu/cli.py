"""CLI plumbing shared by ``main.py`` and ``scripts/*`` (SURVEY.md §1 L4;
reference ``main.py`` argparse + ``cfg/*.yml``): config resolution, run-dir
setup, dataset/batch-factory construction, and the train/sample/pretrain/
extract drivers.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np

from s2i_tpu import config


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg", dest="cfg_file", default=None, help="YAML config")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--manualSeed", type=int, default=None)
    p.add_argument(
        "--gpu", dest="gpu_id", default=None, help="parity flag; ignored on TPU"
    )
    p.add_argument(
        "--set",
        dest="overrides",
        nargs="*",
        default=[],
        metavar="KEY=VAL",
        help="config overrides, e.g. TRAIN.BATCH_SIZE=32",
    )
    return p


def resolve_cfg(args) -> config.AttrDict:
    cfg = (
        config.cfg_from_file(args.cfg_file)
        if args.cfg_file
        else config.default_cfg()
    )
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.manualSeed is not None:
        cfg.SEED = args.manualSeed
    if args.overrides:
        config.apply_overrides(cfg, args.overrides)
    return cfg


def make_run_dir(cfg, tag: str) -> str:
    """Timestamped output tree like the reference's output/<name>_<time>."""
    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    run_dir = os.path.join(
        cfg.OUTPUT_DIR, f"{cfg.DATASET_NAME}_{cfg.CONFIG_NAME}_{tag}_{stamp}"
    )
    os.makedirs(run_dir, exist_ok=True)
    config.dump_cfg(cfg, os.path.join(run_dir, "config.yml"))
    return run_dir


def make_mesh_if_configured(cfg):
    import jax

    from s2i_tpu.parallel import make_mesh

    n = int(cfg.MESH.NUM_DEVICES)
    n_avail = len(jax.devices())
    if n == 0:
        if n_avail == 1:
            return None  # single chip: plain jit, no shard_map overhead
        # Auto mesh: largest DIVISOR of the device count that also divides
        # the global batch. The sharded step is exactly equal to the
        # single-device step (tests/test_parallel.py psum-correctness), so
        # shrinking the mesh only costs parallelism — but only divisor-sized
        # submeshes are considered: an awkward 6-of-8 mesh would idle
        # devices AND create sizes the rest of the stack never sees.
        b = int(cfg.TRAIN.BATCH_SIZE)
        n = n_avail
        while n > 1 and (b % n or n_avail % n):
            n -= 1
        if n < n_avail:
            print(
                f"mesh: using {n}/{n_avail} devices (largest divisor of "
                f"{n_avail} dividing TRAIN.BATCH_SIZE={b}); set "
                f"MESH.NUM_DEVICES or adjust the batch to use all devices"
            )
        if n == 1:
            return None
    return make_mesh(n, str(cfg.MESH.DATA_AXIS))


def gan_batch_factory(cfg):
    """Returns callable(epoch) → iterator of GAN batch dicts."""
    if cfg.DATASET_NAME == "synthetic":
        from s2i_tpu.data import SyntheticGanDataset

        ds = SyntheticGanDataset(
            branch_num=int(cfg.TREE.BRANCH_NUM),
            base_size=int(cfg.TREE.BASE_SIZE),
            emb_dim=int(cfg.TEXT.DIMENSION),
            seed=int(cfg.SEED),
            image_dtype=str(getattr(cfg.DATA, "IMAGE_DTYPE", "float32")),
            ship_scales=str(getattr(cfg.DATA, "SHIP_SCALES", "all")),
        )
        steps = max(1, ds.n // int(cfg.TRAIN.BATCH_SIZE))

        def factory(epoch: int):
            return ds.batches(
                int(cfg.TRAIN.BATCH_SIZE), steps, seed=int(cfg.SEED) + epoch
            )

        return factory

    pipeline = str(cfg.DATA.PIPELINE).lower()
    if pipeline == "grain":
        from s2i_tpu.data.grain_pipeline import grain_batch_factory

        return grain_batch_factory(cfg)
    if pipeline not in ("native", "pil"):
        raise ValueError(f"unknown DATA.PIPELINE {pipeline!r}")

    from s2i_tpu.data.stackgan import GanEpochIterator, StackGanSplit

    split = StackGanSplit(
        cfg.DATA_DIR, "train", embedding_file=str(cfg.TEXT.EMBEDDING_FILE)
    )

    def factory(epoch: int):
        return GanEpochIterator(
            split,
            int(cfg.TRAIN.BATCH_SIZE),
            int(cfg.TREE.BRANCH_NUM),
            int(cfg.TREE.BASE_SIZE),
            seed=int(cfg.SEED) + epoch,
            num_threads=int(cfg.WORKERS),
            # "native" auto-detects the C++ loader; "pil" forces it off.
            use_native=None if pipeline == "native" else False,
            image_dtype=str(getattr(cfg.DATA, "IMAGE_DTYPE", "float32")),
            ship_scales=str(getattr(cfg.DATA, "SHIP_SCALES", "all")),
            fast_decode=bool(getattr(cfg.DATA, "FAST_DECODE", False)),
        )

    return factory


def joint_batch_factory(cfg):
    """GAN batches + on-device mel features of the SAME caption's wav +
    teacher embedding (joint finetune, SURVEY.md §3.5)."""
    import jax.numpy as jnp

    from s2i_tpu.audio import extract_features, frontend_params_from_cfg

    p = frontend_params_from_cfg(cfg.AUDIO)
    # auto: fused-framing Pallas kernel on TPU, jnp elsewhere (docs/PERF.md)
    use_pallas = None

    def featurize(b: dict) -> dict:
        feats, mask = extract_features(
            jnp.asarray(b.pop("wav")),
            p,
            use_pallas=use_pallas,
            wav_len=jnp.asarray(b.pop("wav_len")),
        )
        return {**b, "feats": feats, "feat_mask": mask}

    if cfg.DATASET_NAME == "synthetic":
        from s2i_tpu.data import SyntheticGanDataset, SyntheticSpeechDataset

        gan_ds = SyntheticGanDataset(
            branch_num=int(cfg.TREE.BRANCH_NUM),
            base_size=int(cfg.TREE.BASE_SIZE),
            emb_dim=int(cfg.TEXT.DIMENSION),
            seed=int(cfg.SEED),
        )
        sp_ds = SyntheticSpeechDataset(
            num_classes=8,
            examples_per_class=16,
            max_frames=int(cfg.AUDIO.MAX_FRAMES),
            n_mels=int(cfg.AUDIO.N_MELS),
            emb_dim=int(cfg.TEXT.DIMENSION),
            seed=int(cfg.SEED),
        )
        bs = int(cfg.TRAIN.BATCH_SIZE)
        steps = max(1, gan_ds.n // bs)

        def factory(epoch: int):
            rng = np.random.default_rng(int(cfg.SEED) + epoch)
            for _ in range(steps):
                idx = rng.integers(0, gan_ds.n, size=bs)
                gb = gan_ds.batch(idx)
                sb = sp_ds.batch(idx)
                yield {
                    "images": gb["images"],
                    "embedding": gb["embedding"],
                    "feats": sb["feats"],
                    "feat_mask": sb["feat_mask"],
                    "teacher": sb["teacher"],
                    "class_id": gb["class_id"],
                }

        return factory

    from s2i_tpu.data.stackgan import GanEpochIterator, StackGanSplit

    split = StackGanSplit(
        cfg.DATA_DIR, "train", embedding_file=str(cfg.TEXT.EMBEDDING_FILE)
    )
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length

    def factory(epoch: int):
        it = GanEpochIterator(
            split,
            int(cfg.TRAIN.BATCH_SIZE),
            int(cfg.TREE.BRANCH_NUM),
            int(cfg.TREE.BASE_SIZE),
            seed=int(cfg.SEED) + epoch,
            num_threads=int(cfg.WORKERS),
            with_audio=True,
            sample_rate=p.sample_rate,
            max_samples=max_samples,
            image_dtype=str(getattr(cfg.DATA, "IMAGE_DTYPE", "float32")),
            ship_scales=str(getattr(cfg.DATA, "SHIP_SCALES", "all")),
            fast_decode=bool(getattr(cfg.DATA, "FAST_DECODE", False)),
        )
        return (featurize(b) for b in it)

    return factory


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def run_gan_training(cfg, max_epoch: int | None = None) -> dict:
    from s2i_tpu.train.loop import GanTrainer

    run_dir = make_run_dir(cfg, "train")
    factory = (
        joint_batch_factory(cfg)
        if bool(cfg.TRAIN.JOINT_FT)
        else gan_batch_factory(cfg)
    )
    trainer = GanTrainer(
        cfg, run_dir, factory, mesh=make_mesh_if_configured(cfg)
    )
    try:
        mets = trainer.train(max_epoch)
    finally:
        trainer.close()
    print(f"run dir: {run_dir}")
    return mets


def run_sampling(cfg) -> str:
    """Reference B_VALIDATION path (SURVEY.md §3.4): test-split embeddings →
    PNG tree."""
    from s2i_tpu.train.loop import GanTrainer

    run_dir = make_run_dir(cfg, "sample")
    if cfg.DATASET_NAME == "synthetic":
        from s2i_tpu.data import SyntheticGanDataset

        ds = SyntheticGanDataset(
            branch_num=int(cfg.TREE.BRANCH_NUM),
            base_size=int(cfg.TREE.BASE_SIZE),
            emb_dim=int(cfg.TEXT.DIMENSION),
            seed=int(cfg.SEED) + 999,
        )
        emb, names = ds.embeddings, None
    else:
        from s2i_tpu.data.stackgan import StackGanSplit

        split = StackGanSplit(
            cfg.DATA_DIR, "test", embedding_file=str(cfg.TEXT.EMBEDDING_FILE)
        )
        emb = split.embeddings[:, 0]
        names = [f.replace("/", "_") for f in split.filenames]

    # joint-trained checkpoints carry encoder params — keep the state
    # structure consistent by building with the joint factory too
    factory = (
        joint_batch_factory(cfg)
        if bool(cfg.TRAIN.JOINT_FT)
        else gan_batch_factory(cfg)
    )
    # GanTrainer.__init__ already warm-starts from cfg.TRAIN.NET_G (and
    # raises FileNotFoundError when it has no checkpoint) — restoring it
    # again here paid a second full Orbax restore of the entire train state
    # on every sample invocation.
    trainer = GanTrainer(cfg, run_dir, factory)
    try:
        out_dir = os.path.join(run_dir, "samples")
        trainer.sample_to_dir(
            np.asarray(emb, np.float32),
            out_dir,
            names,
            samples_per_emb=int(cfg.EVAL.NUM_SAMPLES_PER_EMB),
            seed=int(cfg.SEED),
        )
    finally:
        trainer.close()
    print(f"samples: {out_dir}")
    return out_dir


def speech_batch_factory(cfg, use_pallas: bool | None = None):
    """Encoder-pretrain batches: on-device mel frontend over wav buffers
    (real data) or precomputed synthetic features."""
    if cfg.DATASET_NAME == "synthetic":
        from s2i_tpu.data import SyntheticSpeechDataset

        ds = SyntheticSpeechDataset(
            num_classes=int(cfg.ENCODER.N_CLASSES),
            max_frames=int(cfg.AUDIO.MAX_FRAMES),
            n_mels=int(cfg.AUDIO.N_MELS),
            emb_dim=int(cfg.TEXT.DIMENSION),
            seed=int(cfg.SEED),
        )
        steps = max(1, ds.n // int(cfg.ENCODER.BATCH_SIZE))

        def factory(epoch: int):
            return ds.batches(
                int(cfg.ENCODER.BATCH_SIZE), steps, seed=int(cfg.SEED) + epoch
            )

        return factory

    import jax.numpy as jnp

    from s2i_tpu.audio import extract_features, frontend_params_from_cfg
    from s2i_tpu.data.stackgan import SpeechEpochIterator, StackGanSplit

    p = frontend_params_from_cfg(cfg.AUDIO)
    split = StackGanSplit(cfg.DATA_DIR, "train")
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length

    def featurize(raw: dict) -> dict:
        feats, mask = extract_features(
            jnp.asarray(raw["wav"]),
            p,
            use_pallas=use_pallas,
            wav_len=jnp.asarray(raw["wav_len"]),
        )
        return {
            "feats": feats,
            "feat_mask": mask,
            "teacher": raw["teacher"],
            "class_id": raw["class_id"],
        }

    def factory(epoch: int):
        it = SpeechEpochIterator(
            split,
            int(cfg.ENCODER.BATCH_SIZE),
            p.sample_rate,
            max_samples,
            seed=int(cfg.SEED) + epoch,
        )
        return (featurize(b) for b in it)

    return factory


def run_encoder_pretrain(
    cfg, epochs: int | None = None, run_dir: str | None = None
) -> dict:
    """``epochs`` counts TOTAL epochs (reference MAX_EPOCH semantics, like
    GanTrainer.train): pass an EXISTING ``run_dir`` to resume — the loop
    restores the latest checkpoint and continues from the epoch recorded in
    the progress sidecar instead of re-running the consumed prefix. (The
    CLI always makes a fresh dir, same contract as the GAN path.)"""
    import jax

    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager, ScalarLogger

    run_dir = run_dir or make_run_dir(cfg, "encoder")
    prog_path = os.path.join(run_dir, "train_progress.json")
    model = enc_train.build_encoder(cfg)
    factory = speech_batch_factory(cfg)
    first = next(iter(factory(0)))
    state = enc_train.init_encoder_state(
        cfg, model, jax.random.key(int(cfg.SEED)), first
    )
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    restored = ckpt.restore_latest(state)
    start_epoch = 0
    if restored is not None:
        state, step0 = restored
        try:
            with open(prog_path) as f:
                start_epoch = int(json.load(f).get("epoch", 0))
        except (OSError, ValueError):
            start_epoch = 0  # no sidecar: replay from the first epoch
        print(f"resumed from step {step0} (epoch {start_epoch})")
    logger = ScalarLogger(
        run_dir,
        use_tensorboard=bool(getattr(cfg.TRAIN, "TENSORBOARD", False)),
    )
    mesh = make_mesh_if_configured(cfg)
    if mesh is not None:
        from s2i_tpu.parallel import (
            make_parallel_encoder_step,
            replicate_state,
            shard_batch,
        )

        state = replicate_state(state, mesh)
        step_fn = make_parallel_encoder_step(cfg, model, mesh)
        prep = lambda b: shard_batch(b, mesh, str(cfg.MESH.DATA_AXIS))
    else:
        step_fn = jax.jit(
            enc_train.make_encoder_train_step(cfg, model),
            donate_argnums=(0,),
        )
        prep = lambda b: b
    # Step-level observability + mid-epoch checkpoints (VERDICT r1 item 8):
    # epoch-end-only logging hid divergence for hours on real corpora.
    log_every = int(cfg.ENCODER.LOG_EVERY)
    snapshot = int(cfg.ENCODER.SNAPSHOT_INTERVAL)
    # One base key per run, folded per-step inside make_encoder_train_step —
    # today's step has no stochastic layers, but the stream is already
    # correct for when dropout/spec-augment lands.
    base_rng = jax.random.key(int(cfg.SEED) + 17)
    mets = {}
    step = int(state.step)  # host mirror; device sync only on boundaries
    t0, seen = time.time(), 0
    from s2i_tpu.data.pipeline import prefetch

    def write_progress(epoch_done: int) -> None:
        # tmp + rename like GanTrainer._write_progress: a torn write must
        # not corrupt resume. Mid-epoch snapshots record the CURRENT epoch
        # (resume replays it from the start — the encoder loop does not
        # promise mid-epoch bitwise resume); epoch-end saves record the next.
        tmp = prog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_done, "step": step}, f)
        os.replace(tmp, prog_path)

    for epoch in range(start_epoch, epochs or int(cfg.ENCODER.EPOCHS)):
        # Host wav IO + frontend dispatch + shard/transfer run in the
        # prefetch worker so they overlap the previous step's device
        # compute (same pattern as GanTrainer.train; depth 2 because raw
        # wav batches are an order of magnitude bigger than image batches).
        for batch in prefetch(map(prep, factory(epoch)), depth=2):
            seen += batch["feats"].shape[0]
            state, mets = step_fn(state, batch, base_rng)
            step += 1
            if log_every and step % log_every == 0:
                dt = time.time() - t0
                scalars = {k: float(v) for k, v in mets.items()}
                scalars["examples_per_sec"] = seen / max(dt, 1e-9)
                logger.log(step, scalars)
                t0, seen = time.time(), 0
            if snapshot and step % snapshot == 0:
                if ckpt.save(step, state):
                    write_progress(epoch)
        if ckpt.save(step, state):
            write_progress(epoch + 1)
    ckpt.wait()
    ckpt.close()
    logger.close()
    print(f"run dir: {run_dir}")
    return {k: float(v) for k, v in mets.items()}


def run_embedding_extraction(cfg, encoder_ckpt: str, out_path: str) -> None:
    """SURVEY.md §3.2: run the trained encoder over ALL captions of both
    splits and dump speech-embedding pickles the GAN datasets consume."""
    import pickle

    import jax
    import jax.numpy as jnp

    from s2i_tpu.audio import extract_features, frontend_params_from_cfg
    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.train import encoder as enc_train
    from s2i_tpu.utils import CheckpointManager

    p = frontend_params_from_cfg(cfg.AUDIO)
    model = enc_train.build_encoder(cfg)
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length

    # template state for restore
    dummy = {
        "feats": np.zeros((1, p.max_frames, p.n_features), np.float32),
        "feat_mask": np.ones((1, p.max_frames), bool),
    }
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), dummy)
    mgr = CheckpointManager(encoder_ckpt)
    restored = mgr.restore_latest(state)
    if restored is None:
        raise FileNotFoundError(f"no encoder checkpoint under {encoder_ckpt}")
    state = restored[0]
    mgr.close()
    extract = enc_train.make_extract_fn(model)

    for split_name in ("train", "test"):
        split = StackGanSplit(cfg.DATA_DIR, split_name)
        caps = split.captions_per_image
        out = np.zeros(
            (len(split), caps, int(cfg.TEXT.DIMENSION)), np.float32
        )
        bs = int(cfg.ENCODER.BATCH_SIZE)
        flat = [(i, c) for i in range(len(split)) for c in range(caps)]
        for start in range(0, len(flat), bs):
            chunk = flat[start : start + bs]
            wavs = np.zeros((bs, max_samples), np.float32)
            lens = np.zeros(bs, np.int32)
            for j, (i, c) in enumerate(chunk):
                x = split.load_wav(i, c, p.sample_rate)
                m = min(len(x), max_samples)
                wavs[j, :m] = x[:m]
                lens[j] = m
            feats, mask = extract_features(
                jnp.asarray(wavs), p, wav_len=jnp.asarray(lens)
            )
            emb = np.asarray(extract(state, feats, mask))
            for j, (i, c) in enumerate(chunk):
                out[i, c] = emb[j]
        dst = os.path.join(cfg.DATA_DIR, split_name, out_path)
        with open(dst, "wb") as f:
            pickle.dump(out, f)
        print(f"wrote {dst}: {out.shape}")
