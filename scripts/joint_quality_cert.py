"""Joint-finetune QUALITY certification: demonstrate that the flagship
joint mode (speech encoder inside the G graph + distillation regularizer,
SURVEY.md §3.5; BASELINE.json config #4) trains BOTH halves — fixture-FID
falls while held-out speech→teacher retrieval holds (or the failure mode
is recorded honestly).

Chains the two existing cert harnesses (VERDICT r4 missing #2) in one
TPU session:

  1. build (or reuse) the class-structured fixture dataset
     (tools/make_fixture_dataset: grating images + tone-wav captions +
     class-prototype teacher embeddings);
  2. encoder pretrain via the production CLI path
     (cli.run_encoder_pretrain, cfg/pretrain_encoder_birds.yml recipe) —
     the r4 encoder cert's sweet spot (~600 steps ≈ 12 epochs) so the
     joint phase starts from a useful embedding space, exactly the
     reference workflow (pretrain → TRAIN.NET_E warm-start);
  3. fine-tune the IS/FID protocol classifier on the fixture classes;
  4. GanTrainer with the joint recipe (cfg/birds_joint_ft.yml:
     JOINT_FT=True, NET_E=phase-2 checkpoint, full GAN loss stack +
     distill coeff) in --eval_every chunks;
  5. at every boundary record, with FIXED seeds/populations:
       - teacher-conditioned fixture-FID/IS of the EMA(-BN-recalc) G and
         the raw G (isolates the GAN axis from encoder drift),
       - speech-conditioned fixture-FID/IS of the EMA G — conditioning
         embeddings come from the CURRENT joint encoder over the eval
         images' caption wavs (the full production speech→image path),
       - encoder quality: held-out distill MSE, speech→teacher retrieval
         (R@1/mAP/medR), nearest-TRAIN-prototype class accuracy
         (the same eval.retrieval metrics as the encoder cert),
       - EMA + raw sample grids (speech-conditioned: the product path).

Outputs under --out: results.jsonl (floor preamble + one line per eval
point), summary.json, grids/, encoder/ (pretrain run), train/ (joint run).

    python scripts/joint_quality_cert.py --out output/joint_quality \
        --steps 4000 --eval_every 500
"""
import sys, os, argparse, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="output/joint_quality")
    ap.add_argument("--cfg", default="cfg/birds_joint_ft.yml")
    ap.add_argument("--pretrain_cfg", default="cfg/pretrain_encoder_birds.yml")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--captions", type=int, default=2)
    ap.add_argument("--test_per_class", type=int, default=2,
                    help=">=2 keeps nearest-prototype accuracy and gallery "
                    "R@1 from degenerating into one signal (ADVICE r4)")
    ap.add_argument("--pretrain_epochs", type=int, default=12,
                    help="encoder pretrain epochs (12 ≈ 600 steps on the "
                    "16x100x2 fixture — the r4 encoder cert's sweet spot "
                    "before small-corpus overfit)")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--inc_epochs", type=int, default=40)
    ap.add_argument("--inc_lr", type=float, default=1e-3)
    ap.add_argument("--eval_batch", type=int, default=32)
    ap.add_argument("--eval_n", type=int, default=640,
                    help="sampling population per eval point (fixed seeded "
                    "subset of the fixture images; 0 = all)")
    ap.add_argument("--train_eval_n", type=int, default=160,
                    help="images in the fixed train-subset retrieval gallery")
    ap.add_argument("--audio_frames", type=int, default=256,
                    help="AUDIO.MAX_FRAMES for BOTH phases (fixture wavs are "
                    "2.0 s = 201 frames; 256 covers them at 1/4 the default "
                    "1024's frontend cost — a cert-scale economy, the knob "
                    "itself is the product surface)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="extra overrides applied to BOTH phase configs "
                    "(pretrain + joint) — the encoder geometry must match "
                    "across them or the NET_E graft rejects the checkpoint")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(os.path.join(args.out, "grids"), exist_ok=True)

    from s2i_tpu import config
    from s2i_tpu.eval.cert import (
        build_fixture,
        finetune_inception,
        interpretability_floor,
        load_real_images,
        make_fid_is,
    )

    cfg = config.cfg_from_file(os.path.join(REPO, args.cfg))
    if args.set:
        config.apply_overrides(cfg, args.set)
    emb_dim = int(cfg.TEXT.DIMENSION)
    fixture = build_fixture(args.out, args.classes, args.per_class,
                            args.captions, emb_dim, args.seed,
                            test_per_class=args.test_per_class)

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    # ---- phase 2: encoder pretrain through the production CLI path ----
    from s2i_tpu import cli

    enc_dir = os.path.join(args.out, "encoder")
    enc_ckpt = os.path.join(enc_dir, "ckpt")
    cfg_enc = config.cfg_from_file(os.path.join(REPO, args.pretrain_cfg))
    if args.set:
        config.apply_overrides(cfg_enc, args.set)
    cfg_enc.DATA_DIR = fixture
    cfg_enc.SEED = args.seed
    cfg_enc.ENCODER.N_CLASSES = args.classes
    cfg_enc.AUDIO.MAX_FRAMES = args.audio_frames
    if os.path.exists(os.path.join(enc_ckpt)) and os.listdir(enc_ckpt):
        print(f"phase 2: encoder pretrain exists: {enc_ckpt}")
    else:
        os.makedirs(enc_dir, exist_ok=True)
        print(f"phase 2: encoder pretrain ({args.pretrain_epochs} epochs)")
        t0 = time.time()
        mets = cli.run_encoder_pretrain(
            cfg_enc, epochs=args.pretrain_epochs, run_dir=enc_dir
        )
        print(f"  pretrain done in {time.time() - t0:.0f}s: "
              f"{json.dumps(mets)}")

    # ---- joint config ----
    cfg.DATA_DIR = fixture
    cfg.SEED = args.seed
    cfg.TEXT.EMBEDDING_FILE = "char-CNN-RNN-embeddings.pickle"
    cfg.ENCODER.N_CLASSES = args.classes
    cfg.AUDIO.MAX_FRAMES = args.audio_frames
    cfg.TRAIN.NET_E = enc_ckpt
    cfg.TRAIN.SNAPSHOT_INTERVAL = args.eval_every

    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.eval import InceptionFeatures, gaussian_stats
    from s2i_tpu.eval.retrieval import retrieval_metrics
    from s2i_tpu.train.loop import GanTrainer
    from s2i_tpu.utils import save_image_grid

    train_split = StackGanSplit(fixture, "train")
    test_split = StackGanSplit(fixture, "test")
    branch = int(cfg.TREE.BRANCH_NUM)
    top = int(cfg.TREE.BASE_SIZE) * 2 ** (branch - 1)
    caps = test_split.captions_per_image

    print(f"phase 3: fine-tune Inception on {args.classes} fixture classes")
    variables, inc_mets = finetune_inception(
        cfg, train_split, args.classes, args.inc_epochs,
        int(cfg.TRAIN.BATCH_SIZE), top, args.inc_lr,
    )
    import pickle
    with open(os.path.join(args.out, "inception_finetuned.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(lambda x: np.asarray(x), variables), f)
    ex = InceptionFeatures(variables, num_classes=args.classes,
                           quantize_input=True)

    print("phase 3b: real-set features + eval populations")
    real = load_real_images([train_split, test_split], top)
    real_pool, real_logits = ex.extract(real, args.eval_batch)
    real_stats = gaussian_stats(real_pool)
    real_cls = np.concatenate([train_split.class_id, test_split.class_id])
    eval_acc = float((real_logits.argmax(1) == real_cls).mean())
    print(f"  classifier eval-mode acc: {eval_acc:.3f}")
    floor = interpretability_floor(real_pool, real_logits, args.seed)
    print(f"  floor: real-vs-real FID={floor['real_real_fid']} "
          f"real IS={floor['real_is_mean']}±{floor['real_is_std']}")
    fid_is_of = make_fid_is(ex, real_stats, args.eval_batch)

    # Fixed eval populations. Sampling subset: (split, image) pairs over
    # train+test — teacher embedding for the GAN-axis sweeps, caption-0 wav
    # for the speech-conditioned sweep.
    pairs = [(train_split, i) for i in range(len(train_split))] + [
        (test_split, i) for i in range(len(test_split))
    ]
    if args.eval_n and len(pairs) > args.eval_n:
        sel = np.random.default_rng(args.seed).permutation(len(pairs))
        pairs = [pairs[i] for i in np.sort(sel[: args.eval_n])]
    teacher_emb = np.stack(
        [s.embeddings[i, 0] for s, i in pairs]
    ).astype(np.float32)

    # Speech features are encoder-INDEPENDENT — precompute once; only the
    # encoder forward reruns per eval point.
    from s2i_tpu.audio import extract_features, frontend_params_from_cfg

    p = frontend_params_from_cfg(cfg.AUDIO)
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length

    def featurize_pairs(pair_list) -> tuple[np.ndarray, np.ndarray]:
        feats_all, mask_all = [], []
        bs = args.eval_batch
        for start in range(0, len(pair_list), bs):
            chunk = pair_list[start : start + bs]
            wavs = np.zeros((bs, max_samples), np.float32)
            lens = np.zeros(bs, np.int32)
            for j, (s, i, c) in enumerate(chunk):
                x = s.load_wav(i, c, p.sample_rate)
                m = min(len(x), max_samples)
                wavs[j, :m] = x[:m]
                lens[j] = m
            f, m = extract_features(
                jnp.asarray(wavs), p, wav_len=jnp.asarray(lens)
            )
            feats_all.append(np.asarray(f)[: len(chunk)])
            mask_all.append(np.asarray(m)[: len(chunk)])
        return np.concatenate(feats_all), np.concatenate(mask_all)

    sample_feats, sample_mask = featurize_pairs(
        [(s, i, 0) for s, i in pairs]
    )
    # retrieval populations (encoder cert protocol): every test caption as
    # query; a fixed dense train-subset gallery; TRAIN-prototype classifier
    test_idx = np.arange(len(test_split))
    rng = np.random.default_rng(args.seed)
    tr_idx = np.sort(rng.permutation(len(train_split))[: args.train_eval_n])
    test_feats, test_mask = featurize_pairs(
        [(test_split, i, c) for i in test_idx for c in range(caps)]
    )
    tr_feats, tr_mask = featurize_pairs(
        [(train_split, i, c) for i in tr_idx for c in range(caps)]
    )
    test_teacher = test_split.embeddings[test_idx].reshape(-1, emb_dim)
    test_ids = np.repeat(test_idx, caps)
    test_cls = np.repeat(test_split.class_id[test_idx], caps)
    train_teacher = train_split.embeddings[tr_idx].reshape(-1, emb_dim)
    train_ids = np.repeat(tr_idx, caps)
    protos = np.stack([
        train_split.embeddings[train_split.class_id == k].mean((0, 1))
        for k in range(args.classes)
    ]).astype(np.float32)
    print(f"  {real.shape[0]} real images, {teacher_emb.shape[0]} sampling "
          f"population, {test_feats.shape[0]} test / {tr_feats.shape[0]} "
          f"train-gallery retrieval queries")

    # ---- phase 4: the joint trainer ----
    print("phase 4: joint finetune "
          f"(NET_E={enc_ckpt}, {args.steps} steps)")
    trainer = GanTrainer(cfg, os.path.join(args.out, "train"),
                         cli.joint_batch_factory(cfg))
    from s2i_tpu.train.gan import make_sample_fn

    raw_sample_fn = jax.jit(
        make_sample_fn(cfg, trainer.models, use_ema=False)
    )

    @jax.jit
    def extract_emb(state, feats, mask):
        out = trainer.models.encoder.apply(
            {"params": state.g_params["enc"],
             "batch_stats": state.g_stats["enc"]},
            feats, mask, train=False,
        )
        return out[0] if isinstance(out, tuple) else out

    def encoder_embeddings(feats, mask) -> np.ndarray:
        outs = []
        bs = args.eval_batch
        n = feats.shape[0]
        for i in range(0, n, bs):
            f, m = feats[i : i + bs], mask[i : i + bs]
            pad = bs - f.shape[0]
            if pad:
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:], f.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
            e = np.asarray(extract_emb(trainer.state, jnp.asarray(f),
                                       jnp.asarray(m)))
            outs.append(e[: bs - pad] if pad else e)
        return np.concatenate(outs)

    def sample_all(state, embeddings, seed: int, fn=None) -> np.ndarray:
        fn = fn or trainer.sample_fn
        outs = []
        bs = args.eval_batch
        for i in range(0, embeddings.shape[0], bs):
            e = embeddings[i : i + bs]
            pad = bs - e.shape[0]
            if pad:
                e = np.concatenate([e, np.zeros((pad, e.shape[1]), e.dtype)])
            imgs = fn(state, jnp.asarray(e), jax.random.key(seed))
            imgs = np.asarray(imgs[-1])
            outs.append(imgs[: bs - pad] if pad else imgs)
        return np.concatenate(outs)

    results_path = os.path.join(args.out, "results.jsonl")
    results = []
    with open(results_path, "a") as f:
        f.write(json.dumps({"floor": True, **floor,
                            "inception_eval_acc": round(eval_acc, 3)}) + "\n")

    def evaluate(step: int, train_mets: dict) -> None:
        t0 = time.time()
        # encoder axis (cheap: encoder-only forwards)
        emb_t = encoder_embeddings(test_feats, test_mask)
        mse = float(np.mean(np.square(emb_t - test_teacher)))
        ret_t = retrieval_metrics(
            emb_t, test_teacher.astype(np.float32), ks=(1, 5),
            query_ids=test_ids, target_ids=test_ids,
        )["q2t"]
        emb_tr = encoder_embeddings(tr_feats, tr_mask)
        ret_tr = retrieval_metrics(
            emb_tr, train_teacher.astype(np.float32), ks=(1, 5),
            query_ids=train_ids, target_ids=train_ids,
        )["q2t"]
        en = emb_t / np.maximum(
            np.linalg.norm(emb_t, axis=1, keepdims=True), 1e-8
        )
        pn = protos / np.maximum(
            np.linalg.norm(protos, axis=1, keepdims=True), 1e-8
        )
        cls_acc = float(((en @ pn.T).argmax(1) == test_cls).mean())
        # GAN axis: teacher-conditioned EMA(-recalc) + raw — isolates the
        # generator from encoder drift
        ema_state = trainer.eval_state(teacher_emb, seed=777)
        fake = sample_all(ema_state, teacher_emb, seed=123)
        fid, is_mean, is_std = fid_is_of(fake)
        raw_fake = sample_all(trainer.state, teacher_emb, seed=123,
                              fn=raw_sample_fn)
        raw_fid, raw_is, _ = fid_is_of(raw_fake)
        # product axis: speech-conditioned EMA — the full mel→encoder→CA→G
        # path with the CURRENT joint encoder
        speech_cond = encoder_embeddings(sample_feats, sample_mask)
        sp_fake = sample_all(ema_state, speech_cond, seed=123)
        sp_fid, sp_is, _ = fid_is_of(sp_fake)
        # grids: speech-conditioned test split (the product path), EMA + raw
        emb_grid = encoder_embeddings(test_feats[::caps], test_mask[::caps])
        grid = sample_all(ema_state, emb_grid, seed=123)[:16]
        save_image_grid(
            grid, os.path.join(args.out, "grids", f"step_{step:07d}.png")
        )
        raw_grid = sample_all(trainer.state, emb_grid, seed=123,
                              fn=raw_sample_fn)[:16]
        save_image_grid(
            raw_grid,
            os.path.join(args.out, "grids", f"step_{step:07d}_raw.png"),
        )
        rec = {
            "step": step,
            "fid": round(float(fid), 3),
            "is_mean": round(float(is_mean), 4),
            "is_std": round(float(is_std), 4),
            "raw_fid": round(float(raw_fid), 3),
            "raw_is": round(float(raw_is), 4),
            "speech_fid": round(float(sp_fid), 3),
            "speech_is": round(float(sp_is), 4),
            "test_mse": round(mse, 5),
            "test_r@1": round(ret_t["r@1"], 4),
            "test_map": round(ret_t["map"], 4),
            "test_medr": ret_t["medr"],
            "train_r@1": round(ret_tr["r@1"], 4),
            "proto_cls_acc": round(cls_acc, 4),
            "eval_s": round(time.time() - t0, 1),
            **{k: round(float(v), 5) for k, v in train_mets.items()},
        }
        results.append(rec)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"  step {step}: FID={rec['fid']} speechFID={rec['speech_fid']}"
              f" rawFID={rec['raw_fid']} IS={rec['is_mean']} "
              f"R@1={rec['test_r@1']} mse={rec['test_mse']} "
              f"({rec['eval_s']}s)")

    evaluate(int(trainer.state.step), {})
    t_train = 0.0
    try:
        while int(trainer.state.step) < args.steps:
            target = min(
                int(trainer.state.step) + args.eval_every, args.steps
            )
            t0 = time.time()
            mets = trainer.train(max_epoch=10**6, max_steps=target)
            t_train += time.time() - t0
            evaluate(int(trainer.state.step), mets)
    finally:
        trainer.close()

    summary = {
        **floor,
        "steps": int(results[-1]["step"]),
        "fid_first": results[0]["fid"],
        "fid_best": min(r["fid"] for r in results),
        "fid_last": results[-1]["fid"],
        "speech_fid_first": results[0]["speech_fid"],
        "speech_fid_best": min(r["speech_fid"] for r in results),
        "speech_fid_last": results[-1]["speech_fid"],
        "raw_fid_best": min(r["raw_fid"] for r in results),
        "is_last": results[-1]["is_mean"],
        "test_r@1_first": results[0]["test_r@1"],
        "test_r@1_best": max(r["test_r@1"] for r in results),
        "test_r@1_last": results[-1]["test_r@1"],
        "test_mse_first": results[0]["test_mse"],
        "test_mse_last": results[-1]["test_mse"],
        "inception_acc": round(float(inc_mets["acc"]), 3),
        "inception_eval_acc": round(eval_acc, 3),
        "train_wall_s": round(t_train, 1),
        "curve": results,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))


if __name__ == "__main__":
    main()
