"""Encoder-QUALITY certification: demonstrate that the distillation
pretrain CONVERGES — held-out distill MSE falls and speech→teacher
retrieval (R@1 / mAP / medR) rises over training — on the synthetic
fixture corpus, with no external assets.

The encoder twin of scripts/quality_cert.py (which certifies the GAN
half): SURVEY.md §2 "Distillation trainer" / "Retrieval eval" rows and
§3.1/§3.2 call stacks. The CPU suite pins that one step's loss drops
(tests/test_encoder_train.py); this script shows the full pretrain
recipe reaching a useful embedding space, scored by the same
`eval.retrieval` metrics a real corpus run would use.

One process, one device session:

  1. build (or reuse) the fixture dataset tree — per-caption tone wavs
     whose audible content encodes the class (tools/make_fixture_dataset);
  2. train the reference pretrain recipe (cfg/pretrain_encoder_birds.yml:
     MSE to the teacher embedding + auxiliary class CE, Adam) in chunks;
  3. at every chunk boundary, run eval-mode extraction over held-out
     speech and record: test MSE, test-split speech→teacher retrieval
     (multi-positive, grouped by image), retrieval over a fixed train
     subset (a denser gallery), and nearest-class-prototype accuracy.

Outputs under --out: results.jsonl (one line per eval point),
summary.json (first/best/last + provenance).

    python scripts/encoder_quality_cert.py --out output/encoder_quality \
        --fixture output/quality_r4d/fixture --steps 1500
"""
import sys, os, argparse, json, subprocess, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from s2i_tpu.eval.cert import build_fixture  # shared cert plumbing


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="output/encoder_quality")
    ap.add_argument("--cfg", default="cfg/pretrain_encoder_birds.yml")
    ap.add_argument("--fixture", default="",
                    help="reuse an existing fixture tree (e.g. the one the "
                    "GAN quality cert built); empty = build under --out")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--captions", type=int, default=2)
    ap.add_argument("--test_per_class", type=int, default=2,
                    help="held-out images per class; >=2 de-degenerates "
                    "nearest-prototype accuracy vs gallery R@1 (with one "
                    "held-out image per class the two metrics are near-"
                    "identical — ADVICE r4)")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_every", type=int, default=150)
    ap.add_argument("--train_eval_n", type=int, default=160,
                    help="images in the fixed train-subset retrieval gallery")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from s2i_tpu import config

    cfg = config.cfg_from_file(os.path.join(REPO, args.cfg))
    if args.set:
        config.apply_overrides(cfg, args.set)
    emb_dim = int(cfg.TEXT.DIMENSION)
    fixture = args.fixture or build_fixture(
        args.out, args.classes, args.per_class, args.captions, emb_dim,
        args.seed, test_per_class=args.test_per_class,
    )
    cfg.DATA_DIR = fixture
    cfg.SEED = args.seed
    cfg.ENCODER.N_CLASSES = args.classes

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    from s2i_tpu import cli
    from s2i_tpu.audio import extract_features, frontend_params_from_cfg
    from s2i_tpu.data.pipeline import prefetch
    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.eval.retrieval import retrieval_metrics
    from s2i_tpu.train import encoder as enc_train

    train_split = StackGanSplit(fixture, "train")
    test_split = StackGanSplit(fixture, "test")
    caps = test_split.captions_per_image
    p = frontend_params_from_cfg(cfg.AUDIO)
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length

    model = enc_train.build_encoder(cfg)
    factory = cli.speech_batch_factory(cfg)
    first = next(iter(factory(0)))
    state = enc_train.init_encoder_state(
        cfg, model, jax.random.key(int(cfg.SEED)), first
    )
    step_fn = jax.jit(
        enc_train.make_encoder_train_step(cfg, model), donate_argnums=(0,)
    )
    extract = enc_train.make_extract_fn(model)
    base_rng = jax.random.key(int(cfg.SEED) + 17)

    def extract_images(split: StackGanSplit, img_indices) -> np.ndarray:
        """Eval-mode speech embeddings for EVERY caption of the given
        images (wav → on-device mel → encoder), [len(idx)*caps, emb_dim]
        in (image, caption) order — mirrors cli.run_embedding_extraction."""
        flat = [(i, c) for i in img_indices for c in range(caps)]
        bs = int(cfg.ENCODER.BATCH_SIZE)
        out = np.zeros((len(flat), emb_dim), np.float32)
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
            out[start : start + len(chunk)] = emb[: len(chunk)]
        return out

    # Fixed populations: the curve's galleries are constant across eval
    # points, so the trend is the training signal (quality_cert pattern).
    test_idx = np.arange(len(test_split))
    rng = np.random.default_rng(args.seed)
    train_idx = np.sort(
        rng.permutation(len(train_split))[: args.train_eval_n]
    )
    test_teacher = test_split.embeddings[test_idx].reshape(-1, emb_dim)
    test_ids = np.repeat(test_idx, caps)
    test_cls = np.repeat(test_split.class_id[test_idx], caps)
    train_teacher = train_split.embeddings[train_idx].reshape(-1, emb_dim)
    train_ids = np.repeat(train_idx, caps)
    # Class prototypes from the TRAIN teacher space: nearest-prototype
    # accuracy grades cross-split class structure, not memorization.
    protos = np.stack([
        train_split.embeddings[train_split.class_id == k].mean((0, 1))
        for k in range(args.classes)
    ]).astype(np.float32)

    results_path = os.path.join(args.out, "results.jsonl")
    results = []

    def evaluate(step: int, train_mets: dict) -> None:
        t0 = time.time()
        emb_t = extract_images(test_split, test_idx)
        mse = float(np.mean(np.square(emb_t - test_teacher)))
        ret_t = retrieval_metrics(
            emb_t, test_teacher.astype(np.float32), ks=(1, 5),
            query_ids=test_ids, target_ids=test_ids,
        )["q2t"]
        emb_tr = extract_images(train_split, train_idx)
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
        rec = {
            "step": step,
            "test_mse": round(mse, 5),
            "test_r@1": round(ret_t["r@1"], 4),
            "test_map": round(ret_t["map"], 4),
            "test_medr": ret_t["medr"],
            "train_r@1": round(ret_tr["r@1"], 4),
            "train_map": round(ret_tr["map"], 4),
            "train_medr": ret_tr["medr"],
            "proto_cls_acc": round(cls_acc, 4),
            "n_test_q": int(emb_t.shape[0]),
            "n_train_q": int(emb_tr.shape[0]),
            "eval_s": round(time.time() - t0, 1),
            **{k: round(float(v), 5) for k, v in train_mets.items()},
        }
        results.append(rec)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"  step {step}: mse={rec['test_mse']} "
              f"test R@1={rec['test_r@1']} mAP={rec['test_map']} "
              f"cls_acc={rec['proto_cls_acc']} ({rec['eval_s']}s)")

    def batches():
        epoch = 0
        while True:
            for b in factory(epoch):
                yield b
            epoch += 1

    print(f"train {args.steps} steps, eval every {args.eval_every} "
          f"(batch {int(cfg.ENCODER.BATCH_SIZE)}, "
          f"{len(train_split)}x{caps} train utts)")
    evaluate(0, {})
    stream = prefetch(batches(), depth=2)
    step, mets, t_train = 0, {}, 0.0
    for batch in stream:
        t0 = time.time()
        state, mets = step_fn(state, batch, base_rng)
        step += 1
        t_train += time.time() - t0
        if step % args.eval_every == 0 or step == args.steps:
            evaluate(step, mets)
        if step >= args.steps:
            break

    summary = {
        "steps": step,
        "test_mse_first": results[0]["test_mse"],
        "test_mse_best": min(r["test_mse"] for r in results),
        "test_mse_last": results[-1]["test_mse"],
        "test_r@1_first": results[0]["test_r@1"],
        "test_r@1_best": max(r["test_r@1"] for r in results),
        "test_r@1_last": results[-1]["test_r@1"],
        "test_map_last": results[-1]["test_map"],
        "train_r@1_last": results[-1]["train_r@1"],
        "proto_cls_acc_last": results[-1]["proto_cls_acc"],
        "train_wall_s": round(t_train, 1),
        "curve": results,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))


if __name__ == "__main__":
    main()
