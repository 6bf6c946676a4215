"""Training-QUALITY certification: demonstrate that the full 3-stage GAN
recipe CONVERGES, with a fixture-FID-vs-step curve (VERDICT r3 item 2;
SURVEY.md §4 "the training curves and IS/FID numbers reproduce" is the
reference's entire validation story).

One process, one device session, four phases:

  1. build a class-structured fixture dataset (per-class sinusoidal-grating
     images + class-prototype embeddings — learnable conditional structure,
     no external assets);
  2. fine-tune the Inception head on the fixture's classes (the StackGAN
     IS/FID protocol's classifier, scripts/finetune_inception.py math);
  3. train the b24 recipe config (cfg/birds_3stages.yml: 3 stages, EMA,
     KL + uncond + color losses) in chunks of --eval_every steps;
  4. at every chunk boundary (including step 0) sample EVERY fixture
     embedding with a FIXED seed and record fixture-FID + fixture-IS
     against the real fixture images, plus an EMA sample grid of the
     test split.

In-memory eval uses the pytorch-fid protocol knob (quantize_input=True:
features see the same uint8-quantized pixels a saved-PNG eval would).
Fixed z per eval point keeps the FID-vs-step curve's sampling noise common
across checkpoints, so the trend is the training signal.

Outputs under --out:
  results.jsonl   one line per eval point: step, fid, is_mean, is_std, ...
  grids/          EMA test-split sample grid per eval point + real grid
  train/          the GanTrainer run dir (checkpoints, scalars.jsonl)

    python scripts/quality_cert.py --out output/quality --steps 4000
"""
import sys, os, argparse, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="output/quality")
    ap.add_argument("--cfg", default="cfg/birds_3stages.yml")
    ap.add_argument("--fixture", default="",
                    help="reuse an existing fixture tree (same "
                    "classes/per_class/seed => identical dataset); empty = "
                    "build under --out")
    ap.add_argument("--inception_pkl", default="",
                    help="reuse a saved fine-tuned classifier "
                    "(inception_finetuned.pkl from a prior run) instead of "
                    "fine-tuning — scores land in the SAME feature space "
                    "as that run's curve")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=20)
    ap.add_argument("--captions", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--inc_epochs", type=int, default=40)
    ap.add_argument("--inc_lr", type=float, default=1e-3)
    ap.add_argument("--eval_batch", type=int, default=32)
    ap.add_argument("--eval_n", type=int, default=0,
                    help="sample at most this many embeddings per eval point "
                    "(fixed seeded subset; 0 = all). Keeps per-eval cost "
                    "flat when the fixture is large — real-set FID stats "
                    "still use every real image.")
    ap.add_argument("--ema_bn_recalc", type=int, default=0,
                    help="re-estimate G's BN stats under the EMA weights "
                    "with this many batches before each EMA eval "
                    "(EVAL.EMA_BN_RECALC; 0 = off). When on, 'fid'/'is' "
                    "are the recalced EMA and 'ema_stale_fid' keeps the "
                    "raw-trajectory-stats EMA for comparison.")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="extra config overrides (config.apply_overrides)")
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
    fixture = args.fixture or build_fixture(
        args.out, args.classes, args.per_class, args.captions, emb_dim,
        args.seed)
    cfg.DATA_DIR = fixture
    cfg.SEED = args.seed
    cfg.TEXT.EMBEDDING_FILE = "char-CNN-RNN-embeddings.pickle"
    cfg.ENCODER.N_CLASSES = args.classes
    cfg.TRAIN.SNAPSHOT_INTERVAL = args.eval_every
    cfg.EVAL.EMA_BN_RECALC = args.ema_bn_recalc

    import jax

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.eval import InceptionFeatures, gaussian_stats
    from s2i_tpu.train.loop import GanTrainer
    from s2i_tpu.utils import save_image_grid

    train_split = StackGanSplit(fixture, "train")
    test_split = StackGanSplit(fixture, "test")
    branch = int(cfg.TREE.BRANCH_NUM)
    top = int(cfg.TREE.BASE_SIZE) * 2 ** (branch - 1)

    import pickle
    if args.inception_pkl:
        print(f"phase 2: reuse fine-tuned Inception: {args.inception_pkl}")
        with open(args.inception_pkl, "rb") as f:
            variables = pickle.load(f)
        inc_mets = {"loaded": args.inception_pkl}
    else:
        print(f"phase 2: fine-tune Inception on {args.classes} "
              "fixture classes")
        variables, inc_mets = finetune_inception(
            cfg, train_split, args.classes, args.inc_epochs,
            int(cfg.TRAIN.BATCH_SIZE), top, args.inc_lr,
        )
    # persist the classifier: post-hoc evals (scripts/posthoc_quality_eval)
    # must score later checkpoints in the SAME feature space as the curve
    with open(os.path.join(args.out, "inception_finetuned.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(lambda x: np.asarray(x), variables), f)
    # pytorch-fid protocol: eval features see uint8-quantized pixels, the
    # same bytes a saved-PNG evaluation would (s2i_tpu/eval/features.py)
    ex = InceptionFeatures(variables, num_classes=args.classes,
                           quantize_input=True)

    print("phase 3: real-set features")
    real = load_real_images([train_split, test_split], top)
    real_pool, real_logits = ex.extract(real, args.eval_batch)
    real_stats = gaussian_stats(real_pool)
    # Interpretability floor (VERDICT r4 weak #5): on a 16-class fixture the
    # absolute FID values are feature-space artifacts — anchor the curve.
    floor = interpretability_floor(real_pool, real_logits, args.seed)
    print(f"  floor: real-vs-real FID={floor['real_real_fid']} "
          f"real IS={floor['real_is_mean']}±{floor['real_is_std']}")
    # eval-mode holdout check: the classifier must separate the REAL fixture
    # classes or FID/IS carry no signal (test rows are the last len(test))
    real_cls = np.concatenate([train_split.class_id, test_split.class_id])
    eval_acc = float((real_logits.argmax(1) == real_cls).mean())
    test_acc = float(
        (real_logits[-len(test_split):].argmax(1)
         == real_cls[-len(test_split):]).mean()
    )
    print(f"  classifier eval-mode acc: all={eval_acc:.3f} test={test_acc:.3f}")
    save_image_grid(real[: 16], os.path.join(args.out, "grids", "real.png"))
    emb = np.concatenate(
        [train_split.embeddings[:, 0], test_split.embeddings[:, 0]]
    ).astype(np.float32)
    if args.eval_n and emb.shape[0] > args.eval_n:
        # fixed subset: the curve's sampling population is constant across
        # eval points, so the trend stays the training signal
        sel = np.random.default_rng(args.seed).permutation(emb.shape[0])
        emb = emb[np.sort(sel[: args.eval_n])]
    test_emb = test_split.embeddings[:, 0].astype(np.float32)
    print(f"  {real.shape[0]} real images, {emb.shape[0]} eval embeddings")

    from s2i_tpu import cli

    trainer = GanTrainer(cfg, os.path.join(args.out, "train"),
                         cli.gan_batch_factory(cfg))
    # EMA sampler (trainer.sample_fn) is the headline; the raw-params
    # sampler distinguishes Polyak lag from genuine training failure.
    from s2i_tpu.train.gan import make_sample_fn

    raw_sample_fn = jax.jit(make_sample_fn(cfg, trainer.models, use_ema=False))
    results_path = os.path.join(args.out, "results.jsonl")
    results = []
    with open(results_path, "a") as f:
        # preamble line: the committed jsonl is self-contained — the floor
        # anchors every later FID/IS value without needing summary.json
        f.write(json.dumps({"floor": True, **floor,
                            "inception_eval_acc": round(eval_acc, 3),
                            "inception_test_acc": round(test_acc, 3)}) + "\n")

    def sample_all(state, embeddings, seed: int, fn=None) -> np.ndarray:
        fn = fn or trainer.sample_fn
        outs = []
        bs = args.eval_batch
        for i in range(0, embeddings.shape[0], bs):
            e = embeddings[i : i + bs]
            pad = bs - e.shape[0]
            if pad:
                e = np.concatenate([e, np.zeros((pad, e.shape[1]), e.dtype)])
            imgs = fn(state, jax.numpy.asarray(e), jax.random.key(seed))
            imgs = np.asarray(imgs[-1])
            outs.append(imgs[: bs - pad] if pad else imgs)
        return np.concatenate(outs)

    fid_is_of = make_fid_is(ex, real_stats, args.eval_batch)

    def evaluate(step: int, train_mets: dict) -> None:
        t0 = time.time()
        # EMA eval state: with --ema_bn_recalc, G's BN stats re-estimated
        # under the EMA weights (trainer.eval_state == the production knob)
        ema_state = trainer.eval_state(emb, seed=777)
        stale = {}
        if args.ema_bn_recalc:
            stale_fake = sample_all(trainer.state, emb, seed=123)
            s_fid, s_is, _ = fid_is_of(stale_fake)
            stale = {"ema_stale_fid": round(s_fid, 3),
                     "ema_stale_is": round(s_is, 4)}
        fake = sample_all(ema_state, emb, seed=123)
        fid, is_mean, is_std = fid_is_of(fake)
        raw_fake = sample_all(trainer.state, emb, seed=123, fn=raw_sample_fn)
        raw_fid, raw_is, _ = fid_is_of(raw_fake)
        grid = sample_all(ema_state, test_emb, seed=123)[:16]
        save_image_grid(
            grid, os.path.join(args.out, "grids", f"step_{step:07d}.png")
        )
        # Raw-params grid too: with EMA_G=0.999 the Polyak average trails
        # training by ~1k steps, so early EMA grids show mean color long
        # after the raw G has structure — both views belong in QUALITY.md.
        raw_grid = sample_all(
            trainer.state, test_emb, seed=123, fn=raw_sample_fn
        )[:16]
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
            "n_fake": int(fake.shape[0]),
            "n_real": int(real.shape[0]),
            "eval_s": round(time.time() - t0, 1),
            **stale,
            **{k: round(float(v), 4) for k, v in train_mets.items()},
        }
        results.append(rec)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"  step {step}: FID={rec['fid']} IS={rec['is_mean']}"
              f"±{rec['is_std']} ({rec['eval_s']}s)")

    print(f"phase 4: train {args.steps} steps, eval every {args.eval_every}")
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
        "is_last": results[-1]["is_mean"],
        "raw_fid_best": min(r.get("raw_fid", r["fid"]) for r in results),
        "raw_fid_last": results[-1].get("raw_fid"),
        "raw_is_best": max(r.get("raw_is", r["is_mean"]) for r in results),
        "inception_acc": (round(float(inc_mets["acc"]), 3)
                          if "acc" in inc_mets else inc_mets.get("loaded")),
        "inception_eval_acc": round(eval_acc, 3),
        "inception_test_acc": round(test_acc, 3),
        "train_wall_s": round(t_train, 1),
        "curve": results,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))


if __name__ == "__main__":
    main()
