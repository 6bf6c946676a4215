"""Post-hoc quality eval of a quality-cert run's newest checkpoint: score
the raw-params G, the EMA G as stored (raw-trajectory BN stats), and the
EMA G with BN stats re-estimated under the EMA weights
(gan.make_bn_recalc_fn — the round-4 EMA-collapse fix, docs/QUALITY.md).

Scores land in the SAME fixture-FID feature space as the run's curve: the
fine-tuned Inception is loaded from ``<run>/inception_finetuned.pkl`` when
the run saved it, else re-fit with the run's exact protocol (same seed,
same data order, same backend → the same classifier scripts/quality_cert.py
trained in its phase 2) and saved for next time.

    python scripts/posthoc_quality_eval.py --run output/quality_r4c \
        --ema_bn_recalc 30 --eval_n 640

Appends one JSON line to ``<run>/posthoc.jsonl`` and saves
``grids/posthoc_step_*_{raw,ema_stale,ema_recalc}.png``.
"""
import sys, os, argparse, importlib.util, json, pickle, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "quality_cert", os.path.join(REPO, "scripts", "quality_cert.py")
)
qc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(qc)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True,
                    help="quality_cert --out dir (fixture/ train/ grids/)")
    ap.add_argument("--cfg", default="cfg/birds_3stages.yml")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--eval_batch", type=int, default=32)
    ap.add_argument("--eval_n", type=int, default=0)
    ap.add_argument("--inc_epochs", type=int, default=40)
    ap.add_argument("--inc_lr", type=float, default=1e-3)
    ap.add_argument("--ema_bn_recalc", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import numpy as np
    import jax

    from s2i_tpu import cli, config
    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.eval import (
        InceptionFeatures,
        fid_from_stats,
        gaussian_stats,
        inception_score_from_probs,
    )
    from s2i_tpu.train.gan import make_sample_fn
    from s2i_tpu.train.loop import GanTrainer
    from s2i_tpu.utils import save_image_grid

    cfg = config.cfg_from_file(os.path.join(REPO, args.cfg))
    if args.set:
        config.apply_overrides(cfg, args.set)
    fixture = os.path.join(args.run, "fixture")
    cfg.DATA_DIR = fixture
    cfg.SEED = args.seed
    cfg.TEXT.EMBEDDING_FILE = "char-CNN-RNN-embeddings.pickle"
    cfg.ENCODER.N_CLASSES = args.classes
    cfg.EVAL.EMA_BN_RECALC = args.ema_bn_recalc

    train_split = StackGanSplit(fixture, "train")
    test_split = StackGanSplit(fixture, "test")
    branch = int(cfg.TREE.BRANCH_NUM)
    top = int(cfg.TREE.BASE_SIZE) * 2 ** (branch - 1)

    inc_path = os.path.join(args.run, "inception_finetuned.pkl")
    if os.path.exists(inc_path):
        with open(inc_path, "rb") as f:
            variables = pickle.load(f)
        print(f"loaded fine-tuned Inception: {inc_path}")
    else:
        print("re-fitting the run's Inception (same protocol/seed/backend)")
        variables, _ = qc.finetune_inception(
            cfg, train_split, args.classes, args.inc_epochs,
            int(cfg.TRAIN.BATCH_SIZE), top, args.inc_lr,
        )
        with open(inc_path, "wb") as f:
            pickle.dump(jax.tree.map(lambda x: np.asarray(x), variables), f)
    ex = InceptionFeatures(variables, num_classes=args.classes,
                           quantize_input=True)

    real = qc.load_real_images([train_split, test_split], top)
    real_stats = gaussian_stats(ex.extract(real, args.eval_batch)[0])
    emb = np.concatenate(
        [train_split.embeddings[:, 0], test_split.embeddings[:, 0]]
    ).astype(np.float32)
    if args.eval_n and emb.shape[0] > args.eval_n:
        sel = np.random.default_rng(args.seed).permutation(emb.shape[0])
        emb = emb[np.sort(sel[: args.eval_n])]
    test_emb = test_split.embeddings[:, 0].astype(np.float32)

    trainer = GanTrainer(cfg, os.path.join(args.run, "train"),
                         cli.gan_batch_factory(cfg))
    try:
        step = int(trainer.state.step)
        if step == 0:
            raise SystemExit(f"no checkpoint under {args.run}/train/ckpt")
        print(f"scoring checkpoint step {step}")
        raw_fn = jax.jit(make_sample_fn(cfg, trainer.models, use_ema=False))

        def sample_all(state, embeddings, fn):
            outs, bs = [], args.eval_batch
            for i in range(0, embeddings.shape[0], bs):
                e = embeddings[i : i + bs]
                pad = bs - e.shape[0]
                if pad:
                    e = np.concatenate(
                        [e, np.zeros((pad, e.shape[1]), e.dtype)]
                    )
                imgs = np.asarray(
                    fn(state, jax.numpy.asarray(e), jax.random.key(123))[-1]
                )
                outs.append(imgs[: bs - pad] if pad else imgs)
            return np.concatenate(outs)

        def fid_is_of(fake):
            pool, logits = ex.extract(fake, args.eval_batch)
            fid = fid_from_stats(*gaussian_stats(pool), *real_stats)
            logits = logits - logits.max(axis=1, keepdims=True)
            e = np.exp(logits)
            is_mean, is_std = inception_score_from_probs(
                e / e.sum(axis=1, keepdims=True), splits=5
            )
            return float(fid), float(is_mean)

        recalc_state = trainer.eval_state(emb, seed=777)
        rec = {"step": step, "n_fake": int(emb.shape[0]),
               "ema_bn_recalc": args.ema_bn_recalc}
        for tag, state, fn in (
            ("raw", trainer.state, raw_fn),
            ("ema_stale", trainer.state, trainer.sample_fn),
            ("ema_recalc", recalc_state, trainer.sample_fn),
        ):
            t0 = time.time()
            fake = sample_all(state, emb, fn)
            fid, is_mean = fid_is_of(fake)
            rec[f"{tag}_fid"] = round(fid, 3)
            rec[f"{tag}_is"] = round(is_mean, 4)
            grid = sample_all(state, test_emb, fn)[:16]
            save_image_grid(grid, os.path.join(
                args.run, "grids", f"posthoc_step_{step:07d}_{tag}.png"))
            print(f"  {tag}: FID={fid:.1f} IS={is_mean:.3f}"
                  f" ({time.time() - t0:.0f}s)")
    finally:
        trainer.close()

    with open(os.path.join(args.run, "posthoc.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
