"""Post-hoc sample-grid renderer for a quality-cert run (docs/QUALITY.md
evidence): restore the newest checkpoint from ``<run>/train/ckpt`` and save
EMA and raw-params test-split grids, plus an optional per-class panel.

Runs on any backend — scripts/quality_cert.py trains on the TPU, this can
render on CPU thanks to CheckpointManager's sharding-agnostic restore
(s2i_tpu/utils/checkpoint.py). Use it when a run predates quality_cert's
in-loop raw-grid saving, or to re-render at the final step:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/render_quality_grids.py --run output/quality_r4b
"""
import sys, os, argparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True,
                    help="quality_cert --out dir (holds fixture/ train/ grids/)")
    ap.add_argument("--cfg", default="cfg/birds_3stages.yml")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--seed", type=int, default=123,
                    help="sampling-noise seed (123 = quality_cert's grids)")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import numpy as np
    import jax

    from s2i_tpu import cli, config
    from s2i_tpu.data.stackgan import StackGanSplit
    from s2i_tpu.train.gan import make_sample_fn
    from s2i_tpu.train.loop import GanTrainer
    from s2i_tpu.utils import save_image_grid

    cfg = config.cfg_from_file(os.path.join(REPO, args.cfg))
    if args.set:
        config.apply_overrides(cfg, args.set)
    fixture = os.path.join(args.run, "fixture")
    cfg.DATA_DIR = fixture
    cfg.TEXT.EMBEDDING_FILE = "char-CNN-RNN-embeddings.pickle"
    cfg.ENCODER.N_CLASSES = args.classes

    trainer = GanTrainer(cfg, os.path.join(args.run, "train"),
                         cli.gan_batch_factory(cfg))
    try:
        step = int(trainer.state.step)
        if step == 0:
            raise SystemExit(f"no checkpoint under {args.run}/train/ckpt")
        test_emb = StackGanSplit(fixture, "test").embeddings[:, 0]
        test_emb = jax.numpy.asarray(test_emb.astype(np.float32))
        key = jax.random.key(args.seed)
        raw_fn = jax.jit(make_sample_fn(cfg, trainer.models, use_ema=False))
        out = os.path.join(args.run, "grids")
        os.makedirs(out, exist_ok=True)
        renders = [("ema", trainer.sample_fn, trainer.state),
                   ("raw", raw_fn, trainer.state)]
        if int(cfg.EVAL.EMA_BN_RECALC) > 0:
            # EMA weights with BN stats re-estimated under them (the
            # round-4 EMA-collapse diagnosis, gan.make_bn_recalc_fn);
            # pool = the train-split embeddings, like a real eval would
            pool = StackGanSplit(fixture, "train").embeddings[:, 0]
            renders.append((
                "ema_recalc", trainer.sample_fn,
                trainer.eval_state(pool.astype(np.float32), seed=args.seed),
            ))
        for tag, fn, state in renders:
            imgs = np.asarray(fn(state, test_emb, key)[-1])[:16]
            path = os.path.join(out, f"step_{step:07d}_{tag}.png")
            save_image_grid(imgs, path)
            print(f"{tag} grid at step {step}: {path}")
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
