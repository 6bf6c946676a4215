"""Fine-tune InceptionV3 on a dataset's classes for the StackGAN IS/FID
protocol (SURVEY.md §2 "Inception Score").

    python scripts/finetune_inception.py --cfg cfg/birds_3stages.yml \
        [--warm_start imagenet_inception.pth] --epochs 20
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from s2i_tpu import cli
from s2i_tpu.eval.finetune import init_inception_state, make_inception_train_step
from s2i_tpu.utils import CheckpointManager, ScalarLogger


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warm_start", default=None, help="torch .pth state_dict")
    p.add_argument(
        "--image_size", type=int, default=299,
        help="train-time input size (the model is size-agnostic; small "
        "values make CPU smoke runs feasible)",
    )
    p.add_argument("--base_size", type=int, default=256,
                   help="loader image size before the train-step resize")
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)
    run_dir = cli.make_run_dir(cfg, "inception")

    warm = None
    if args.warm_start:
        import torch
        from s2i_tpu.eval.weights import load_torch_inception

        warm = load_torch_inception(
            torch.load(args.warm_start, map_location="cpu", weights_only=True)
        )

    n_classes = int(cfg.ENCODER.N_CLASSES)
    model, state = init_inception_state(
        n_classes, jax.random.key(int(cfg.SEED)), args.lr, warm,
        image_size=args.image_size,
    )
    step = make_inception_train_step(model, args.lr, image_size=args.image_size)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    logger = ScalarLogger(run_dir)

    from s2i_tpu.data.stackgan import GanEpochIterator, StackGanSplit

    split = StackGanSplit(cfg.DATA_DIR, "train")
    for epoch in range(args.epochs):
        it = GanEpochIterator(split, args.batch, 1, base_size=args.base_size,
                              seed=int(cfg.SEED) + epoch)
        mets = {}
        for b in it:
            state, mets = step(
                state,
                jax.numpy.asarray(b["images"][0]),
                jax.numpy.asarray(b["class_id"] % n_classes),
            )
        logger.log(int(state.step), {k: float(v) for k, v in mets.items()})
        ckpt.save(int(state.step), state)
        summary = {k: round(float(v), 3) for k, v in mets.items()}
        print(f"epoch {epoch}: {summary}")
    ckpt.wait(); ckpt.close(); logger.close()
    print(f"run dir: {run_dir}")


if __name__ == "__main__":
    main()
