"""Export a trained speech→image pipeline to a hermetic AOT artifact.

    python scripts/export.py --cfg cfg/birds_joint_ft.yml \
        --gan_ckpt runs/gan/ckpt --out /models/s2i_v1 --batches 1,8

The artifact (StableHLO programs + meta.json, weights baked in) serves
without any Python model code:

    python scripts/serve.py --artifact /models/s2i_v1 --port 8500

See s2i_tpu/export.py for the format.
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2i_tpu import cli
from s2i_tpu.export import export_pipeline
from s2i_tpu.pipeline import SpeechToImage


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--encoder_ckpt", default="",
                   help="optional when TRAIN.JOINT_FT (encoder is in the GAN ckpt)")
    p.add_argument("--gan_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batches", default="1,8")
    p.add_argument("--stage", type=int, default=-1)
    p.add_argument(
        "--float", action="store_true",
        help="emit float32 [-1,1] images instead of uint8",
    )
    p.add_argument("--no_ema", action="store_true")
    args = p.parse_args()

    cfg = cli.resolve_cfg(args)
    pipe = SpeechToImage.from_checkpoints(
        cfg, args.encoder_ckpt or None, args.gan_ckpt,
        use_ema=not args.no_ema,
    )
    meta = export_pipeline(
        pipe,
        args.out,
        batch_sizes=tuple(int(b) for b in args.batches.split(",")),
        stage=args.stage,
        quantize=not args.float,
    )
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
