"""Serve the speech-to-image pipeline over HTTP.

    python scripts/serve.py --cfg cfg/birds_3stages.yml \
        --encoder_ckpt <enc>/ckpt --gan_ckpt <gan>/ckpt --port 8500

or from an AOT artifact (scripts/export.py — no model code, no cfg):

    python scripts/serve.py --artifact /models/s2i_v1 --port 8500
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu import cli
from s2i_tpu.pipeline import SpeechToImage
from s2i_tpu.serving import make_server


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--encoder_ckpt", default="",
                   help="optional when TRAIN.JOINT_FT (encoder is in the GAN ckpt)")
    p.add_argument("--gan_ckpt", default="")
    p.add_argument("--artifact", default="",
                   help="serve a scripts/export.py artifact instead of checkpoints")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the pre-listen compile of the serving batch "
                   "(first request then pays XLA compile inside its wait)")
    args = p.parse_args()
    if args.artifact:
        from s2i_tpu.export import load

        pipe = load(args.artifact)
        if pipe.meta["output_dtype"] != "uint8":
            p.error(
                "serving needs a uint8 artifact (PNG responses); "
                "re-export without --float"
            )
    else:
        if not args.gan_ckpt:
            p.error("--gan_ckpt (or --artifact) is required")
        cfg = cli.resolve_cfg(args)
        pipe = SpeechToImage.from_checkpoints(
            cfg, args.encoder_ckpt, args.gan_ckpt
        )
    srv = make_server(
        pipe, args.host, args.port, args.batch, warmup=not args.no_warmup
    )
    print(f"serving on http://{args.host}:{args.port}  (POST /generate, GET /healthz)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
