"""Serve the speech-to-image pipeline over HTTP.

    python scripts/serve.py --cfg cfg/birds_3stages.yml \
        --encoder_ckpt <enc>/ckpt --gan_ckpt <gan>/ckpt --port 8500
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
    p.add_argument("--gan_ckpt", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)
    pipe = SpeechToImage.from_checkpoints(cfg, args.encoder_ckpt, args.gan_ckpt)
    srv = make_server(pipe, args.host, args.port, args.batch)
    print(f"serving on http://{args.host}:{args.port}  (POST /generate, GET /healthz)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
