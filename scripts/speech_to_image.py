"""Direct speech-to-image inference CLI: wav file(s) -> PNG image(s).

    python scripts/speech_to_image.py --cfg cfg/birds_3stages.yml \
        --encoder_ckpt <enc-run>/ckpt --gan_ckpt <gan-run>/ckpt \
        --wav a.wav b.wav --out_dir generated/
"""
import sys, os, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu import cli
from s2i_tpu.pipeline import SpeechToImage


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--encoder_ckpt", default="",
                   help="optional when TRAIN.JOINT_FT (encoder is in the GAN ckpt)")
    p.add_argument("--gan_ckpt", required=True)
    p.add_argument("--wav", nargs="+", required=True)
    p.add_argument("--out_dir", default="generated")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)
    pipe = SpeechToImage.from_checkpoints(cfg, args.encoder_ckpt, args.gan_ckpt)
    os.makedirs(args.out_dir, exist_ok=True)
    outs = [
        os.path.join(args.out_dir, os.path.splitext(os.path.basename(w))[0] + ".png")
        for w in args.wav
    ]
    pipe.generate_files(args.wav, outs, seed=args.seed)
    print("\n".join(outs))


if __name__ == "__main__":
    main()
