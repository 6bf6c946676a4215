"""Speech-encoder distillation pretraining CLI (reference
train_audio_encoder.py, SURVEY.md §3.1) + embedding extraction (§3.2)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu import cli


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument(
        "--extract", default=None, metavar="CKPT_DIR",
        help="skip training; extract embeddings with this encoder checkpoint",
    )
    p.add_argument(
        "--emb_out", default="speech-embeddings.pickle",
        help="per-split output pickle name for --extract",
    )
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)
    if args.extract:
        cli.run_embedding_extraction(cfg, args.extract, args.emb_out)
    else:
        cli.run_encoder_pretrain(cfg, args.epochs)


if __name__ == "__main__":
    main()
