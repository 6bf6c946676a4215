"""GAN training CLI (reference: main.py --cfg cfg/birds_3stages.yml)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu import cli


def main():
    p = cli.base_parser(__doc__)
    p.add_argument("--max_epoch", type=int, default=None)
    args = p.parse_args()
    cfg = cli.resolve_cfg(args)
    cli.run_gan_training(cfg, args.max_epoch)


if __name__ == "__main__":
    main()
