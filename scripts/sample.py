"""Sampling/eval-generation CLI (reference eval cfg path, SURVEY.md §3.4)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu import cli


def main():
    args = cli.base_parser(__doc__).parse_args()
    cfg = cli.resolve_cfg(args)
    cfg.TRAIN.FLAG = False
    cli.run_sampling(cfg)


if __name__ == "__main__":
    main()
