"""Reference-parity entry point (reference ``main.py``, SURVEY.md §1 L4):

    python main.py --cfg cfg/birds_3stages.yml
    python main.py --cfg cfg/eval_birds.yml          # TRAIN.FLAG False → sample

TRAIN.FLAG selects training vs the sampling/validation path, exactly like the
reference; ``--set KEY=VAL`` overrides any config key.
"""

from s2i_tpu import cli


def main() -> None:
    args = cli.base_parser(__doc__).parse_args()
    cfg = cli.resolve_cfg(args)
    if bool(cfg.TRAIN.FLAG):
        cli.run_gan_training(cfg)
    else:
        cli.run_sampling(cfg)


if __name__ == "__main__":
    main()
