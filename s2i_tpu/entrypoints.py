"""Console-script entry points (pyproject [project.scripts])."""

from s2i_tpu import cli


def train_gan() -> None:
    args = cli.base_parser("GAN training").parse_args()
    cli.run_gan_training(cli.resolve_cfg(args))


def sample() -> None:
    args = cli.base_parser("Sampling").parse_args()
    cfg = cli.resolve_cfg(args)
    cfg.TRAIN.FLAG = False
    cli.run_sampling(cfg)


def pretrain_encoder() -> None:
    args = cli.base_parser("Encoder distillation pretraining").parse_args()
    cli.run_encoder_pretrain(cli.resolve_cfg(args))
