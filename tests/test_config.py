"""Config-system tests: YAML merge semantics, type checking, overrides,
dump round-trip, CLI resolution precedence."""

import numpy as np
import pytest

from s2i_tpu import cli, config


def test_defaults_have_reference_keys():
    c = config.default_cfg()
    # the reference script surface (SURVEY.md §2 "Config system")
    assert c.TRAIN.BATCH_SIZE == 24
    assert c.GAN.GF_DIM == 64
    assert c.TEXT.DIMENSION == 1024
    assert c.TREE.BRANCH_NUM == 3
    assert c.TRAIN.COEFF.KL == 2.0


def test_yaml_merge_and_unknown_keys():
    c = config.cfg_from_string(
        "TRAIN:\n  BATCH_SIZE: 32\n  NEW_KEY: hello\nGAN:\n  GF_DIM: 32\n"
    )
    assert c.TRAIN.BATCH_SIZE == 32
    assert c.TRAIN.NEW_KEY == "hello"  # easydict-style: unknown keys allowed
    assert c.GAN.GF_DIM == 32
    assert c.TRAIN.MAX_EPOCH == 600  # untouched defaults survive


def test_type_mismatch_raises():
    with pytest.raises(TypeError):
        config.cfg_from_string("TRAIN:\n  BATCH_SIZE: 'twenty'\n")
    with pytest.raises(TypeError):
        config.cfg_from_string("TRAIN:\n  FLAG: 3\n")
    # int→float promotion allowed
    c = config.cfg_from_string("TRAIN:\n  GENERATOR_LR: 1\n")
    assert c.TRAIN.GENERATOR_LR == 1


def test_apply_overrides_nested():
    c = config.default_cfg()
    config.apply_overrides(
        c, ["TRAIN.COEFF.KL=4.5", "GAN.GF_DIM=16", "TRAIN.FLAG=false"]
    )
    assert c.TRAIN.COEFF.KL == 4.5
    assert c.GAN.GF_DIM == 16
    assert c.TRAIN.FLAG is False
    with pytest.raises(ValueError):
        config.apply_overrides(c, ["NO_EQUALS_SIGN"])
    # same typo guard as the YAML merge path: a CLI --set installing the
    # wrong TYPE fails at the flag, not far from it (bool↔float, int↔str)
    with pytest.raises(TypeError):
        config.apply_overrides(c, ["TRAIN.ADAM_BETA1=true"])
    with pytest.raises(TypeError):
        config.apply_overrides(c, ["TRAIN.NET_G=1"])
    # legitimate cross-type overrides still pass: int→float promotion and
    # the "auto"↔bool tri-state perf levers
    config.apply_overrides(c, ["TRAIN.COEFF.KL=3", "GAN.S2D=true"])
    assert c.TRAIN.COEFF.KL == 3 and c.GAN.S2D is True


def test_dump_roundtrip(tmp_path):
    c = config.default_cfg()
    c.TRAIN.BATCH_SIZE = 7
    p = str(tmp_path / "c.yml")
    config.dump_cfg(c, p)
    c2 = config.cfg_from_file(p)
    assert c2 == c


def test_cli_resolution_precedence(tmp_path):
    cfg_file = tmp_path / "x.yml"
    cfg_file.write_text("DATA_DIR: from_yaml\nSEED: 5\n")
    parser = cli.base_parser("t")
    args = parser.parse_args(
        [
            "--cfg", str(cfg_file),
            "--data_dir", "from_flag",
            "--manualSeed", "9",
            "--set", "TRAIN.BATCH_SIZE=3",
        ]
    )
    c = cli.resolve_cfg(args)
    assert c.DATA_DIR == "from_flag"  # flag beats yaml
    assert c.SEED == 9
    assert c.TRAIN.BATCH_SIZE == 3


def test_tri_state_perf_levers():
    """GAN.S2D / GAN.D_TRUNK_BATCH default "auto" and resolve from
    TRAIN.BATCH_SIZE at step-build time (docs/PERF.md crossover A/Bs);
    explicit bools pin them, via YAML merge and --set alike."""
    from s2i_tpu.train import gan

    c = config.default_cfg()
    assert c.GAN.S2D == "auto" and c.GAN.D_TRUNK_BATCH == "auto"
    c.TRAIN.BATCH_SIZE = 24
    assert gan.s2d_enabled(c) and gan.d_trunk_batch_enabled(c)
    c.TRAIN.BATCH_SIZE = 48
    assert not gan.s2d_enabled(c) and gan.d_trunk_batch_enabled(c)
    c.TRAIN.BATCH_SIZE = 96
    assert not gan.s2d_enabled(c) and not gan.d_trunk_batch_enabled(c)
    # bool pin overrides the batch heuristic in both directions
    config.apply_overrides(c, ["GAN.S2D=true", "GAN.D_TRUNK_BATCH=true"])
    assert gan.s2d_enabled(c) and gan.d_trunk_batch_enabled(c)
    c2 = config.cfg_from_string("TRAIN:\n  BATCH_SIZE: 8\nGAN:\n  S2D: false\n")
    assert not gan.s2d_enabled(c2)
    # "auto" round-trips through dump/load and back over a bool
    c3 = config.cfg_from_string("GAN:\n  S2D: auto\n", base=c2)
    assert c3.GAN.S2D == "auto"


def test_resolve_perf_levers_per_device_batch():
    """On a data mesh the "auto" levers resolve from the PER-DEVICE batch
    (the crossover A/Bs are single-chip): 8-way global b96 runs b12
    kernels per chip and wants S2D + D_TRUNK_BATCH ON."""
    from s2i_tpu.train import gan

    c = config.default_cfg()
    c.TRAIN.BATCH_SIZE = 96
    gan.resolve_perf_levers(c, n_devices=8)
    assert c.GAN.S2D is True and c.GAN.D_TRUNK_BATCH is True
    assert c.GAN.S2D_MID is False  # "auto" = off at every batch

    c = config.default_cfg()
    c.TRAIN.BATCH_SIZE = 96
    gan.resolve_perf_levers(c, n_devices=1)
    assert c.GAN.S2D is False and c.GAN.D_TRUNK_BATCH is False

    # explicit bool pins survive resolution
    c = config.default_cfg()
    c.TRAIN.BATCH_SIZE = 96
    c.GAN.S2D = True
    gan.resolve_perf_levers(c, n_devices=1)
    assert c.GAN.S2D is True


def test_tri_state_lever_rejects_typos():
    """Any string other than "auto" is a config typo that bool() would
    silently pin ON — it must raise, at resolve and at read alike."""
    import pytest

    from s2i_tpu.train import gan

    c = config.default_cfg()
    c.GAN.S2D = "enabled"
    with pytest.raises(ValueError, match="S2D"):
        gan.s2d_enabled(c)
    with pytest.raises(ValueError, match="S2D"):
        gan.resolve_perf_levers(c)
    c.GAN.S2D = "auto "
    with pytest.raises(ValueError, match="S2D"):
        gan.s2d_enabled(c)
