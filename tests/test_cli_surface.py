"""CLI-surface smoke: every YAML config loads and merges; every script and
tool imports and prints --help (catches import-time breakage without
running heavy work)."""

import glob
import os
import subprocess
import sys

import pytest

from s2i_tpu import config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "cfg", "*.yml")))
)
def test_all_configs_load(path):
    cfg = config.cfg_from_file(path)
    assert cfg.TREE.BRANCH_NUM in (1, 2, 3)
    assert cfg.TEXT.DIMENSION > 0


def test_all_scripts_have_help():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    scripts = sorted(
        glob.glob(os.path.join(REPO, "scripts", "*.py"))
        + glob.glob(os.path.join(REPO, "tools", "*.py"))
        + [os.path.join(REPO, "main.py")]
    )
    assert len(scripts) >= 9
    for s in scripts:
        r = subprocess.run(
            [sys.executable, s, "--help"],
            capture_output=True,
            text=True,
            timeout=240,
            env=env,
            cwd=REPO,
        )
        assert r.returncode == 0, f"{os.path.basename(s)}: {r.stderr[-500:]}"
        assert "usage" in r.stdout.lower(), os.path.basename(s)
