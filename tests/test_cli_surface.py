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


def test_profile_trace_analyzer(tmp_path, capsys):
    """scripts/profile_step.py --analyze-only ranks device-plane ops from a
    perfetto trace (synthetic fixture; device events counted, host skipped)."""
    import gzip
    import json
    import sys

    sys.path.insert(0, "scripts")
    import profile_step

    trace = {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "process_name", "pid": 2,
             "args": {"name": "/host:CPU"}},
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1",
             "ts": 0, "dur": 3000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.1",
             "ts": 4000, "dur": 1000},
            {"ph": "X", "pid": 1, "tid": 1, "name": "conv.2",
             "ts": 8000, "dur": 1500},
            {"ph": "X", "pid": 2, "tid": 1, "name": "host_noise",
             "ts": 0, "dur": 99999},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        json.dump(trace, f)
    profile_step.analyze(str(tmp_path), top=5)
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert lines[0]["op"] == "fusion.1" and lines[0]["total_ms"] == 4.0
    assert lines[0]["count"] == 2
    assert lines[1]["op"] == "conv.2"
    assert all(r["op"] != "host_noise" for r in lines)
