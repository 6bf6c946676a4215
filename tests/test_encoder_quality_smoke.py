"""Integration: the encoder-quality certification CLI (the distillation
twin of scripts/quality_cert.py) runs end-to-end on a tiny fixture and
emits a well-formed convergence record (results.jsonl + summary.json).

Tiny sizes only prove plumbing here; the convergence CLAIM (R@1 rising,
test MSE falling over a real budget) is certified on-chip and recorded
in docs/QUALITY.md.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_encoder_quality_cert_smoke(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/encoder_quality_cert.py",
            "--out", str(tmp_path),
            "--classes", "4", "--per_class", "3", "--captions", "2",
            "--steps", "4", "--eval_every", "2", "--train_eval_n", "4",
            "--set", "TEXT.DIMENSION=32", "ENCODER.BATCH_SIZE=4",
            "ENCODER.RNN_HIDDEN=16", "ENCODER.CONV_CHANNELS=[8,16]",
            "AUDIO.MAX_FRAMES=128",
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-4000:]
    json_lines = [
        line for line in r.stdout.strip().splitlines()
        if line.startswith("{")
    ]
    assert json_lines, r.stdout[-4000:]
    summary = json.loads(json_lines[-1])
    assert summary["steps"] == 4
    with open(os.path.join(tmp_path, "results.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [rec["step"] for rec in recs] == [0, 2, 4]
    for rec in recs:
        # retrieval metrics are rates in [0,1]; medR is a 1-based rank
        assert 0.0 <= rec["test_r@1"] <= 1.0
        assert 0.0 <= rec["test_map"] <= 1.0
        assert rec["test_medr"] >= 1.0
        assert rec["test_mse"] >= 0.0
        assert 0.0 <= rec["proto_cls_acc"] <= 1.0
    # the training metric keys from the last chunk's step land in the record
    assert "mse" in recs[-1] and "loss" in recs[-1]
    with open(os.path.join(tmp_path, "summary.json")) as f:
        s = json.load(f)
    assert s["curve"] == recs
