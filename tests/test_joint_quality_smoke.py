"""Integration: the joint-finetune quality-certification CLI (VERDICT r4
missing #2 — BASELINE config #4's quality story) runs end-to-end on a
tiny fixture and emits a well-formed convergence record chaining BOTH
harnesses: encoder pretrain → NET_E graft → joint GAN train → per-boundary
fixture-FID/IS (teacher- AND speech-conditioned) + retrieval/distill MSE.

Tiny sizes only prove plumbing here; the convergence CLAIM is certified
on-chip and recorded in docs/QUALITY.md.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_joint_quality_cert_smoke(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/joint_quality_cert.py",
            "--out", str(tmp_path),
            "--classes", "4", "--per_class", "3", "--captions", "2",
            "--pretrain_epochs", "1",
            "--steps", "2", "--eval_every", "1",
            "--inc_epochs", "1",
            "--eval_batch", "4", "--eval_n", "8", "--train_eval_n", "4",
            "--audio_frames", "64",
            "--set",
            "TEXT.DIMENSION=32", "TREE.BRANCH_NUM=1",
            "GAN.GF_DIM=8", "GAN.DF_DIM=8", "GAN.Z_DIM=16",
            "GAN.EMBEDDING_DIM=16",
            "TRAIN.BATCH_SIZE=4", "TRAIN.EMA_WARMUP=0",
            "EVAL.EMA_BN_RECALC=2",
            "ENCODER.BATCH_SIZE=4", "ENCODER.RNN_HIDDEN=16",
            "ENCODER.CONV_CHANNELS=[8,16]",
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-6000:]
    json_lines = [
        line for line in r.stdout.strip().splitlines()
        if line.startswith("{")
    ]
    assert json_lines, r.stdout[-6000:]
    summary = json.loads(json_lines[-1])
    assert summary["steps"] == 2
    with open(os.path.join(tmp_path, "results.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    # preamble line carries the interpretability floor
    assert recs[0].get("floor") is True
    assert recs[0]["real_real_fid"] >= 0.0
    curve = recs[1:]
    assert [rec["step"] for rec in curve] == [0, 1, 2]
    for rec in curve:
        # both conditioning axes scored at every boundary
        for k in ("fid", "raw_fid", "speech_fid"):
            assert rec[k] >= 0.0, k
        assert rec["is_mean"] >= 1.0
        assert 0.0 <= rec["test_r@1"] <= 1.0
        assert 0.0 <= rec["test_map"] <= 1.0
        assert rec["test_medr"] >= 1.0
        assert rec["test_mse"] >= 0.0
        assert 0.0 <= rec["proto_cls_acc"] <= 1.0
    # the joint step's distillation metric lands in the record
    assert "distill_mse" in curve[-1]
    with open(os.path.join(tmp_path, "summary.json")) as f:
        s = json.load(f)
    assert s["curve"] == curve
    assert s["real_real_fid"] == recs[0]["real_real_fid"]
    # grids for the product (speech-conditioned) path exist per eval point
    assert os.path.exists(
        os.path.join(tmp_path, "grids", "step_0000002.png")
    )
    # encoder pretrain left a checkpoint the joint phase grafted from
    assert os.listdir(os.path.join(tmp_path, "encoder", "ckpt"))
