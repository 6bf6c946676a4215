"""Integration: the end-to-end workflow certification CLI (VERDICT r4
item 4 — SURVEY.md §3.1→§3.4's full call-stack sequence) runs every
production stage through the REAL CLIs on a tiny fixture and emits a
well-formed per-stage record: fixture → encoder pretrain → embedding
extraction → GAN train ON the extracted embeddings → sampling →
fine-tuned-Inception IS/FID.

Tiny sizes only prove plumbing/chaining here; the on-chip run recorded in
docs/QUALITY.md is the certification.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_workflow_cert_smoke(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "scripts/workflow_cert.py",
            "--out", str(tmp_path),
            "--classes", "4", "--per_class", "10", "--captions", "2",
            "--encoder_epochs", "1", "--gan_epochs", "1",
            "--inc_epochs", "1", "--samples_per_emb", "2",
            "--audio_frames", "64", "--emb_dim", "32",
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
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    stage_names = [s["stage"] for s in summary["stages"]]
    assert stage_names == [
        "fixture", "encoder_pretrain", "embedding_extraction",
        "gan_train", "sampling", "finetune_inception", "eval_is_fid",
    ]
    assert summary["metrics"]["is_mean"] >= 1.0
    assert summary["metrics"]["fid"] >= 0.0
    assert summary["metrics"]["inception"] == "finetuned"
    # every stage recorded rc=0 + wall-clock in the jsonl
    with open(os.path.join(tmp_path, "workflow.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [rec["stage"] for rec in recs] == stage_names
    assert all(rec["rc"] == 0 for rec in recs)
    assert all(rec["wall_s"] > 0 for rec in recs)
    # the GAN consumed the embeddings stage 3 extracted (the §3.2 coupling)
    assert os.path.exists(os.path.join(
        tmp_path, "fixture", "train", "speech-embeddings.pickle"))
