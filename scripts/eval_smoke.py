"""One-command offline eval pipeline smoke (VERDICT r1 item 5):

    fixture dataset -> short GAN train -> sample test split ->
    finetune Inception on the fixture classes -> IS + FID as JSON.

Every stage runs through its real CLI in a subprocess, so this exercises
exactly what a user types (SURVEY.md §2 IS/FID rows; BASELINE.md protocol).
Tiny sizes make it feasible on the 1-core CPU box:

    python scripts/eval_smoke.py --out /tmp/eval_smoke

Prints one JSON line: {"is_mean": ..., "is_std": ..., "fid": ..., ...}.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    r = subprocess.run(
        [sys.executable] + cmd,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        **kw,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:])
        raise SystemExit(f"FAILED: {' '.join(cmd)} (rc={r.returncode})")
    return r.stdout


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="work dir (default: tmp)")
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2, help="GAN epochs")
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="eval_smoke_")
    os.makedirs(out, exist_ok=True)
    fixture = os.path.join(out, "fixture")

    # 1. synthetic dataset in the real StackGAN+speech layout
    run(
        [
            "tools/make_fixture_dataset.py", "--out", fixture,
            "--classes", str(args.classes), "--per_class", "4",
            "--captions", "2", "--emb_dim", "32", "--image_size", "96",
        ]
    )

    common = [
        "--cfg", "cfg/debug_tiny.yml",
        "--data_dir", fixture,
        "--set", "DATASET_NAME=birds", "TREE.BRANCH_NUM=1",
        "TEXT.DIMENSION=32", "TRAIN.BATCH_SIZE=4",
    ]

    # 2. short GAN train on the fixture
    log = run(
        ["main.py", "--output_dir", os.path.join(out, "gan")]
        + common
        + [f"TRAIN.MAX_EPOCH={args.epochs}"]
    )
    m = re.search(r"run dir: (\S+)", log)
    assert m, log[-2000:]
    gan_run = m.group(1)

    # 3. sample the test split through the trained G
    log = run(
        ["main.py", "--output_dir", os.path.join(out, "sample")]
        + common
        + ["TRAIN.FLAG=False", f"TRAIN.NET_G={os.path.join(gan_run, 'ckpt')}"]
    )
    m = re.search(r"samples: (\S+)", log)
    assert m, log[-2000:]
    sample_dir = m.group(1)

    # 4. finetune Inception on the fixture's classes (tiny input size)
    log = run(
        [
            "scripts/finetune_inception.py",
            "--output_dir", os.path.join(out, "inception"),
        ]
        + common
        + [
            f"ENCODER.N_CLASSES={args.classes}",
            "--epochs", "2", "--batch", "6",
            "--image_size", "96", "--base_size", "96",
        ]
    )
    m = re.search(r"run dir: (\S+)", log)
    assert m, log[-2000:]
    inception_run = m.group(1)

    # 5. IS + FID with the fine-tuned checkpoint
    log = run(
        [
            "scripts/eval.py",
            "--gen_dir", sample_dir,
            "--real_dir", os.path.join(fixture, "images"),
            "--finetuned_ckpt", os.path.join(inception_run, "ckpt"),
            "--num_classes", str(args.classes),
            "--splits", "2", "--batch", "6", "--json",
        ]
    )
    rec = json.loads(log.strip().splitlines()[-1])
    rec["pipeline"] = "fixture->train->sample->finetune_inception->eval"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
