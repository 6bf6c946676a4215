"""One-session END-TO-END workflow certification (VERDICT r4 item 4):
the reference's complete call-stack sequence (SURVEY.md §3.1→§3.4) run as
ONE chained workflow through the REAL CLIs, with per-stage wall-clock:

  1. fixture dataset (StackGAN+speech layout, tools/make_fixture_dataset)
  2. speech-encoder distillation pretrain   (scripts/pretrain_encoder.py)
  3. embedding extraction → speech-embeddings.pickle      (same CLI,
     --extract — the ONLY coupling between the two halves, §3.2)
  4. 3-stage GAN training ON the extracted speech embeddings (main.py)
  5. sampling the test split from the trained checkpoint   (main.py,
     TRAIN.FLAG=False — the reference B_VALIDATION path)
  6. fine-tuned-Inception IS + FID over the sampled images
     (scripts/finetune_inception.py + scripts/eval.py)

Unlike scripts/eval_smoke.py (its CPU-scale cousin, which skips the
encoder half and feeds the GAN the teacher pickles), every stage here is
the production one and the GAN consumes the embeddings stage 3 actually
extracted. Defaults are sized for a ~30-45 min single-TPU-chip session.

Outputs under --out: workflow.jsonl (one line per stage: argv, rc,
wall-clock, parsed artifacts) + the per-stage run dirs. Prints one
summary JSON line.

    python scripts/workflow_cert.py --out output/workflow_cert
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="output/workflow_cert")
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=100)
    ap.add_argument("--captions", type=int, default=2)
    ap.add_argument("--encoder_epochs", type=int, default=12,
                    help="≈600 steps on the 16x100x2 fixture (the encoder "
                    "cert's sweet spot)")
    ap.add_argument("--gan_epochs", type=int, default=15,
                    help="≈1000 steps at b24 on the 1584-image fixture — "
                    "enough for the FID to move well off init "
                    "(docs/QUALITY.md r4c: halves by step 1000)")
    ap.add_argument("--inc_epochs", type=int, default=40)
    ap.add_argument("--samples_per_emb", type=int, default=10)
    ap.add_argument("--audio_frames", type=int, default=256,
                    help="fixture wavs are 2.0 s = 201 frames")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--emb_dim", type=int, default=1024,
                    help="fixture embedding dim; must match TEXT.DIMENSION "
                    "when overridden via --set")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="extra config overrides appended to EVERY stage's "
                    "--set list (the CLIs share one config tree, so "
                    "ENCODER.*/GAN.*/TREE.* keys all resolve); lets the "
                    "CPU smoke test shrink the models")
    ap.add_argument("--stage_cooldown", type=int, default=-1,
                    help="seconds to sleep between device stages; -1 = "
                    "auto (120 when the axon TPU relay is configured, 0 "
                    "otherwise). The relay needs ~120 s between client "
                    "sessions — a back-to-back device-stage handoff "
                    "wedges the next session in backend-init (observed "
                    "round 5: stage 2->3 stalled 75+ min).")
    args = ap.parse_args()
    if args.stage_cooldown < 0:
        args.stage_cooldown = (
            120 if os.environ.get("PALLAS_AXON_POOL_IPS") else 0
        )
    os.makedirs(args.out, exist_ok=True)
    fixture = os.path.join(args.out, "fixture")
    log_path = os.path.join(args.out, "workflow.jsonl")
    stages = []

    def run(name: str, cmd: list, parse: dict | None = None,
            env: dict | None = None) -> dict:
        """Run one CLI stage, record wall-clock + parsed artifacts."""
        # Relay cooldown between device sessions (device stages inherit the
        # parent env; fixture-building CPU stages pass env=cpu_env and need
        # no cooldown before them).
        if env is None and args.stage_cooldown and stages:
            print(f"   (cooldown {args.stage_cooldown}s before {name})")
            time.sleep(args.stage_cooldown)
        print(f"== stage {len(stages) + 1}: {name}: {' '.join(cmd)}")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable] + cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        wall = round(time.time() - t0, 1)
        rec = {"stage": name, "argv": cmd, "rc": r.returncode,
               "wall_s": wall}
        for key, pattern in (parse or {}).items():
            m = re.search(pattern, r.stdout)
            rec[key] = m.group(1) if m else None
        # keep the last JSON line a stage prints (eval.py --json etc.)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                try:
                    rec["json"] = json.loads(line)
                except ValueError:
                    pass
                break
        stages.append(rec)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-6000:])
            raise SystemExit(f"stage {name} FAILED rc={r.returncode}")
        print(f"   done in {wall}s")
        return rec

    cpu_env = {**os.environ, "PALLAS_AXON_POOL_IPS": "",
               "JAX_PLATFORMS": "cpu"}

    # Stage 1 — fixture (CPU subprocess; the parent never touches a device,
    # each CLI stage owns the TPU session serially)
    if not os.path.exists(os.path.join(fixture, "train",
                                       "filenames.pickle")):
        run("fixture", [
            "tools/make_fixture_dataset.py", "--out", fixture,
            "--classes", str(args.classes),
            "--per_class", str(args.per_class),
            "--captions", str(args.captions),
            "--emb_dim", str(args.emb_dim),
        ], env=cpu_env)
    else:
        print(f"fixture exists: {fixture}")

    enc_common = [
        "--cfg", "cfg/pretrain_encoder_birds.yml",
        "--data_dir", fixture, "--manualSeed", str(args.seed),
        "--set", f"ENCODER.N_CLASSES={args.classes}",
        f"AUDIO.MAX_FRAMES={args.audio_frames}",
        f"OUTPUT_DIR={os.path.join(args.out, 'runs')}",
    ] + args.set

    # Stage 2 — §3.1 encoder pretrain
    rec = run("encoder_pretrain",
              ["scripts/pretrain_encoder.py", "--epochs",
               str(args.encoder_epochs)] + enc_common,
              parse={"run_dir": r"run dir: (\S+)"})
    enc_ckpt = os.path.join(rec["run_dir"], "ckpt")

    # Stage 3 — §3.2 embedding extraction (writes speech-embeddings.pickle
    # into the fixture tree; the GAN consumes THESE, not the teacher's)
    run("embedding_extraction",
        ["scripts/pretrain_encoder.py", "--extract", enc_ckpt] + enc_common,
        parse={"wrote": r"wrote (\S+?):"})

    # NB: each stage gets exactly ONE --set list (argparse nargs="*" keeps
    # only the last occurrence of the flag).
    gan_base = [
        "--cfg", "cfg/birds_3stages.yml",
        "--data_dir", fixture, "--manualSeed", str(args.seed),
    ]
    gan_set = [
        f"ENCODER.N_CLASSES={args.classes}",
        "TEXT.EMBEDDING_FILE=speech-embeddings.pickle",
        f"OUTPUT_DIR={os.path.join(args.out, 'runs')}",
    ] + args.set

    # Stage 4 — §3.3 GAN training on the extracted speech embeddings
    rec = run("gan_train",
              ["main.py"] + gan_base
              + ["--set"] + gan_set
              + [f"TRAIN.MAX_EPOCH={args.gan_epochs}",
                 "TRAIN.SNAPSHOT_INTERVAL=500"],
              parse={"run_dir": r"run dir: (\S+)"})
    gan_ckpt = os.path.join(rec["run_dir"], "ckpt")

    # Stage 5 — §3.4 sampling (B_VALIDATION path; EMA G + BN recalc per the
    # recipe EVAL block)
    rec = run("sampling",
              ["main.py"] + gan_base
              + ["--set"] + gan_set
              + ["TRAIN.FLAG=False", f"TRAIN.NET_G={gan_ckpt}",
                 f"EVAL.NUM_SAMPLES_PER_EMB={args.samples_per_emb}"],
              parse={"sample_dir": r"samples: (\S+)"})
    sample_dir = rec["sample_dir"]

    # Stage 6a — the IS/FID protocol classifier
    rec = run("finetune_inception",
              ["scripts/finetune_inception.py",
               "--data_dir", fixture, "--manualSeed", str(args.seed),
               "--epochs", str(args.inc_epochs), "--batch", "24",
               "--set"] + gan_set,
              parse={"run_dir": r"run dir: (\S+)"})
    inc_ckpt = os.path.join(rec["run_dir"], "ckpt")

    # Stage 6b — IS + FID over the sampled tree vs the real fixture images
    rec = run("eval_is_fid",
              ["scripts/eval.py",
               "--gen_dir", sample_dir,
               "--real_dir", os.path.join(fixture, "images"),
               "--finetuned_ckpt", inc_ckpt,
               "--num_classes", str(args.classes),
               "--splits", "5", "--batch", "32", "--json"])

    summary = {
        "pipeline": "fixture->pretrain->extract->gan_train->sample->"
                    "finetune_inception->is_fid",
        "stages": [
            {"stage": s["stage"], "wall_s": s["wall_s"]} for s in stages
        ],
        "total_wall_s": round(sum(s["wall_s"] for s in stages), 1),
        "metrics": rec.get("json"),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
