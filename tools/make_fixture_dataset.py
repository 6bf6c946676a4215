"""Generate a complete synthetic dataset tree in the StackGAN+speech layout
(docs/DATA.md) so every real-data code path — loaders, encoder pretrain from
wavs, extraction, GAN training, sampling, eval — can be driven end-to-end
without the external CUB/Oxford assets.

    python tools/make_fixture_dataset.py --out data/fixture \
        --classes 8 --per_class 4 --captions 3
    python scripts/pretrain_encoder.py --cfg cfg/debug_tiny.yml \
        --data_dir data/fixture --set DATASET_NAME=birds ...
"""
import sys, os, argparse, pickle
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from s2i_tpu.audio.wavio import write_wav
from tools.synthesize_speech import tone_synthesize


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--per_class", type=int, default=4)
    p.add_argument("--captions", type=int, default=3)
    p.add_argument("--emb_dim", type=int, default=1024)
    p.add_argument("--image_size", type=int, default=304)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--test_per_class", type=int, default=1,
                   help="held-out images per class. With 1, each class's "
                   "held-out teacher embedding ≈ its prototype, so "
                   "nearest-prototype accuracy and gallery R@1 are "
                   "near-degenerate in the encoder certs (ADVICE r4) — "
                   "hold out >=2 to measure class structure independently "
                   "of image retrieval")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    if args.per_class < args.test_per_class + 1:
        p.error(
            "--per_class must exceed --test_per_class: the last "
            "test_per_class items of each class go to the test split, the "
            "rest to train (an empty train split trains nothing)"
        )
    from PIL import Image

    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    emb_protos = rng.normal(size=(args.classes, args.emb_dim)).astype(np.float32)
    yy, xx = np.meshgrid(
        np.linspace(0, 4, args.image_size), np.linspace(0, 4, args.image_size),
        indexing="ij",
    )

    splits = {"train": {}, "test": {}}
    for k in range(args.classes):
        freq = rng.normal(size=(2, 3)) * 2.0
        for j in range(args.per_class):
            name = f"class_{k:03d}/img_{j:04d}"
            split = (
                "test"
                if j >= args.per_class - args.test_per_class
                else "train"
            )
            # Class identity = the grating frequencies; per-image nuisance
            # variation = continuous phase, amplitude, and DC offset per
            # channel. Without the nuisance dims every class is a 1-D
            # (integer-phase) family a discriminator memorizes outright —
            # the round-4 convergence cert showed D saturating on that
            # degenerate fixture while G received only adversarial-noise
            # gradients. The nuisance dims give the conditional GAN a real
            # (if simple) manifold to cover per class.
            phase = rng.uniform(0, 2 * np.pi, size=3)
            amp = rng.uniform(70.0, 120.0, size=3)
            dc = rng.uniform(-25.0, 25.0, size=3)
            img = np.stack(
                [
                    127
                    + dc[c]
                    + amp[c] * np.sin(freq[0, c] * yy + freq[1, c] * xx + phase[c])
                    for c in range(3)
                ],
                -1,
            )
            img = np.clip(img, 0, 255).astype(np.uint8)
            path = os.path.join(args.out, "images", name + ".jpg")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(img).save(path, quality=92)
            emb = (
                emb_protos[k][None]
                + 0.1 * rng.normal(size=(args.captions, args.emb_dim))
            ).astype(np.float32)
            splits[split].setdefault("names", []).append(name)
            splits[split].setdefault("embs", []).append(emb)
            splits[split].setdefault("cls", []).append(k)
            wav_dir = os.path.join(args.out, "audio", name)
            os.makedirs(wav_dir, exist_ok=True)
            for c in range(args.captions):
                write_wav(
                    os.path.join(wav_dir, f"{c}.wav"),
                    tone_synthesize(f"class {k} caption {c} item {j}",
                                    args.sample_rate, seconds=2.0),
                    args.sample_rate,
                )

    for split, d in splits.items():
        sd = os.path.join(args.out, split)
        os.makedirs(sd, exist_ok=True)
        with open(os.path.join(sd, "filenames.pickle"), "wb") as f:
            pickle.dump(d["names"], f)
        with open(os.path.join(sd, "char-CNN-RNN-embeddings.pickle"), "wb") as f:
            pickle.dump(np.stack(d["embs"]), f)
        with open(os.path.join(sd, "class_info.pickle"), "wb") as f:
            pickle.dump(d["cls"], f)
        print(f"{split}: {len(d['names'])} images x {args.captions} captions")
    print(f"fixture dataset at {args.out}")


if __name__ == "__main__":
    main()
