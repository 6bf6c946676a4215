"""Offline speech-caption synthesis hook (SURVEY.md §2 row "Speech caption
corpus": the reference distributes TTS-synthesized wavs for every CUB/Oxford
text caption, generated with a commercial TTS API; the framework consumes
wavs and does not synthesize).

This tool materializes the expected ``DATA_DIR/audio/<image-id>/<k>.wav``
tree from caption text files, via either:

  --cmd 'some_tts --text {text} --out {out}'   # any local TTS binary
  --tone                                       # deterministic tone fixture
                                               # (dev/testing without TTS)

Caption sources: StackGAN text layout ``text_c10/<id>.txt`` (one caption per
line) or ``--captions captions.json`` mapping id → [caption, ...].
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import shlex
import subprocess
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2i_tpu.audio.wavio import write_wav  # noqa: E402


def _stable_hash(text: str) -> int:
    # built-in hash() is salted per process (PYTHONHASHSEED), which made
    # "deterministic" fixtures differ on every run; crc32 is stable.
    return zlib.crc32(text.encode("utf-8"))


def tone_synthesize(text: str, sample_rate: int, seconds: float = 3.0) -> np.ndarray:
    """Deterministic text-dependent tone sequence — a fixture generator so the
    full pipeline (frontend → encoder → GAN) runs end-to-end without TTS."""
    rng = np.random.default_rng(_stable_hash(text))
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    out = np.zeros(n, np.float32)
    for word in text.split()[:12]:
        f = 200.0 + (_stable_hash(word) % 2000)
        start = rng.integers(0, max(1, n - sample_rate // 4))
        dur = sample_rate // 4
        seg = slice(int(start), int(start) + dur)
        out[seg] += 0.2 * np.sin(2 * np.pi * f * t[: dur]).astype(np.float32)
    out += 0.01 * rng.standard_normal(n).astype(np.float32)
    return np.clip(out, -1, 1)


def load_captions(data_dir: str, split: str, captions_json: str | None):
    with open(os.path.join(data_dir, split, "filenames.pickle"), "rb") as f:
        names = pickle.load(f)
    if captions_json:
        with open(captions_json) as f:
            table = json.load(f)
        return [(n, table[n]) for n in names]
    out = []
    for n in names:
        txt = os.path.join(data_dir, "text_c10", n + ".txt")
        with open(txt) as f:
            out.append((n, [line.strip() for line in f if line.strip()]))
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--splits", nargs="*", default=["train", "test"])
    p.add_argument("--captions", default=None, help="optional captions.json")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument(
        "--cmd",
        default=None,
        help="TTS command template with {text} and {out} placeholders",
    )
    p.add_argument("--tone", action="store_true", help="tone-fixture synthesis")
    args = p.parse_args()
    if not args.cmd and not args.tone:
        p.error("pass --cmd TEMPLATE or --tone")

    for split in args.splits:
        for name, captions in load_captions(args.data_dir, split, args.captions):
            out_dir = os.path.join(args.data_dir, "audio", name)
            os.makedirs(out_dir, exist_ok=True)
            for k, text in enumerate(captions):
                out_path = os.path.join(out_dir, f"{k}.wav")
                if os.path.exists(out_path):
                    continue
                if args.tone:
                    write_wav(
                        out_path,
                        tone_synthesize(text, args.sample_rate),
                        args.sample_rate,
                    )
                else:
                    cmd = args.cmd.format(text=shlex.quote(text), out=out_path)
                    subprocess.run(cmd, shell=True, check=True)
        print(f"{split}: done")


if __name__ == "__main__":
    main()
