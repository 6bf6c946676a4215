"""Validate a DATA_DIR against the expected StackGAN+speech layout
(docs/DATA.md): pickle shapes, image coverage, wav coverage, split sanity.
Exit code 0 = complete; prints a machine-readable JSON report.
"""
import sys, os, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from s2i_tpu.data.stackgan import StackGanSplit


def check_split(data_dir, split):
    rep = {"split": split, "ok": True, "problems": []}
    try:
        s = StackGanSplit(data_dir, split)
    except Exception as e:
        return {"split": split, "ok": False, "problems": [f"load failed: {e}"]}
    rep["examples"] = len(s)
    rep["captions_per_image"] = s.captions_per_image
    rep["embedding_dim"] = int(s.embeddings.shape[-1])
    missing_img, missing_wav = 0, 0
    for i in range(len(s)):
        try:
            s.image_path(i)
        except FileNotFoundError:
            missing_img += 1
        try:
            s.wav_path(i, 0)
        except FileNotFoundError:
            missing_wav += 1
    if missing_img:
        rep["ok"] = False
        rep["problems"].append(f"{missing_img} images missing")
    if missing_wav:
        rep["problems"].append(f"{missing_wav} wav trees missing (speech mode unavailable)")
    rep["has_bboxes"] = s.bboxes is not None
    speech_emb = os.path.join(data_dir, split, "speech-embeddings.pickle")
    rep["has_speech_embeddings"] = os.path.exists(speech_emb)
    return rep


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    args = p.parse_args()
    report = [check_split(args.data_dir, sp) for sp in ("train", "test")]
    print(json.dumps(report, indent=2))
    sys.exit(0 if all(r["ok"] for r in report) else 1)


if __name__ == "__main__":
    main()
