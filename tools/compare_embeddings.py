"""Embedding bit-comparability harness (SURVEY.md §4 'Golden/parity',
BASELINE's 'bit-comparable embeddings'): compare two embedding pickles
(e.g. ours vs a reference export, or two runs) and report agreement stats.

    python tools/compare_embeddings.py a.pickle b.pickle [--rtol 1e-5]
"""
import sys, os, argparse, json, pickle
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def load(path):
    with open(path, "rb") as f:
        try:
            e = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            e = pickle.load(f, encoding="latin1")
    return np.asarray(e, np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("--rtol", type=float, default=1e-5)
    args = p.parse_args()
    a, b = load(args.a), load(args.b)
    if a.shape != b.shape:
        print(json.dumps({"match": False, "reason": f"shape {a.shape} vs {b.shape}"}))
        sys.exit(1)
    a2, b2 = a.reshape(-1, a.shape[-1]), b.reshape(-1, b.shape[-1])
    diff = np.abs(a2 - b2)
    denom = np.maximum(np.abs(a2), np.abs(b2)) + 1e-12
    cos = np.sum(a2 * b2, -1) / (
        np.linalg.norm(a2, axis=-1) * np.linalg.norm(b2, axis=-1) + 1e-12
    )
    rep = {
        "shape": list(a.shape),
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "max_rel_diff": float((diff / denom).max()),
        "min_cosine": float(cos.min()),
        "mean_cosine": float(cos.mean()),
        "bitwise_equal": bool(np.array_equal(a2, b2)),
        "match": bool(np.allclose(a2, b2, rtol=args.rtol, atol=args.rtol)),
    }
    print(json.dumps(rep, indent=2))
    sys.exit(0 if rep["match"] else 1)


if __name__ == "__main__":
    main()
