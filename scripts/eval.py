"""Metrics CLI: Inception Score + FID over image dirs, retrieval over
embedding pickles (reference IS/FID scripts, SURVEY.md §2 L5 rows)."""
import sys, os, argparse, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def list_images(d, limit=None):
    paths = sorted(
        glob.glob(os.path.join(d, "**", "*.png"), recursive=True)
        + glob.glob(os.path.join(d, "**", "*.jpg"), recursive=True)
    )[:limit]
    if not paths:
        raise FileNotFoundError(f"no images under {d}")
    return paths


def extract_dir(ex, d, batch, limit=None, img_size=None):
    """Stream a directory through the extractor → (pool3, logits, n).

    Decodes per batch-size chunk — the 30k-image IS/FID protocol at 256 px
    is ~24 GB as a single float32 stack — and normalizes every image to one
    (H, W) canvas: ``img_size``, or the first image's size. Heterogeneously
    sized real photo sets (CUB/Oxford) get PIL-bilinear resized to the
    canvas; uniformly sized generated dirs pass through untouched (the
    extractor's on-device bilinear resize to 299 px is the only resample,
    exactly as before)."""
    from PIL import Image

    paths = list_images(d, limit)
    pools, logits, size = [], [], None
    for i in range(0, len(paths), batch):
        chunk = []
        for p in paths[i : i + batch]:
            im = Image.open(p).convert("RGB")
            if size is None:
                size = (img_size, img_size) if img_size else (im.height, im.width)
            if (im.height, im.width) != size:
                im = im.resize((size[1], size[0]), Image.BILINEAR)
            chunk.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        p3, lg = ex.extract(np.stack(chunk), batch)
        pools.append(p3)
        logits.append(lg)
    return np.concatenate(pools), np.concatenate(logits), len(paths)


def retrieval_main(args):
    import pickle

    from s2i_tpu.eval import retrieval_metrics

    def load(path):
        """Embedding pickle → ([N_rows, D] array, group ids).

        The extractor dumps [N_img, n_captions, D] (SURVEY.md §3.2); the
        image index is the retrieval group id — an image's other captions
        are positives too. A flat [N, D] pickle degrades to paired mode."""
        with open(path, "rb") as f:
            e = pickle.load(f)
        e = np.asarray(e, np.float32)
        if e.ndim == 3:
            ids = np.repeat(np.arange(e.shape[0]), e.shape[1])
            return e.reshape(-1, e.shape[-1]), ids
        return e.reshape(-1, e.shape[-1]), np.arange(e.shape[0])

    (q, qid), (t, tid) = load(args.retrieval[0]), load(args.retrieval[1])
    # Align by GROUP id (image index), not by row count: a [N,10,D] speech
    # pickle against an [N,D] image pickle has 10N vs N rows — row-level
    # truncation would strand target groups with zero positive queries and
    # crash the t2q direction. Keeping the common id range keeps every
    # query group matched with its targets in both directions.
    n_groups = min(int(qid.max()), int(tid.max())) + 1
    qm, tm = qid < n_groups, tid < n_groups
    if not (qm.all() and tm.all()):
        print(
            f"# group counts differ: keeping the common first {n_groups} "
            f"({int(qm.sum())} query rows, {int(tm.sum())} target rows)"
        )
    m = retrieval_metrics(
        q[qm], t[tm], query_ids=qid[qm], target_ids=tid[tm]
    )
    import json

    print(json.dumps(m, indent=2))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--retrieval", nargs=2, metavar=("QUERY_PKL", "TARGET_PKL"),
        help="speech<->teacher retrieval eval over two embedding pickles",
    )
    p.add_argument("--gen_dir", default=None, help="generated images")
    p.add_argument("--real_dir", default=None, help="real images (for FID)")
    p.add_argument("--weights", default=None, help="torch .pth state_dict")
    p.add_argument(
        "--finetuned_ckpt", default=None,
        help="orbax ckpt dir from scripts/finetune_inception.py",
    )
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument(
        "--img_size", type=int, default=None,
        help="host-side canvas for heterogeneously sized dirs (default: "
        "first image's size; uniform dirs are never resampled on host)",
    )
    p.add_argument(
        "--protocol", choices=("exact", "pytorch-fid"), default="exact",
        help="feature preprocessing: 'pytorch-fid' quantizes inputs through "
        "uint8 before the 299px resize (the saved-PNG protocol). For "
        "dir-based eval the two are IDENTICAL (decoded files are already "
        "uint8-quantized; tests/test_eval.py proves the no-op) — the knob "
        "matters for in-memory eval paths like s2i_tpu.eval.fid.fid_score "
        "on live generator outputs",
    )
    p.add_argument(
        "--json", action="store_true",
        help="print one machine-readable JSON line instead of text",
    )
    args = p.parse_args()
    if args.retrieval:
        retrieval_main(args)
        return
    if not args.gen_dir:
        p.error("--gen_dir required (or use --retrieval)")

    from s2i_tpu.eval import (
        InceptionFeatures,
        fid_from_stats,
        gaussian_stats,
        inception_score_from_probs,
    )

    variables = None
    num_classes = args.num_classes
    if args.weights:
        if args.weights.endswith(".pth") or args.weights.endswith(".pt"):
            import torch
            from s2i_tpu.eval.weights import load_torch_inception

            variables = load_torch_inception(
                torch.load(args.weights, map_location="cpu", weights_only=True)
            )
        else:
            raise ValueError("pass a torch .pth state_dict")
    elif args.finetuned_ckpt:
        import jax
        from s2i_tpu.eval.finetune import init_inception_state
        from s2i_tpu.utils import CheckpointManager

        _, state = init_inception_state(num_classes, jax.random.key(0))
        mgr = CheckpointManager(args.finetuned_ckpt)
        restored = mgr.restore_latest(state)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(args.finetuned_ckpt)
        variables = {
            "params": restored[0].params,
            "batch_stats": restored[0].batch_stats,
        }
    ex = InceptionFeatures(
        variables, num_classes=num_classes,
        quantize_input=args.protocol == "pytorch-fid",
    )
    # ONE extractor pass over the generated set: extract() returns pool3 and
    # logits together, so IS (logits) and FID (pool3) share it — calling
    # inception_score + fid_score would run the dominant device pass twice
    # at the 30k-image protocol.
    gen_pool, gen_logits, n_gen = extract_dir(
        ex, args.gen_dir, args.batch, args.limit, args.img_size
    )
    gen_logits = gen_logits - gen_logits.max(axis=1, keepdims=True)
    e = np.exp(gen_logits)
    mean, std = inception_score_from_probs(
        e / e.sum(axis=1, keepdims=True), args.splits
    )
    trained = bool(args.weights or args.finetuned_ckpt)
    fid = None
    if args.real_dir:
        real_pool, _, _ = extract_dir(
            ex, args.real_dir, args.batch, args.limit, args.img_size
        )
        fid = fid_from_stats(
            *gaussian_stats(gen_pool), *gaussian_stats(real_pool)
        )
    if args.json:
        import json

        rec = {
            "is_mean": round(float(mean), 4),
            "is_std": round(float(std), 4),
            "n_gen": int(n_gen),
            "inception": "finetuned" if trained else "random-weight",
        }
        if fid is not None:
            rec["fid"] = round(float(fid), 4)
        print(json.dumps(rec))
        return
    print(f"IS: {mean:.4f} +- {std:.4f}" + ("" if trained else "  [random-weight Inception: plumbing only]"))
    if fid is not None:
        print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
