"""Measure the pipelined Inception feature-extraction rate (VERDICT r3
item 9 / r4 item 6): imgs/sec through ``eval.features.InceptionFeatures``
— the depth-1 dispatch pipeline that feeds both IS and FID (SURVEY.md §2
"Inception Score"/"FID" rows; 30k-image protocol scale).

Synthetic [-1,1] images at the GAN's top scale (256 px, the production
input — the extractor resizes to 299 on-device); randomized content so
XLA can't fold anything. Best-of over trial blocks, per the throttling
methodology in docs/PERF.md: the chip collapses ~10x after a burst, so
the steady-state claim is the best block, and the table reports all
blocks.

    python scripts/bench_features.py --n 512 --batch 64 --blocks 4
"""
import sys, os, argparse, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=512, help="images per block")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--size", type=int, default=256,
                    help="input scale (the GAN's top scale)")
    ap.add_argument("--num_classes", type=int, default=16)
    ap.add_argument("--quantize", type=int, default=1,
                    help="pytorch-fid protocol knob (the cert default)")
    args = ap.parse_args()

    import jax

    from s2i_tpu.eval import InceptionFeatures

    print(f"backend: {jax.default_backend()}")
    ex = InceptionFeatures(
        num_classes=args.num_classes, quantize_input=bool(args.quantize)
    )
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (args.n, args.size, args.size, 3)).astype(
        np.float32
    )
    # warmup block: pays compile + first-dispatch costs
    t0 = time.time()
    pool, logits = ex.extract(imgs[: args.batch * 2], args.batch)
    warm = time.time() - t0
    assert pool.shape[1] == 2048 and np.isfinite(pool).all()

    rates = []
    for b in range(args.blocks):
        t0 = time.time()
        pool, _ = ex.extract(imgs, args.batch)
        dt = time.time() - t0
        rates.append(args.n / dt)
        print(f"  block {b}: {args.n} imgs in {dt:.2f}s = "
              f"{rates[-1]:.1f} imgs/sec")
    print(json.dumps({
        "metric": "inception_feature_extraction",
        "imgs_per_sec_best": round(max(rates), 1),
        "imgs_per_sec_all": [round(r, 1) for r in rates],
        "n": args.n, "batch": args.batch, "size": args.size,
        "quantize_input": bool(args.quantize),
        "warmup_s": round(warm, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
