"""Capture a jax.profiler trace of the GAN train step and rank device ops.

Answers "where do the 46 ms go" with real device timings instead of
cost-model inference (docs/PERF.md step decomposition ranks phases; this
ranks individual fused ops). Writes the trace under --out and, if the
device plane is present, prints the top-N ops by total self time.

Usage: python scripts/profile_step.py [--steps 8] [--out /tmp/s2i_trace]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(out_dir: str, steps: int, batch_size: int = 24) -> None:
    import jax
    import jax.numpy as jnp

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.DTYPE.COMPUTE = "bfloat16"
    # GAN.S2D / GAN.D_TRUNK_BATCH default "auto": profile the program the
    # trainer would actually run at this batch size (docs/PERF.md)
    cfg.TRAIN.BATCH_SIZE = batch_size
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(num_classes=8, examples_per_class=3)
    batch = jax.tree.map(
        jnp.asarray,
        {k: v for k, v in ds.batch(np.arange(batch_size) % ds.n).items()
         if k != "class_id"},
    )
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state, _ = step(state, batch, jax.random.key(1))  # compile outside trace
    jax.block_until_ready(state)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, _ = step(state, batch, jax.random.key(1))
        jax.block_until_ready(state)
    # the relay's block_until_ready can return early; force a readback
    float(jnp.sum(jax.tree.leaves(state.g_params)[0].astype(jnp.float32)))


def analyze(out_dir: str, top: int = 30) -> None:
    paths = glob.glob(
        os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace.json.gz produced (relay backend may not support "
              "device tracing); raw artifacts:", flush=True)
        for p in glob.glob(os.path.join(out_dir, "**", "*"), recursive=True):
            print(" ", p)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-plane rows carry pid/tid names like "/device:TPU:0" or "XLA Ops"
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur_by_name: dict[str, float] = {}
    n_by_name: dict[str, int] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur_by_name[name] = dur_by_name.get(name, 0.0) + float(e["dur"])
        n_by_name[name] = n_by_name.get(name, 0) + 1
    total = sum(dur_by_name.values())
    print(f"device planes: {sorted(set(pid_names.values()))}")
    print(f"total device op time: {total/1e3:.2f} ms across "
          f"{sum(n_by_name.values())} events")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(json.dumps({
            "op": name[:120],
            "total_ms": round(dur / 1e3, 3),
            "count": n_by_name[name],
            "share": round(dur / max(total, 1e-9), 4),
        }))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--out", default="/tmp/s2i_trace")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.steps, args.batch)
    analyze(args.out)


if __name__ == "__main__":
    main()
