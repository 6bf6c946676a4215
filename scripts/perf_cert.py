"""Perf certification: measured step time cross-checked against XLA's own
cost model (VERDICT r1 item 4 — "re-certify the perf claims").

For the headline GAN step and the mel frontend, this prints JSON with:
  - xla_gflop:  FLOPs per executable, from compiled.cost_analysis()
                (the compiler's count of the program actually executed —
                no hand FLOP arithmetic to get wrong);
  - best/median step time over per-call-synced trials;
  - implied TFLOP/s and MFU against chip peak (TPU v5e: ~197 bf16 / ~98
    fp32-on-MXU nominal; fp32-HIGHEST mels run ~1/4-1/8 of bf16 peak).

Per-call block_until_ready + unique inputs per call: no dispatch pipelining
or caching can inflate the numbers. Best-of-trials is still reported (the
relay throttles ~10x after a burst; see bench.py docstring), with the
median alongside so both regimes are visible.

Usage:  python scripts/perf_cert.py [--what gan|mel|both]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12
V5E_FP32_PEAK = 49e12  # nominal fp32 (no MXU bf16 passes): ~1/4 of bf16


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def cert_gan() -> dict:
    import jax

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.DTYPE.COMPUTE = "bfloat16"
    batch_size = 24
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(num_classes=8, examples_per_class=3)
    batch = {
        k: v
        for k, v in ds.batch(np.arange(batch_size)).items()
        if k != "class_id"
    }
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    lowered = step.lower(state, batch, jax.random.key(1))
    compiled = lowered.compile()
    gflop = _flops_of(compiled) / 1e9

    state, _ = step(state, batch, jax.random.key(1))
    jax.block_until_ready(state)
    times = []
    for _ in range(24):
        t0 = time.perf_counter()
        state, _ = step(state, batch, jax.random.key(1))
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)
    best, med = min(times), float(np.median(times))
    return {
        "what": "gan_step_256px_b24_bf16",
        "xla_gflop_per_step": round(gflop, 1),
        "best_step_s": round(best, 5),
        "median_step_s": round(med, 5),
        "best_imgs_per_sec": round(batch_size / best, 1),
        "best_tflops": round(gflop / best / 1e3, 1),
        "best_mfu_vs_bf16_peak": round(gflop * 1e9 / best / V5E_BF16_PEAK, 3),
    }


def cert_mel() -> dict:
    import jax
    import jax.numpy as jnp

    from s2i_tpu.audio.frontend import FrontendParams
    from s2i_tpu.ops.mel_kernel import logmel_pallas

    p = FrontendParams()
    rng = np.random.default_rng(0)
    n = 12
    wavs = [
        jnp.asarray(rng.standard_normal((8, 64000)).astype(np.float32))
        for _ in range(n)
    ]
    fn = jax.jit(lambda w: logmel_pallas(w, p))
    compiled = fn.lower(wavs[0]).compile()
    gflop = _flops_of(compiled) / 1e9
    out = fn(wavs[0])
    jax.block_until_ready(out)
    n_frames = out.shape[0] * out.shape[1]
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(wavs[i]))
        times.append(time.perf_counter() - t0)
    best, med = min(times), float(np.median(times))
    return {
        "what": "mel_frontend_8x64000_fp32",
        "xla_gflop_per_call": round(gflop, 2),
        "best_call_s": round(best, 5),
        "median_call_s": round(med, 5),
        "best_frames_per_sec": round(n_frames / best, 0),
        "best_tflops": round(gflop / best / 1e3, 2),
        "best_mfu_vs_fp32_peak": round(gflop * 1e9 / best / V5E_FP32_PEAK, 3),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", choices=["gan", "mel", "both"], default="both")
    args = ap.parse_args()
    out = []
    if args.what in ("gan", "both"):
        out.append(cert_gan())
    if args.what in ("mel", "both"):
        out.append(cert_mel())
    for rec in out:
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
