"""Perf certification: measured step time cross-checked against XLA's own
cost model (VERDICT r1 item 4 — "re-certify the perf claims").

Measurement integrity: on this container's relay-tunneled TPU,
``jax.block_until_ready`` returns ~immediately even with >30 ms of compute
in flight (measured: a 50-chained-4096³-matmul program "completed" in
0.07 ms → 105,000 "TFLOPs"), so any timing built on it is unreliable.
The only sync that cannot lie is a host readback of bytes. Method:

  1. chain K data-dependent iterations inside ONE jitted lax.scan,
  2. reduce the result to a scalar ON DEVICE (tiny, compile-free readback),
  3. time float(...) for two chain lengths and difference them —
     fixed costs (relay RTT ~32 ms, dispatch, transfer) cancel exactly.

Calibration on a known-FLOP matmul chain: 0.713 ms/matmul measured vs
0.70 ms theoretical at the chip's 197 bf16 TFLOPs peak (within 2%).

Prints one JSON line per certified program with the XLA-counted FLOPs
(compiled.cost_analysis — the compiler's count of the executable, no hand
arithmetic), the differenced per-step time, and the implied MFU.

Usage:  python scripts/perf_cert.py [--what gan|mel|both]
"""
import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _timed(fn, *args, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _build_gan_runner(batch_size: int = 24, joint: bool = False, **cfg_overrides):
    """(run_k, state, batch, gflop_per_step) for one GAN-step variant.

    ``joint=True`` builds the BASELINE config #4 step (SURVEY.md §3.5): the
    full-size speech encoder (conv stack + bi-GRU over MAX_FRAMES mel
    features) inside the G phase, cfg/birds_joint_ft.yml loss stack
    (DISTILL=1, COLOR=50)."""
    import jax
    import jax.numpy as jnp

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset, SyntheticSpeechDataset
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.DTYPE.COMPUTE = "bfloat16"
    # training-recipe parity: every dataset YAML sets COLOR_LOSS=50, so the
    # certified step must carry the color-consistency term too
    cfg.TRAIN.COEFF.COLOR_LOSS = 50.0
    # "auto" perf levers (GAN.S2D / GAN.D_TRUNK_BATCH) resolve from this;
    # explicit cfg_overrides below still pin either one for A/Bs
    cfg.TRAIN.BATCH_SIZE = batch_size
    if joint:
        cfg.TRAIN.JOINT_FT = True
        cfg.TRAIN.COEFF.DISTILL = 1.0  # cfg/birds_joint_ft.yml
    for key, val in cfg_overrides.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], val)
    models = gan.build_models(cfg, joint=joint)
    ds = SyntheticGanDataset(num_classes=8, examples_per_class=3)
    batch = {
        k: v
        for k, v in ds.batch(np.arange(batch_size) % ds.n).items()
        if k != "class_id"
    }
    if joint:
        sp = SyntheticSpeechDataset(
            num_classes=8,
            examples_per_class=3,
            max_frames=int(cfg.AUDIO.MAX_FRAMES),
            n_mels=int(cfg.AUDIO.N_MELS),
            emb_dim=int(cfg.TEXT.DIMENSION),
        )
        sb = sp.batch(np.arange(batch_size) % sp.n)
        batch.update(
            feats=sb["feats"], feat_mask=sb["feat_mask"], teacher=sb["teacher"]
        )
    batch = jax.tree.map(jnp.asarray, batch)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = gan.make_train_step(cfg, models)

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(state, batch, rng, k):
        def body(s, _):
            s2, _m = step(s, batch, rng)
            return s2, None

        out, _ = jax.lax.scan(body, state, None, length=k)
        # device-side scalar fingerprint of the FULL final state
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out.g_params)
        )

    gflop = (
        _flops_of(jax.jit(step).lower(state, batch, jax.random.key(1)).compile())
        / 1e9
    )
    return run_k, state, batch, gflop


def _gan_record(name, batch_size, gflop, per) -> dict:
    return {
        "what": name,
        "xla_gflop_per_step": round(gflop, 1),
        "device_step_s": round(per, 5),
        "device_imgs_per_sec": round(batch_size / per, 1),
        "device_tflops": round(gflop / per / 1e3, 1),
        "mfu_vs_bf16_peak": round(gflop * 1e9 / per / V5E_BF16_PEAK, 3),
        "method": "scan-chain diff, scalar readback",
    }


def cert_gan() -> dict:
    import jax

    batch_size = 24
    run_k, state, batch, gflop = _build_gan_runner(batch_size)
    k_lo, k_hi = 2, 10
    for k in (k_lo, k_hi):
        float(run_k(state, batch, jax.random.key(1), k))  # compile
    best = float("inf")
    for _ in range(3):  # per>0 guard like every other cert path: a relay
        # throttle window can make t_hi <= t_lo (differenced fixed costs)
        t_lo = _timed(run_k, state, batch, jax.random.key(1), k_lo)
        t_hi = _timed(run_k, state, batch, jax.random.key(1), k_hi)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        if per > 0:
            best = min(best, per)
    if not math.isfinite(best):
        return {
            "what": "gan_step_256px_b24_bf16",
            "error": "no positive-differenced trial (relay throttle)",
        }
    return _gan_record("gan_step_256px_b24_bf16", batch_size, gflop, best)


def cert_gan_ab(variants=None, trials: int = 3) -> list[dict]:
    """A/B GAN-step variants INTERLEAVED in one session so the relay's
    post-burst throttle hits every variant equally (CLAUDE.md: compare
    programs by interleaving trial blocks, best-of)."""
    import jax

    if variants is None:
        variants = [
            ("gan_b24_up_naive", 24, {"GAN.UPSAMPLE_MODE": "naive"}),
            ("gan_b24_up_fused4", 24, {"GAN.UPSAMPLE_MODE": "fused4"}),
            ("gan_b24_up_transpose", 24, {"GAN.UPSAMPLE_MODE": "transpose"}),
        ]
    k_lo, k_hi = 2, 10
    built = []
    for variant in variants:
        name, bsz, over = variant[:3]
        joint = bool(variant[3]) if len(variant) > 3 else False
        try:
            run_k, state, batch, gflop = _build_gan_runner(
                bsz, joint=joint, **over
            )
            for k in (k_lo, k_hi):
                float(run_k(state, batch, jax.random.key(1), k))  # compile
        except Exception as e:  # e.g. OOM at a large batch: skip, keep rest
            print(
                json.dumps(
                    {"what": name, "error": f"{type(e).__name__}: {e}"[:300]}
                ),
                flush=True,
            )
            continue
        built.append((name, bsz, run_k, state, batch, gflop))
    best = {name: float("inf") for name, *_ in built}
    dead: set[str] = set()
    for _ in range(trials):
        for name, bsz, run_k, state, batch, gflop in built:
            if name in dead:
                continue
            try:
                t_lo = _timed(
                    run_k, state, batch, jax.random.key(1), k_lo, reps=2
                )
                t_hi = _timed(
                    run_k, state, batch, jax.random.key(1), k_hi, reps=2
                )
            except Exception as e:  # runtime OOM etc: drop variant, keep rest
                dead.add(name)
                print(
                    json.dumps(
                        {"what": name, "error": f"{type(e).__name__}: {e}"[:300]}
                    ),
                    flush=True,
                )
                continue
            per = (t_hi - t_lo) / (k_hi - k_lo)
            if per > 0:
                best[name] = min(best[name], per)
    return [
        _gan_record(name, bsz, gflop, best[name])
        for name, bsz, _rk, _s, _b, gflop in built
        if name not in dead and best[name] < float("inf")
    ]


def cert_gan_parts(trials: int = 3) -> list[dict]:
    """Decompose the train step: time G-forward, G-forward+backward, the
    D-phase backward, and the G-phase D-forward+input-grad pullback as
    separate chained programs (same interleaved best-of methodology).
    The parts don't sum exactly to the full step (optimizer/EMA/BN-stat
    plumbing and fusion differences), but they rank the levers."""
    import jax
    import jax.numpy as jnp

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.train import gan
    from s2i_tpu.train import losses

    cfg = config.default_cfg()
    cfg.DTYPE.COMPUTE = "bfloat16"
    batch_size = 24
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(num_classes=8, examples_per_class=3)
    batch = jax.tree.map(
        jnp.asarray,
        {
            k: v
            for k, v in ds.batch(np.arange(batch_size) % ds.n).items()
            if k != "class_id"
        },
    )
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    z0 = jax.random.normal(jax.random.key(2), (batch_size, int(cfg.GAN.Z_DIM)))
    c0 = jax.random.normal(
        jax.random.key(3), (batch_size, int(cfg.GAN.EMBEDDING_DIM))
    )
    gp, gs = state.g_params["g"], state.g_stats["g"]

    # All large arrays (params, images) must be ARGUMENTS of the jitted
    # runners, not closure captures — captured arrays embed as HLO constants
    # and blow past the relay's remote-compile request-size limit (HTTP 413).
    def g_fwd_scalar(gp, z):
        fakes, _ = models.g.apply(
            {"params": gp, "batch_stats": gs}, z, c0, mutable=["batch_stats"]
        )
        return sum(jnp.sum(f.astype(jnp.float32)) for f in fakes), fakes

    def make_gfwd():
        @functools.partial(jax.jit, static_argnames="k")
        def run_k(gp, z, k):
            def body(z, _):
                s, _f = g_fwd_scalar(gp, z)
                return z + 1e-12 * s, None

            z, _ = jax.lax.scan(body, z, None, length=k)
            return jnp.sum(z)

        return run_k, (gp, z0)

    def make_gfwdbwd():
        def loss(params, z):
            s, _f = g_fwd_scalar(params, z)
            return s

        @functools.partial(jax.jit, static_argnames="k")
        def run_k(params, z, k):
            def body(p, _):
                g = jax.grad(loss)(p, z)
                return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), None

            p, _ = jax.lax.scan(body, params, None, length=k)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(p))

        return run_k, (gp, z0)

    _, fakes0 = jax.jit(g_fwd_scalar)(gp, z0)
    fakes0 = tuple(jax.lax.stop_gradient(f) for f in fakes0)
    reals0 = tuple(batch["images"])
    cond0 = c0
    cond_w0 = jnp.roll(c0, 1, axis=0)

    def d_loss_fn(d_params, reals, fakes):
        total = jnp.asarray(0.0, jnp.float32)
        for d, dp, dst, real, fake in zip(
            models.ds, d_params, state.d_stats, reals, fakes
        ):
            logits, _ = d.apply(
                {"params": dp, "batch_stats": dst},
                real,
                fake,
                cond0,
                cond_w0,
                mutable=["batch_stats"],
                method="train_logits",
            )
            li, _aux = losses.discriminator_loss(
                *logits, float(cfg.TRAIN.COEFF.UNCOND_LOSS)
            )
            total = total + li
        return total

    def make_dphase():
        @functools.partial(jax.jit, static_argnames="k")
        def run_k(d_params, reals, fakes, k):
            def body(ps, _):
                g = jax.grad(d_loss_fn)(ps, reals, fakes)
                return jax.tree.map(lambda a, b: a + 1e-12 * b, ps, g), None

            ps, _ = jax.lax.scan(body, d_params, None, length=k)
            return sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(ps)
            )

        return run_k, (state.d_params, reals0, fakes0)

    def adv_loss_on_fakes(fakes, d_params):
        adv = jnp.asarray(0.0, jnp.float32)
        for d, dp, dst, fake in zip(models.ds, d_params, state.d_stats, fakes):
            (cond_f, uncond_f), _ = d.apply(
                {"params": dp, "batch_stats": dst},
                fake,
                cond0,
                mutable=["batch_stats"],
            )
            adv = adv + losses.generator_adversarial_loss(
                cond_f, uncond_f, float(cfg.TRAIN.COEFF.UNCOND_LOSS)
            )
        return adv

    def make_gphase_dpull():
        @functools.partial(jax.jit, static_argnames="k")
        def run_k(fakes, d_params, k):
            def body(fs, _):
                g = jax.grad(adv_loss_on_fakes)(fs, d_params)
                return (
                    jax.tree.map(lambda a, b: a + 1e-12 * b, fs, g),
                    None,
                )

            fs, _ = jax.lax.scan(body, fakes, None, length=k)
            return sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fs)
            )

        return run_k, (fakes0, state.d_params)

    parts = [
        ("g_forward", make_gfwd),
        ("g_forward_backward", make_gfwdbwd),
        ("d_phase_fwd_bwd", make_dphase),
        ("gphase_d_fwd_inputgrad", make_gphase_dpull),
    ]
    k_lo, k_hi = 2, 10
    built = []
    for name, mk in parts:
        run_k, args = mk()
        for k in (k_lo, k_hi):
            float(run_k(*args, k=k))  # compile
        built.append((name, run_k, args))
    best = {name: float("inf") for name, *_ in built}
    for _ in range(trials):
        for name, run_k, args in built:
            t_lo = _timed(run_k, *args, k_lo, reps=2)
            t_hi = _timed(run_k, *args, k_hi, reps=2)
            per = (t_hi - t_lo) / (k_hi - k_lo)
            if per > 0:
                best[name] = min(best[name], per)
    return [
        (
            {
                "what": f"part:{name}",
                "device_time_s": round(best[name], 5),
                "method": "scan-chain diff, scalar readback, interleaved",
            }
            if math.isfinite(best[name])
            else {
                "what": f"part:{name}",
                "error": "no positive-differenced trial (relay throttle)",
            }
        )
        for name, _rk, _a in built
    ]


def cert_encoder(trials: int = 3) -> dict:
    """Distillation-pretrain step (SURVEY.md §3.1 hot loop #2): full-size
    speech encoder (conv stack + bi-GRU + pool + FC→1024), batch 64 of
    MAX_FRAMES×N_MELS features, MSE + aux-CE, Adam — one jitted program.
    The mel frontend feeding it is certified separately (--what mel)."""
    import jax
    import jax.numpy as jnp

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticSpeechDataset
    from s2i_tpu.train import encoder as enc_train

    cfg = config.default_cfg()
    cfg.DTYPE.COMPUTE = "bfloat16"
    batch_size = 64
    model = enc_train.build_encoder(cfg)
    ds = SyntheticSpeechDataset(
        num_classes=int(cfg.ENCODER.N_CLASSES),
        examples_per_class=1,
        max_frames=int(cfg.AUDIO.MAX_FRAMES),
        n_mels=int(cfg.AUDIO.N_MELS),
        emb_dim=int(cfg.TEXT.DIMENSION),
    )
    batch = jax.tree.map(
        jnp.asarray, ds.batch(np.arange(batch_size) % ds.n)
    )
    state = enc_train.init_encoder_state(cfg, model, jax.random.key(0), batch)
    step = enc_train.make_encoder_train_step(cfg, model)

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(state, batch, rng, k):
        def body(s, _):
            s2, _m = step(s, batch, rng)
            return s2, None

        out, _ = jax.lax.scan(body, state, None, length=k)
        return sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out.params)
        )

    gflop = (
        _flops_of(jax.jit(step).lower(state, batch, jax.random.key(1)).compile())
        / 1e9
    )
    k_lo, k_hi = 2, 10
    for k in (k_lo, k_hi):
        float(run_k(state, batch, jax.random.key(1), k))  # compile
    best = float("inf")
    for _ in range(trials):
        t_lo = _timed(run_k, state, batch, jax.random.key(1), k_lo, reps=2)
        t_hi = _timed(run_k, state, batch, jax.random.key(1), k_hi, reps=2)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        if 0 < per < best:
            best = per
    if not math.isfinite(best):
        # same contract as cert_gan: an explicit error record, never a
        # finite-looking 0.0-utts/sec "certification" (inf flows through
        # round() into 64/inf = 0.0 otherwise)
        return {
            "what": "encoder_distill_step_b64_T1024_bf16",
            "error": "no positive-differenced trial (relay throttle)",
        }
    return {
        "what": "encoder_distill_step_b64_T1024_bf16",
        "xla_gflop_per_step": round(gflop, 1),
        "device_step_s": round(best, 5),
        "device_utts_per_sec": round(batch_size / best, 1),
        "device_tflops": round(gflop / best / 1e3, 1),
        "mfu_vs_bf16_peak": round(gflop * 1e9 / best / V5E_BF16_PEAK, 3),
        "method": "scan-chain diff, scalar readback",
    }


def _mel_chain_time(fn, wav, k_lo=2, k_hi=22):
    """Differenced per-call device time of a wav->mel function."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(wav, k):
        def body(w, _):
            out = fn(w)
            # data dependency: next input derives from this output, so the
            # k calls cannot overlap or be deduplicated
            return w + 1e-12 * jnp.sum(out.astype(jnp.float32)), None

        w, _ = jax.lax.scan(body, wav, None, length=k)
        return jnp.sum(w.astype(jnp.float32))

    for k in (k_lo, k_hi):
        float(run_k(wav, k))
    best = float("inf")
    for _ in range(3):  # per>0 guard (relay throttle can make t_hi<=t_lo)
        t_lo = _timed(run_k, wav, k_lo)
        t_hi = _timed(run_k, wav, k_hi)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        if 0 < per < best:
            best = per
    return best if math.isfinite(best) else float("nan")


def cert_mel() -> dict:
    import jax

    from s2i_tpu.audio.frontend import FrontendParams, logmel_jnp
    from s2i_tpu.ops.mel_kernel import logmel_pallas, logmel_pallas_fused

    p = FrontendParams()
    rng = np.random.default_rng(0)
    wav = jax.numpy.asarray(rng.standard_normal((8, 64000)).astype(np.float32))

    one = jax.jit(lambda w: logmel_pallas(w, p))
    compiled = one.lower(wav).compile()
    gflop = _flops_of(compiled) / 1e9
    out = one(wav)
    n_frames = out.shape[0] * out.shape[1]

    per = _mel_chain_time(lambda w: logmel_pallas(w, p), wav)
    per_jnp = _mel_chain_time(lambda w: logmel_jnp(w, p), wav)
    if not (math.isfinite(per) and math.isfinite(per_jnp)):
        return {
            "what": "mel_frontend_8x64000_fp32",
            "error": "no positive-differenced trial (relay throttle)",
        }
    # v2: framing fused into the kernel via in-kernel DMA (VERDICT r2 #4);
    # interleaved in the same session so the three-way comparison is fair.
    # Numerics are certified on the REAL chip here (the CPU test runs the
    # interpreter; Mosaic is the thing that must agree with jnp).
    try:
        want = np.asarray(jax.jit(lambda w: logmel_jnp(w, p))(wav))
        got = np.asarray(jax.jit(lambda w: logmel_pallas_fused(w, p))(wav))
        fused_err = float(np.max(np.abs(got - want)))
        per_fused = _mel_chain_time(
            lambda w: logmel_pallas_fused(w, p), wav
        )
    except Exception as e:  # Mosaic may reject the layout — record, not crash
        per_fused = fused_err = float("nan")
        print(f"# fused kernel failed on-chip: {type(e).__name__}: {e}")
    return {
        "what": "mel_frontend_8x64000_fp32",
        "xla_gflop_per_call": round(gflop, 2),
        "device_call_s": round(per, 6),
        "device_frames_per_sec": round(n_frames / per, 0),
        "device_tflops": round(gflop / per / 1e3, 2),
        "mfu_vs_bf16_peak": round(gflop * 1e9 / per / V5E_BF16_PEAK, 3),
        "jnp_composite_call_s": round(per_jnp, 6),
        "pallas_speedup_vs_jnp": round(per_jnp / per, 2),
        "fused_v2_call_s": round(per_fused, 6),
        "fused_v2_frames_per_sec": round(n_frames / per_fused, 0),
        "fused_v2_speedup_vs_jnp": round(per_jnp / per_fused, 2),
        "fused_v2_max_abs_err_vs_jnp": fused_err,
        "method": "scan-chain diff k=22-2, scalar readback",
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--what",
        choices=[
            "gan", "mel", "both", "ab", "parts", "batch", "dtrunk", "cvjp",
            "enc", "joint", "s2d", "moments", "stack", "s2dmid", "b48",
            "bigbatch", "b128opt",
        ],
        default="both",
    )
    args = ap.parse_args()
    out = []
    if args.what == "ab":
        out.extend(cert_gan_ab())
    if args.what == "cvjp":
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_transpose", 24, {}),
                    (
                        "gan_b24_transpose_cvjp",
                        24,
                        {"GAN.UPSAMPLE_MODE": "transpose_cvjp"},
                    ),
                    (
                        "gan_b96_transpose",
                        96,
                        {"GAN.D_TRUNK_BATCH": False},
                    ),
                    (
                        "gan_b96_transpose_cvjp",
                        96,
                        {
                            "GAN.D_TRUNK_BATCH": False,
                            "GAN.UPSAMPLE_MODE": "transpose_cvjp",
                        },
                    ),
                ]
            )
        )
    if args.what == "s2d":
        # Space-to-depth recode of the 256² low-channel stages (the one
        # layout family the flat b24 profile left untried — VERDICT r2 #2).
        out.extend(
            cert_gan_ab(
                variants=[
                    # pin both sides: the tri-state default ("auto")
                    # resolves S2D ON at b24, so {} is NOT the off-baseline
                    ("gan_b24_baseline", 24, {"GAN.S2D": False}),
                    ("gan_b24_s2d", 24, {"GAN.S2D": True}),
                    ("gan_b96_baseline", 96, {"GAN.D_TRUNK_BATCH": False}),
                    (
                        "gan_b96_s2d",
                        96,
                        {"GAN.D_TRUNK_BATCH": False, "GAN.S2D": True},
                    ),
                ]
            )
        )
    if args.what == "moments":
        # fp32 vs bf16 Adam-moment storage on the big kernels (VERDICT r2 #3:
        # the profile ranks the D256 m/v/param traffic in the b24 top-10).
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_m_fp32", 24, {}),
                    ("gan_b24_m_bf16", 24, {"TRAIN.MOMENT_DTYPE": "bfloat16"}),
                    ("gan_b96_m_fp32", 96, {"GAN.D_TRUNK_BATCH": False}),
                    (
                        "gan_b96_m_bf16",
                        96,
                        {
                            "GAN.D_TRUNK_BATCH": False,
                            "TRAIN.MOMENT_DTYPE": "bfloat16",
                        },
                    ),
                ]
            )
        )
    if args.what == "stack":
        # Round-3 stacking check: the new b24 default (S2D on) + bf16
        # moments on top, the b48 point of the batch sweep with/without
        # S2D, and the b96 reference — one interleaved session.
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_default_s2d", 24, {}),
                    (
                        "gan_b24_s2d_mbf16",
                        24,
                        {"TRAIN.MOMENT_DTYPE": "bfloat16"},
                    ),
                    (
                        "gan_b48_base",
                        48,
                        {"GAN.S2D": False, "GAN.D_TRUNK_BATCH": False},
                    ),
                    (
                        "gan_b48_s2d",
                        48,
                        # "auto" resolves S2D OFF at b48 — pin it ON or this
                        # row silently re-measures gan_b48_base
                        {"GAN.S2D": True, "GAN.D_TRUNK_BATCH": False},
                    ),
                    (
                        "gan_b96_base",
                        96,
                        {"GAN.S2D": False, "GAN.D_TRUNK_BATCH": False},
                    ),
                ]
            )
        )
    if args.what == "joint":
        # BASELINE config #4 (joint speech-encoder + GAN finetune) vs the
        # frozen-embedding step, interleaved at both the reference batch and
        # the throughput batch. utts == imgs here (one utterance per image).
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_frozen", 24, {}),
                    ("gan_b24_joint_ft", 24, {}, True),
                    ("gan_b96_frozen", 96, {"GAN.D_TRUNK_BATCH": False}),
                    (
                        "gan_b96_joint_ft",
                        96,
                        {"GAN.D_TRUNK_BATCH": False},
                        True,
                    ),
                ]
            )
        )
    if args.what == "dtrunk":
        # pin both sides: the tri-state default ("auto") resolves per batch
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_seq_d", 24, {"GAN.D_TRUNK_BATCH": False}),
                    ("gan_b24_batched_d", 24, {"GAN.D_TRUNK_BATCH": True}),
                    ("gan_b96_seq_d", 96, {"GAN.D_TRUNK_BATCH": False}),
                    ("gan_b96_batched_d", 96, {"GAN.D_TRUNK_BATCH": True}),
                ]
            )
        )
    if args.what == "s2dmid":
        # GAN.S2D_MID on top of the certified b24 default (S2D auto-on):
        # does extending the recode to the 128² stage stack a further win?
        out.extend(
            cert_gan_ab(
                variants=[
                    ("gan_b24_s2d_top", 24, {}),
                    ("gan_b24_s2d_topmid", 24, {"GAN.S2D_MID": True}),
                    (
                        "gan_b24_s2d_topmid_mbf16",
                        24,
                        {
                            "GAN.S2D_MID": True,
                            "TRAIN.MOMENT_DTYPE": "bfloat16",
                        },
                    ),
                ]
            )
        )
    if args.what == "b48":
        # D_TRUNK_BATCH at the untested middle of its "auto" range (on
        # below 96 rests on b24 +6.7% / b96 −1% only); S2D pinned off —
        # it is already certified losing at b48.
        out.extend(
            cert_gan_ab(
                variants=[
                    (
                        "gan_b48_dtb_off",
                        48,
                        {"GAN.S2D": False, "GAN.D_TRUNK_BATCH": False},
                    ),
                    (
                        "gan_b48_dtb_on",
                        48,
                        {"GAN.S2D": False, "GAN.D_TRUNK_BATCH": True},
                    ),
                ]
            )
        )
    if args.what == "bigbatch":
        # The unexplored top of the batch sweep: b96 (certified sweet spot)
        # vs the untested b112/b128 points, plus selective-policy remat
        # (GAN.REMAT_POLICY="conv": save conv outputs, recompute only the
        # elementwise chains — full remat's +13% FLOPs was the b192 killer).
        # PAIRWISE chunks, not one 5-way interleave: cert_gan_ab keeps
        # every variant's state + executables resident for interleaving,
        # and five b96–b192 train states cannot co-reside in 16 GB HBM —
        # the first attempt OOMed ALL variants including the known-good
        # b96 (docs/PERF.md round-3 bigbatch note). Each chunk rebuilds a
        # fresh b96 session reference (so the throttle story still holds
        # within a chunk) and the prior chunk's buffers are freed on
        # return. OOM at any point is caught per-variant and reported.
        for ref_name, cand in [
            ("gan_b96_ref_a", ("gan_b112", 112, {})),
            ("gan_b96_ref_b", ("gan_b128", 128, {})),
            (
                "gan_b96_ref_c",
                (
                    "gan_b128_remat_conv",
                    128,
                    {"GAN.REMAT": True, "GAN.REMAT_POLICY": "conv"},
                ),
            ),
            (
                "gan_b96_ref_d",
                (
                    "gan_b192_remat_conv",
                    192,
                    {"GAN.REMAT": True, "GAN.REMAT_POLICY": "conv"},
                ),
            ),
        ]:
            out.extend(cert_gan_ab(variants=[(ref_name, 96, {}), cand]))
    if args.what == "b128opt":
        # Neighborhood of the round-4 b128 sweet spot (933 imgs/sec,
        # +21.2% over b96 in-session): does throughput keep rising toward
        # the HBM wall (b144/b160, no remat — OOM is caught and reported
        # as the wall), and does the bf16 Adam-moment lever (+1.0% at b96)
        # still stack at b128? Pairwise chunks as in bigbatch, but the
        # in-chunk reference is b96, NOT b128: the first attempt used
        # b128-as-reference and OOMed every chunk INCLUDING the b128
        # reference itself — two ≥b128 train states + executables cannot
        # co-reside in 16 GB HBM (itself a useful datum: b128 alone fits
        # with slack < one b144 state). b96 is proven to co-reside with
        # candidates up to b192-remat (the bigbatch cert), and candidates
        # compare through b96's certified ladder (b128 = +21.2% vs
        # in-session b96 — a candidate beats b128 iff its vs-b96 gain
        # exceeds that).
        for ref_name, cand in [
            ("gan_b96_ref_a", ("gan_b144", 144, {})),
            ("gan_b96_ref_b", ("gan_b160", 160, {})),
            (
                "gan_b96_ref_c",
                (
                    "gan_b128_m_bf16",
                    128,
                    {"TRAIN.MOMENT_DTYPE": "bfloat16"},
                ),
            ),
        ]:
            out.extend(cert_gan_ab(variants=[(ref_name, 96, {}), cand]))
    if args.what == "parts":
        out.extend(cert_gan_parts())
    if args.what == "batch":
        # D_TRUNK_BATCH off: it loses ~1% past b96 (docs/PERF.md) and keeps
        # these comparable with the round-2 sweep rows.
        out.extend(
            cert_gan_ab(
                variants=[
                    (f"gan_b{b}_transpose", b, {"GAN.D_TRUNK_BATCH": False})
                    for b in (96, 192)
                ]
            )
        )
    if args.what == "enc":
        out.append(cert_encoder())
    if args.what in ("gan", "both"):
        out.append(cert_gan())
    if args.what in ("mel", "both"):
        out.append(cert_mel())
    for rec in out:
        print(json.dumps(_sanitize(rec)))


def _sanitize(obj):
    """NaN/Infinity are not valid JSON (json.dumps emits them anyway);
    strict parsers of the one-record-per-line output would throw. Replace
    non-finite floats with None (e.g. cert_mel's fused-kernel fields when
    the kernel fails on-chip and per_fused stays nan)."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


if __name__ == "__main__":
    main()
