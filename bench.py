"""Headline benchmark: GAN training throughput at 256×256 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 256 (the BASELINE.json:5 target of ≥256 images/sec/chip
for full 3-stage 64/128/256 training on TPU v5e).

Measurement integrity (round-2 re-certification): on this container's
relay-tunneled TPU, ``jax.block_until_ready`` returns before the work is
done (measured 0.07 ms for a ≥35 ms matmul chain), so timings must be
anchored to a host readback of real bytes. Method: K train steps chained
in ONE jitted lax.scan, reduced to a scalar on device, timed via
``float(...)``; two chain lengths are differenced so fixed costs (relay
RTT ~32 ms, dispatch, transfer) cancel. Calibration against a known-FLOP
matmul chain reproduces the chip's bf16 peak within 2%
(scripts/perf_cert.py has the full story). The relay also throttles
~10x after sustained bursts, so each measurement takes best-of-trials.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np


def _timed_scalar(fn, *args, reps: int = 4) -> float:
    """Best-of-reps wall time of fn(*args) where fn returns a DEVICE scalar;
    float() forces a real readback (the only sync the relay can't fake)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_frontend() -> None:
    """Secondary metric (BASELINE.json: 'mel frames/sec'): fused Pallas
    log-mel frontend throughput. Run with: python bench.py --metric mel

    Methodology (re-certified in round 2 after the round-1 number failed a
    FLOP sanity check): a UNIQUE input per dispatch and a block_until_ready
    after EVERY call, so neither relay-side caching nor dispatch overlap can
    inflate the number; reported rate is per synchronous round-trip call.
    """
    import jax
    import jax.numpy as jnp

    from s2i_tpu.audio.frontend import FrontendParams, logmel_jnp
    from s2i_tpu.ops.mel_kernel import logmel_pallas_fused

    p = FrontendParams()
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((8, 64000)).astype(np.float32))
    # production-default frontend path: the fused-framing Pallas kernel on
    # TPU (certified 1.59× the jnp composite — docs/PERF.md round 3), the
    # jnp formulation elsewhere
    mel = (
        (lambda w: logmel_pallas_fused(w, p))
        if jax.default_backend() == "tpu"
        else (lambda w: logmel_jnp(w, p))
    )

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(wav, k):
        def body(w, _):
            # data dependency defeats overlap/dedup across the k calls
            out = mel(w)
            return w + 1e-12 * jnp.sum(out.astype(jnp.float32)), None

        w, _ = jax.lax.scan(body, wav, None, length=k)
        return jnp.sum(w.astype(jnp.float32))

    out = mel(wav)
    n_frames = out.shape[0] * out.shape[1]
    k_lo, k_hi = 2, 22
    for k in (k_lo, k_hi):
        float(run_k(wav, k))  # compile
    best = 0.0
    for _ in range(3):
        t_lo = _timed_scalar(run_k, wav, k_lo)
        t_hi = _timed_scalar(run_k, wav, k_hi)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        if per > 0:
            best = max(best, n_frames / per)
    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec",
                "value": round(best, 0),
                "unit": "frames/sec/chip",
                "vs_baseline": 1.0,  # tracked metric, no fixed target
            }
        )
    )


def bench_loop() -> None:
    """End-to-end trainer throughput (VERDICT r1 item 3): GanTrainer.train
    on synthetic data — includes the input pipeline, host-side bookkeeping,
    prefetch, and logging, i.e. the number a user of ``main.py`` gets.
    Reads the trainer's own per-window images_per_sec scalars (window = the
    full loop between log boundaries) and reports the best post-compile
    window. Run with: python bench.py --metric loop"""
    import json as _json
    import os
    import tempfile

    import numpy as np

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.train.loop import GanTrainer

    cfg = config.default_cfg()  # full-size: gf=df=64, 3 stages, 256px top
    cfg.DTYPE.COMPUTE = "bfloat16"
    cfg.TRAIN.SNAPSHOT_INTERVAL = 0  # no mid-run checkpoints in the window
    batch_size = 24
    steps_per_epoch = 8
    ds = SyntheticGanDataset(
        num_classes=8,
        examples_per_class=3,
        # DATA.IMAGE_DTYPE=uint8 default: raw bytes ship host→device (4x
        # less transfer), the jitted step normalizes on device.
        image_dtype=str(cfg.DATA.IMAGE_DTYPE),
        # SHIP_SCALES=top: only the 256 scale crosses host->device; the
        # step pools the pyramid on device.
        ship_scales=str(cfg.DATA.SHIP_SCALES),
    )

    def factory(_epoch):
        for i in range(steps_per_epoch):
            idx = (np.arange(batch_size) + i * 7) % ds.n
            yield ds.batch(idx)

    with tempfile.TemporaryDirectory() as out:
        trainer = GanTrainer(
            cfg, out, factory, log_every=steps_per_epoch, image_every=10**9
        )
        try:
            trainer.train(max_epoch=7)  # window 1 pays compile; 6 measured
        finally:
            trainer.close()
        best = 0.0
        with open(os.path.join(out, "scalars.jsonl")) as f:
            for line in f:
                rec = _json.loads(line)
                if rec["step"] > steps_per_epoch:  # skip the compile window
                    best = max(best, rec["images_per_sec"])
    print(
        json.dumps(
            {
                "metric": "gan_loop_images_per_sec_256px",
                "value": round(best, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(best / 256.0, 3),
            }
        )
    )


def bench_infer() -> None:
    """Serving-path benchmark: the single jitted wav→256px-image program
    (s2i_tpu.pipeline.SpeechToImage — what scripts/serve.py dispatches).
    Reports best-of synchronous round-trip latency at batch 1 and the
    batched throughput at batch 8. On the relay tunnel every call pays
    ~32 ms RTT + ~13 ms/MB readback; on a real host those are sub-ms.
    Run with: python bench.py --metric infer"""
    import time as _t

    import jax
    import numpy as np

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset
    from s2i_tpu.pipeline import SpeechToImage
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.TRAIN.JOINT_FT = True
    models = gan.build_models(cfg, joint=True)
    from s2i_tpu.audio import frontend_params_from_cfg

    p = frontend_params_from_cfg(cfg.AUDIO)
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length
    ds = SyntheticGanDataset(num_classes=2, examples_per_class=4)
    feats_b = 8
    batch = {
        "images": tuple(
            np.asarray(v) for v in ds.batch(np.arange(feats_b))["images"]
        ),
        "embedding": np.zeros((feats_b, int(cfg.TEXT.DIMENSION)), np.float32),
        "feats": np.zeros(
            (feats_b, p.max_frames, int(cfg.AUDIO.N_MELS)), np.float32
        ),
        "feat_mask": np.ones((feats_b, p.max_frames), np.float32),
        "teacher": np.zeros((feats_b, int(cfg.TEXT.DIMENSION)), np.float32),
    }
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    pipe = SpeechToImage(cfg, None, state)

    rng = np.random.default_rng(0)
    results = {}
    for b in (1, 8):
        wavs = rng.standard_normal((b, max_samples)).astype(np.float32)
        lens = np.full((b,), max_samples, np.int32)
        # uint8 output = the serving path (device-side quantize, 4x less
        # readback)
        kw = dict(output_dtype="uint8")
        np.asarray(pipe.generate(wavs, lens, seed=0, **kw))  # compile
        best = float("inf")
        for s in range(5):
            t0 = _t.perf_counter()
            np.asarray(pipe.generate(wavs, lens, seed=s, **kw))
            best = min(best, _t.perf_counter() - t0)
        results[b] = best
    # Sustained serving rate: the collator's depth-1 dispatch pipeline
    # (batch i+1 dispatched before batch i's readback is forced) vs the
    # synchronous loop above. k back-to-back b8 batches, best-of-3.
    b, k = 8, 6
    wavs = rng.standard_normal((b, max_samples)).astype(np.float32)
    lens = np.full((b,), max_samples, np.int32)
    best_stream = float("inf")
    for trial in range(3):
        t0 = _t.perf_counter()
        pending = None
        for s in range(k):
            dev = pipe.generate_async(
                wavs, lens, seed=trial * k + s, output_dtype="uint8"
            )
            if pending is not None:
                np.asarray(pending)
            pending = dev
        np.asarray(pending)
        best_stream = min(best_stream, (_t.perf_counter() - t0) / k)
    print(
        json.dumps(
            {
                "metric": "speech_to_image_b1_latency_ms",
                "value": round(results[1] * 1e3, 1),
                "unit": "ms round-trip (incl. relay RTT)",
                "vs_baseline": 1.0,  # tracked metric, no fixed target
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "speech_to_image_b8_images_per_sec",
                "value": round(8.0 / results[8], 1),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "speech_to_image_b8_streaming_images_per_sec",
                "value": round(8.0 / best_stream, 1),
                "unit": "images/sec/chip (depth-1 dispatch pipeline)",
                "vs_baseline": 1.0,
            }
        )
    )

    # Concurrency soak: the FULL serving stack (HTTP handler → collator →
    # pipelined device dispatch → PNG encode) under dozens of simultaneous
    # clients — measures end-to-end tail latency, not just device rate.
    import http.client
    import io as _io
    import threading as _th
    import wave as _wave

    from s2i_tpu.serving import make_server

    srv = make_server(
        pipe, host="127.0.0.1", port=0, batch_size=8, warmup=True
    )
    port = srv.server_address[1]
    srv_thread = _th.Thread(target=srv.serve_forever, daemon=True)
    srv_thread.start()
    # ~1 s of 16 kHz audio per request (PCM16 WAV bytes)
    pcm = (
        np.clip(rng.standard_normal(16000), -1, 1) * 32767
    ).astype("<i2")
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    wav_bytes = buf.getvalue()

    n_clients, reqs_each = 24, 4
    lat_ms: list[float] = []
    errors: list[str] = []
    lock = _th.Lock()

    def client():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        for _ in range(reqs_each):
            t0 = _t.perf_counter()
            try:
                conn.request("POST", "/generate", body=wav_bytes)
                resp = conn.getresponse()
                body = resp.read()
                if resp.status != 200:
                    raise RuntimeError(f"{resp.status}: {body[:80]!r}")
            except Exception as e:
                with lock:
                    errors.append(str(e))
                return
            with lock:
                lat_ms.append((_t.perf_counter() - t0) * 1e3)
        conn.close()

    threads = [_th.Thread(target=client) for _ in range(n_clients)]
    t0 = _t.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = _t.perf_counter() - t0
    srv.shutdown()
    srv.server_close()
    if errors:
        raise RuntimeError(f"soak: {len(errors)} failed requests: {errors[:3]}")
    lat = np.sort(np.asarray(lat_ms))

    def pct(p: float) -> float:
        return float(lat[min(len(lat) - 1, int(p / 100 * len(lat)))])

    print(
        json.dumps(
            {
                "metric": "serving_soak_images_per_sec",
                "value": round(len(lat) / wall, 1),
                "unit": (
                    f"req/sec end-to-end ({n_clients} concurrent clients, "
                    f"{len(lat)} reqs; HTTP+collate+device+PNG)"
                ),
                "vs_baseline": 1.0,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "serving_soak_latency_ms",
                "value": round(pct(50), 1),
                "unit": (
                    f"p50 ms (p90={pct(90):.0f} p99={pct(99):.0f} "
                    f"max={float(lat[-1]):.0f})"
                ),
                "vs_baseline": 1.0,
            }
        )
    )


def bench_data() -> None:
    """Host data-path budget (VERDICT r2 missing #3): measure the native
    C++ JPEG decode+transform rate on fixture JPEGs — per-core, on this
    box's single core — and the PIL fallback rate, then state how many
    host cores feed the certified device rates (933 imgs/sec at b128 /
    516 at b24). Run with: python bench.py --metric data"""
    import tempfile
    import time as _t

    import numpy as np
    from PIL import Image

    from s2i_tpu import native

    n_img, src = 64, 400  # CUB-like source resolution (~470×400)
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n_img):
            img = (
                rng.integers(0, 256, (src, src, 3), dtype=np.uint8)
                if i % 2
                else np.tile(
                    rng.integers(0, 256, (src, 1, 3), dtype=np.uint8),
                    (1, src, 1),
                )  # mix noisy + smooth JPEGs: entropy affects decode time
            )
            p = f"{d}/img_{i:03d}.jpg"
            Image.fromarray(img).save(p, quality=95)
            paths.append(p)

        def rate_native(threads: int, reps: int = 5) -> float:
            best = 0.0
            for r in range(reps):
                t0 = _t.perf_counter()
                _, failed = native.load_batch(
                    paths, None, 256, 3, seed=r, augment=True,
                    num_threads=threads, dtype="uint8",
                )
                dt = _t.perf_counter() - t0
                assert failed == 0
                best = max(best, n_img / dt)
            return best

        def rate_pil(reps: int = 3) -> float:
            # The REAL fallback the trainer runs on native-decode failure
            # (stackgan.pil_load_transform, production defaults: uint8,
            # random crop+flip, top scale only — SHIP_SCALES="top" derives
            # the pyramid on device), not a reimplementation.
            from s2i_tpu.data.stackgan import pil_load_transform

            best = 0.0
            for r in range(reps):
                prng = np.random.default_rng(r)
                t0 = _t.perf_counter()
                for p in paths:
                    pil_load_transform(p, 256, rng=prng, dtype="uint8")
                dt = _t.perf_counter() - t0
                best = max(best, n_img / dt)
            return best

        def rate_native_branches(branches: int, reps: int = 5) -> float:
            best = 0.0
            for r in range(reps):
                t0 = _t.perf_counter()
                _, failed = native.load_batch(
                    paths, None, 256, branches, seed=r, augment=True,
                    num_threads=1, dtype="uint8",
                )
                dt = _t.perf_counter() - t0
                assert failed == 0
                best = max(best, n_img / dt)
            return best

        if native.native_available():
            # PRODUCTION path: DATA.SHIP_SCALES="top" default ships only the
            # top scale (the device derives the pyramid), so the trainer
            # calls the loader with n_branches=1 — the cores-needed budget
            # must be computed against THIS rate, not the thicker 3-scale
            # host pyramid (kept below for continuity with docs/PERF.md).
            per_core = rate_native_branches(1)
            per_core_3s = rate_native(1)
            pooled = rate_native(8)  # ==1 core here; shows thread overhead
        else:
            per_core = per_core_3s = pooled = 0.0
        pil = rate_pil()
    rec = {
        "metric": "host_decode_images_per_sec_per_core",
        "value": round(per_core, 1),
        "unit": "images/sec/core (native C++, uint8, top scale only — "
        "the DATA.SHIP_SCALES=top production path)",
        "vs_baseline": 1.0,  # tracked metric, no fixed target
    }
    print(json.dumps(rec))
    for name, v in (
        ("native_3scale", per_core_3s),
        ("native_8thread_1core", pooled),
        ("pil_fallback", pil),
    ):
        print(
            json.dumps(
                {
                    "metric": f"host_decode_{name}_images_per_sec",
                    "value": round(v, 1),
                    "unit": "images/sec",
                    "vs_baseline": 1.0,
                }
            )
        )
    if per_core > 0:
        print(
            json.dumps(
                {
                    "metric": "host_cores_to_feed_b128_device_rate",
                    "value": round(933.0 / per_core, 2),
                    "unit": "cores (@933 imgs/sec; b24 needs 516/rate)",
                    "vs_baseline": 1.0,
                }
            )
        )


def bench_audio_data() -> None:
    """Host audio-path budget (the audio twin of --metric data): wav read
    (stdlib wave + numpy frombuffer) and the off-rate resample fallback,
    per core, on 4 s utterances — states how many host cores feed the
    certified 37k utts/sec distillation step (mel extraction itself runs
    on-device, docs/PERF.md). Run with: python bench.py --metric audio"""
    import tempfile
    import time as _t

    import numpy as np

    from s2i_tpu.audio.wavio import read_wav, resample_linear, write_wav

    n, sec, sr = 200, 4, 16000
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n):
            p = f"{d}/u{i:03d}.wav"
            write_wav(p, rng.uniform(-0.5, 0.5, sec * sr).astype(np.float32), sr)
            paths.append(p)

        def rate(resample: bool, reps: int = 5) -> float:
            best = 0.0
            for _ in range(reps):
                t0 = _t.perf_counter()
                for p in paths:
                    x, r = read_wav(p)
                    if resample:
                        x = resample_linear(x, r, 22050)
                best = max(best, n / (_t.perf_counter() - t0))
            return best

        plain = rate(False)
        resampled = rate(True)
    print(
        json.dumps(
            {
                "metric": "host_wav_read_utts_per_sec_per_core",
                "value": round(plain, 1),
                "unit": f"utts/sec/core ({sec}s @ {sr//1000}kHz PCM16)",
                "vs_baseline": 1.0,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "host_wav_read_resample_utts_per_sec_per_core",
                "value": round(resampled, 1),
                "unit": "utts/sec/core (off-rate fallback: +linear resample)",
                "vs_baseline": 1.0,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "host_cores_to_feed_distill_rate",
                "value": round(37036.0 / plain, 2),
                "unit": "cores (@37,036 utts/sec certified device rate)",
                "vs_baseline": 1.0,
            }
        )
    )


def main(
    batch_size: int = 128, joint: bool = False, ship: str = "certified"
) -> None:
    """Headline: the full train step at the certified best-throughput batch
    (b128 on a 16 GB v5e — docs/PERF.md round-4 bigbatch cert, 933
    imgs/sec = +21.2% over b96 in-session; b24, the reference
    training-recipe batch, measures ~516 imgs/sec via --batch 24).
    ``joint=True`` benches BASELINE config #4 instead: the full-size speech
    encoder (bi-GRU over AUDIO.MAX_FRAMES mel frames) inside the G phase
    with the distillation regularizer (cfg/birds_joint_ft.yml stack).

    ``ship`` picks the batch's transfer layout: "certified" (default) feeds
    float32 images at all three scales — the layout every on-chip
    certification this round used; "production" feeds the DATA.* config
    defaults (uint8 images, top scale only), whose step additionally pays
    the device-side uint8→f32 normalize and the two pyramid avg-pools —
    cheap elementwise/pool work, but reading 4× fewer input bytes from HBM.
    Run both to quantify the (small) difference; the certified layout stays
    the default so driver-recorded rounds remain comparable."""
    import jax

    from s2i_tpu import config
    from s2i_tpu.data import SyntheticGanDataset, SyntheticSpeechDataset
    from s2i_tpu.train import gan

    cfg = config.default_cfg()  # full-size: gf=df=64, 3 stages, 256px top
    cfg.DTYPE.COMPUTE = "bfloat16"
    # match the dataset training recipes (cfg/*_3stages.yml all set 50.0) so
    # the certified step is literally the cfg/birds_3stages.yml step
    cfg.TRAIN.COEFF.COLOR_LOSS = 50.0
    if joint:
        cfg.TRAIN.JOINT_FT = True
        cfg.TRAIN.COEFF.DISTILL = 1.0
    # GAN.S2D and GAN.D_TRUNK_BATCH default to "auto": resolved from the
    # batch size when the step is built (small-batch optimizations; exact
    # math either way — docs/PERF.md has the crossover A/Bs).
    # HBM-pressure resilience: a killed relay client can leave its
    # server-side allocations resident (observed round 5: after a host-OOM
    # kill, even the known-good b96 step RESOURCE_EXHAUSTed until the pool
    # recycled). A smaller-batch number with a "fallback_from" marker beats
    # an error line in the driver record.
    ladder = [b for b in (batch_size, 96, 64, 48, 24) if b <= batch_size]
    ladder = sorted(set(ladder), reverse=True)
    last_err = None
    for try_batch in ladder:
        try:
            _bench_gan_at(cfg, try_batch, joint, ship, batch_size)
            return
        except Exception as e:  # noqa: BLE001 — match on the status string
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            last_err = e
            import gc

            gc.collect()
            print(
                f"# b{try_batch} RESOURCE_EXHAUSTED — retrying smaller",
                file=sys.stderr,
            )
    raise last_err


def _bench_gan_at(
    cfg, batch_size: int, joint: bool, ship: str, requested_batch: int
) -> None:
    import jax

    from s2i_tpu.data import SyntheticGanDataset, SyntheticSpeechDataset
    from s2i_tpu.train import gan

    cfg.TRAIN.BATCH_SIZE = batch_size
    models = gan.build_models(cfg, joint=joint)
    ds_kw = (
        dict(
            image_dtype=str(cfg.DATA.IMAGE_DTYPE),
            ship_scales=str(cfg.DATA.SHIP_SCALES),
        )
        if ship == "production"
        else {}
    )
    ds = SyntheticGanDataset(num_classes=8, examples_per_class=3, **ds_kw)
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
    import jax.numpy as jnp

    batch = jax.tree.map(jnp.asarray, batch)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = gan.make_train_step(cfg, models)

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(state, batch, rng, k):
        def body(s, _):
            s2, _m = step(s, batch, rng)  # rng folds s.step: steps differ
            return s2, None

        out, _ = jax.lax.scan(body, state, None, length=k)
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves(out.g_params)
        )

    k_lo, k_hi = 2, 10
    for k in (k_lo, k_hi):
        float(run_k(state, batch, jax.random.key(1), k))  # compile
    best = 0.0
    for _trial in range(3):
        t_lo = _timed_scalar(run_k, state, batch, jax.random.key(1), k_lo)
        t_hi = _timed_scalar(run_k, state, batch, jax.random.key(1), k_hi)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        if per > 0:
            best = max(best, batch_size / per)

    rec = {
        "metric": (
            "gan_joint_ft_images_per_sec_256px"
            if joint
            else "gan_train_images_per_sec_256px"
        ),
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / 256.0, 3),
    }
    if batch_size != requested_batch:
        rec["batch"] = batch_size
        rec["fallback_from"] = requested_batch
    print(json.dumps(rec))


if __name__ == "__main__":
    import argparse
    import time as _time

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--metric",
        choices=["gan", "joint", "mel", "loop", "infer", "data", "audio"],
        default="gan",
        help="headline GAN step throughput (default), joint-finetune step "
        "throughput (encoder in the loop, BASELINE config #4), mel-frontend "
        "frames/sec, end-to-end GanTrainer loop throughput, serving "
        "wav->image latency/throughput, host JPEG decode rate, or host "
        "wav read+resample rate",
    )
    ap.add_argument(
        "--batch", type=int, default=128,
        help="GAN-step batch size (128 = certified best imgs/sec/chip, "
        "round-4 bigbatch cert; 24 = reference training-recipe batch)",
    )
    ap.add_argument(
        "--ship", choices=["certified", "production"], default="certified",
        help="gan/joint batch transfer layout: 'certified' = float32 "
        "all-scales (the layout every on-chip certification used); "
        "'production' = DATA.* defaults (uint8, top scale only, device-"
        "side normalize + pyramid)",
    )
    cli_args = ap.parse_args()
    fn = {
        "mel": bench_frontend,
        "loop": bench_loop,
        "infer": bench_infer,
        "gan": functools.partial(main, cli_args.batch, False, cli_args.ship),
        "joint": functools.partial(main, cli_args.batch, True, cli_args.ship),
        "data": bench_data,
        "audio": bench_audio_data,
    }[cli_args.metric]
    # The relay's remote-compile service occasionally drops a response
    # mid-body (INTERNAL error), and after an abnormally-terminated client
    # the pool can refuse new sessions ("Unable to initialize backend
    # 'axon': UNAVAILABLE") for tens of minutes. Retry with a longer
    # cool-down for the backend-unavailable case — a failed init attempt
    # is cached for the life of the process, so each retry must also be
    # the first jax backend touch (fn() imports jax lazily; if the cache
    # already poisoned this process, re-exec into a fresh interpreter).
    # --metric data/audio are PURE-HOST benchmarks (numpy/PIL/native/wavio;
    # they never touch jax): run them directly — gating them behind the TPU
    # probe made a wedged relay burn the full ~55-minute ladder and then
    # fail a benchmark that needs zero TPU.
    if cli_args.metric in ("data", "audio"):
        fn()
        sys.exit(0)
    attempts = [0, 30, 300, 600, 900]
    first = int(os.environ.get("S2I_BENCH_ATTEMPT", "0"))
    for i, cooldown in enumerate(attempts):
        if i < first:
            continue
        _time.sleep(cooldown)
        # The relay has a third failure mode beyond mid-body drops and
        # UNAVAILABLE refusals: backend init that HANGS indefinitely (no
        # error, no grant). Probe it in a throwaway subprocess with a
        # timeout before touching jax in THIS process — a successful init
        # prints and exits in <~120 s, so a 300 s kill only ever hits a
        # client stuck pre-grant. On probe failure, burn this attempt
        # (this process stays unpoisoned; no re-exec needed).
        import subprocess as _sp

        try:
            probe = _sp.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=300,
            )
            # nonzero exit is a failure even with an empty stderr (SIGSEGV/
            # SIGKILL/OOM write nothing there) — an empty probe_err used to
            # fall through to fn() as if the backend were healthy
            probe_err = (
                (probe.stderr[-300:] or f"probe exit code {probe.returncode}")
                if probe.returncode
                else ""
            )
        except _sp.TimeoutExpired:
            probe_err = "backend init hang (probe timeout)"
        if probe_err:
            print(
                f"# bench attempt {i + 1}: backend probe failed "
                f"({probe_err})" + (
                    "" if i == len(attempts) - 1 else "; retrying"
                ),
                flush=True,
            )
            if i == len(attempts) - 1:
                raise RuntimeError(f"TPU backend unreachable: {probe_err}")
            continue
        try:
            fn()
            break
        except RuntimeError as e:
            last = i == len(attempts) - 1
            print(
                f"# bench attempt {i + 1} failed "
                f"({type(e).__name__}: {e})" + ("" if last else "; retrying"),
                flush=True,
            )
            if last:
                raise
            if "nable to initialize backend" in str(e):
                # backend-init failure is cached per-process: re-exec
                os.environ["S2I_BENCH_ATTEMPT"] = str(i + 1)
                os.execv(sys.executable, [sys.executable] + sys.argv)
        except Exception as e:  # noqa: BLE001 — transient relay errors only
            transient = any(
                s in str(e)
                for s in (
                    "UNAVAILABLE", "INTERNAL", "DEADLINE_EXCEEDED",
                    "FAILED_PRECONDITION", "Socket closed", "Connection reset",
                )
            )
            if not transient or i == len(attempts) - 1:
                # deterministic failures (assertion/schema bugs) surface
                # NOW instead of after four more cooldown+probe rounds
                raise
            print(f"# bench attempt {i + 1} failed "
                  f"({type(e).__name__}: {e}); retrying", flush=True)
