"""Minimal production serving layer: HTTP → SpeechToImage pipeline.

Stdlib-only (http.server) so it runs anywhere the framework does. The device
work is the single jitted wav→image program from :mod:`s2i_tpu.pipeline`;
requests are micro-batched by a background collator thread so concurrent
clients share one TPU dispatch (static batch shape = compiled once).

    POST /generate   body: WAV bytes (PCM 8/16/24/32-bit)   → PNG bytes
    GET  /healthz                                       → {"status": "ok"}

CLI: ``python scripts/serve.py --cfg ... --encoder_ckpt ... --gan_ckpt ...``
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from s2i_tpu.audio.wavio import read_wav, resample_linear
from s2i_tpu.pipeline import SpeechToImage


class _Job:
    def __init__(self, wav: np.ndarray, n: int):
        self.wav = wav
        self.n = n
        self.done = threading.Event()
        self.result: np.ndarray | None = None
        self.error: str | None = None


class Batcher:
    """Collates jobs into fixed-size device batches (pad with zeros).

    Backpressure: the queue is bounded (``max_pending``); a submit against
    a full queue raises ``queue.Full`` immediately (the HTTP layer maps it
    to 503) instead of growing an unbounded backlog behind a slow device.
    Throughput: dispatch is pipelined one batch deep (see :meth:`_run`) —
    the device computes batch i+1 while the host reads back batch i.
    Shutdown: :meth:`close` drains — already-queued jobs still run, new
    submits are rejected, the collator thread is joined, and anything the
    collator never reached is failed so no waiter blocks forever.
    """

    def __init__(
        self,
        pipe: SpeechToImage,
        batch_size: int = 8,
        wait_ms: int = 5,
        max_pending: int = 64,
    ):
        self.pipe = pipe
        self.batch_size = batch_size
        self.wait_s = wait_ms / 1000.0
        p = pipe.p
        self.max_samples = (p.max_frames - 1) * p.hop_length + p.win_length
        self._q: queue.Queue[_Job] = queue.Queue(maxsize=max_pending)
        self._closed = threading.Event()
        # Serializes the closed-check+put in submit against close's
        # closed-set: without it a submit that passed the check could land
        # its job AFTER close drained the queue — enqueued but never
        # collated nor failed, blocking its waiter for the full HTTP
        # timeout instead of getting the shutdown error.
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, wav: np.ndarray) -> _Job:
        job = _Job(wav, min(len(wav), self.max_samples))
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("batcher is shut down")
            self._q.put_nowait(job)  # raises queue.Full when saturated
        return job

    def close(self, timeout: float = 60.0) -> None:
        """Idempotent: reject new work, drain the queue, join the thread.
        Every job enqueued before close is either processed by the
        collator or failed by the drain below (the submit lock guarantees
        no job lands after the drain); if the thread outlives ``timeout``
        (e.g. mid first-compile) it still finishes its in-flight batch,
        then sees ``_closed`` and exits."""
        with self._submit_lock:
            if self._closed.is_set():
                return
            self._closed.set()
        self._thread.join(timeout)
        while True:  # fail anything the collator never picked up
            try:
                job = self._q.get_nowait()
            except queue.Empty:
                break
            job.error = "server shutting down"
            job.done.set()

    @staticmethod
    def _finalize(jobs, device_imgs) -> None:
        """Block on the device→host readback of a dispatched batch and
        release its waiters."""
        try:
            imgs = np.asarray(device_imgs)
            for j, job in enumerate(jobs):
                job.result = imgs[j]
        except Exception as e:  # propagate to every waiter
            for job in jobs:
                job.error = f"{type(e).__name__}: {e}"
        for job in jobs:
            job.done.set()

    def _run(self) -> None:
        # Depth-1 dispatch pipeline: `pending` is a batch whose device
        # program is in flight (JAX async dispatch) but whose readback has
        # not been forced yet. Under sustained load the collator dispatches
        # batch i+1 BEFORE syncing batch i, so the device computes i+1
        # while the host blocks on i's device→host bytes — on a thin link
        # (readback-dominated) this hides nearly all device time; under
        # sporadic load the empty-queue branch finalizes immediately, so
        # single requests pay no added latency.
        pending: tuple[list[_Job], object] | None = None
        while True:
            if pending is not None:
                try:
                    jobs = [self._q.get_nowait()]
                except queue.Empty:
                    self._finalize(*pending)
                    pending = None
                    continue
            else:
                try:
                    jobs = [self._q.get(timeout=0.1)]
                except queue.Empty:
                    if self._closed.is_set():
                        return  # drained + closed: exit
                    continue
            try:
                while len(jobs) < self.batch_size:
                    if pending is not None:
                        # a batch is already in flight: dispatch immediately
                        # with whatever is queued instead of waiting up to
                        # (batch_size-1)*wait_s for fill — the device is busy
                        # anyway and the fill wait would only defer the
                        # pending batch's readback (tail latency).
                        jobs.append(self._q.get_nowait())
                    else:
                        jobs.append(self._q.get(timeout=self.wait_s))
            except queue.Empty:
                pass
            wavs = np.zeros((self.batch_size, self.max_samples), np.float32)
            lens = np.zeros(self.batch_size, np.int32)
            for j, job in enumerate(jobs):
                wavs[j, : job.n] = job.wav[: job.n]
                lens[j] = job.n
            try:
                # uint8 readback: PNG-ready bytes, 4x less device→host
                dev = self.pipe.generate_async(
                    wavs, lens, output_dtype="uint8"
                )
            except Exception as e:  # trace/dispatch error: fail this batch
                dev = None
                for job in jobs:
                    job.error = f"{type(e).__name__}: {e}"
            if pending is not None:
                self._finalize(*pending)
                pending = None
            if dev is None:
                for job in jobs:
                    job.done.set()
            else:
                pending = (jobs, dev)


def _decode_wav_bytes(data: bytes, target_sr: int) -> np.ndarray:
    # One source of truth for sample decoding + mono downmix: read_wav
    # accepts file-like objects, covers PCM 8/16/24/32, and carries the
    # int32-vs-float32 width==4 fix (s2i_tpu/audio/wavio.py module note) —
    # the previous inline copy here misdecoded int32 PCM as IEEE float.
    x, sr = read_wav(io.BytesIO(data))
    return resample_linear(x, sr, target_sr)


def make_server(
    pipe: SpeechToImage, host: str = "127.0.0.1", port: int = 8500,
    batch_size: int = 8, max_pending: int = 64, warmup: bool = True,
    max_body_bytes: int = 8 << 20, job_timeout_s: float = 120.0,
) -> ThreadingHTTPServer:
    """``max_body_bytes`` caps the request body BEFORE it is read into
    memory (oversize → 413; at 16 kHz/16-bit PCM the 8 MiB default is
    ~4 min of audio, far beyond any MAX_FRAMES window). ``job_timeout_s``
    bounds how long a handler waits for its batch (default matches the
    previous fixed 120 s; raise it if first-compile can exceed it and
    ``warmup`` is off)."""
    batcher = Batcher(pipe, batch_size, max_pending=max_pending)
    if warmup:
        # Trace+compile the exact (batch_size, max_samples) program the
        # collator dispatches BEFORE accepting traffic: on TPU the first
        # compile (plus session init) can exceed the handler's fixed 120 s
        # job wait, turning the first real request into a 500 "timeout"
        # whose batch then completes and is discarded.
        wavs = np.zeros((batch_size, batcher.max_samples), np.float32)
        lens = np.ones(batch_size, np.int32)
        pipe.generate(wavs, lens, output_dtype="uint8")
    sample_rate = pipe.p.sample_rate

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._json(400, {"error": "bad Content-Length"})
                return
            if n > max_body_bytes:
                # reject by the declared length BEFORE reading the body:
                # an attacker-controlled Content-Length must not size a
                # host allocation (previously read fully into memory,
                # uncapped)
                self._json(413, {
                    "error": f"body {n} bytes exceeds cap {max_body_bytes}"
                })
                return
            try:
                wav = _decode_wav_bytes(self.rfile.read(n), sample_rate)
            except Exception as e:
                self._json(400, {"error": f"bad wav: {e}"})
                return
            try:
                job = batcher.submit(wav)
            except queue.Full:
                self._json(503, {"error": "queue full, retry later"})
                return
            except RuntimeError:
                self._json(503, {"error": "server shutting down"})
                return
            job.done.wait(timeout=job_timeout_s)
            if job.error or job.result is None:
                self._json(500, {"error": job.error or "timeout"})
                return
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(job.result).save(buf, format="PNG")
            png = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    class Server(ThreadingHTTPServer):
        def server_close(self):  # stop/restart-safe: join the collator
            super().server_close()
            batcher.close()

    srv = Server((host, port), Handler)
    srv.batcher = batcher
    return srv
