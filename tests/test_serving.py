"""Serving Batcher lifecycle: bounded-queue backpressure and clean
shutdown (no waiter may block forever across a stop/restart). Uses a stub
pipeline so no device work is involved — the HTTP round-trip tests in
tests/test_loop.py cover the real wav→image path."""

import queue
import threading
import time

import numpy as np
import pytest

from s2i_tpu.serving import Batcher


class _StubParams:
    max_frames = 4
    hop_length = 2
    win_length = 4
    sample_rate = 16000


class _LazyReadbackFail:
    """Stands in for an in-flight device array whose readback dies."""

    def __array__(self, dtype=None, copy=None):
        raise RuntimeError("readback gone")


class _LazyTile:
    """Stands in for an in-flight device array: the batch's value is only
    materialized when ``np.asarray`` forces it, and the forcing is recorded
    in the pipe's event log — so a regression that accidentally reads back
    at dispatch time changes the observable event order."""

    def __init__(self, arr, idx, events):
        self._arr = arr
        self._idx = idx
        self._events = events

    def __array__(self, dtype=None, copy=None):
        self._events.append(("readback", self._idx))
        return self._arr if dtype is None else self._arr.astype(dtype)


class _StubPipe:
    """pipe.generate_async stand-in (the collator's dispatch hook):
    returns LAZY per-row tiles stamped with each row's first wav sample —
    lazy so the tests exercise a genuinely deferred readback (not an eager
    array), stamped so the pipelined jobs↔batch mapping stays checkable.
    ``events`` logs ("dispatch", i)/("readback", i) in observed order."""

    def __init__(
        self, delay_s: float = 0.0, fail: bool = False,
        fail_readback: bool = False,
    ):
        self.p = _StubParams()
        self.delay_s = delay_s
        self.fail = fail
        self.fail_readback = fail_readback
        self.calls = 0
        self.events = []

    def generate_async(self, wavs, lens, output_dtype="uint8"):
        self.calls += 1
        if self.delay_s:
            time.sleep(self.delay_s)
        if self.fail:
            raise RuntimeError("device gone")
        if self.fail_readback:
            return _LazyReadbackFail()
        self.events.append(("dispatch", self.calls))
        stamp = wavs[:, 0].astype(np.uint8)
        tile = np.broadcast_to(
            stamp[:, None, None, None], (wavs.shape[0], 8, 8, 3)
        ).copy()
        return _LazyTile(tile, self.calls, self.events)


def test_batcher_roundtrip_and_close():
    b = Batcher(_StubPipe(), batch_size=2, max_pending=8)
    jobs = [b.submit(np.zeros(4, np.float32)) for _ in range(3)]
    for j in jobs:
        assert j.done.wait(timeout=10)
        assert j.error is None and j.result is not None
    b.close()
    assert not b._thread.is_alive()
    with pytest.raises(RuntimeError):
        b.submit(np.zeros(4, np.float32))
    b.close()  # idempotent


def test_batcher_backpressure_full_queue_rejects():
    pipe = _StubPipe(delay_s=0.3)
    b = Batcher(pipe, batch_size=1, max_pending=2, wait_ms=1)
    try:
        admitted = []
        with pytest.raises(queue.Full):
            for _ in range(32):  # far beyond capacity + in-flight
                admitted.append(b.submit(np.zeros(4, np.float32)))
        # every admitted job still completes (bounded, not lossy)
        for j in admitted:
            assert j.done.wait(timeout=30)
            assert j.error is None
    finally:
        b.close()


def test_batcher_close_fails_stranded_jobs():
    """Jobs admitted but never collated must be failed on close, not
    leave their waiters hanging."""
    pipe = _StubPipe(delay_s=0.5)
    b = Batcher(pipe, batch_size=1, max_pending=16, wait_ms=1)
    jobs = [b.submit(np.zeros(4, np.float32)) for _ in range(6)]
    closer = threading.Thread(target=b.close)
    closer.start()
    for j in jobs:
        assert j.done.wait(timeout=30), "waiter blocked through shutdown"
        assert j.result is not None or j.error == "server shutting down"
    closer.join(timeout=30)
    assert not b._thread.is_alive()


def test_batcher_device_failure_propagates():
    b = Batcher(_StubPipe(fail=True), batch_size=2, max_pending=4)
    try:
        j = b.submit(np.zeros(4, np.float32))
        assert j.done.wait(timeout=10)
        assert j.error is not None and "device gone" in j.error
    finally:
        b.close()


def test_batcher_readback_failure_propagates():
    """A batch that dispatched fine but whose device→host readback dies
    (the pipelined `pending` path) must fail its waiters, not hang them."""
    b = Batcher(_StubPipe(fail_readback=True), batch_size=2, max_pending=4)
    try:
        j = b.submit(np.zeros(4, np.float32))
        assert j.done.wait(timeout=10)
        assert j.error is not None and "readback gone" in j.error
    finally:
        b.close()


def test_batcher_pipelined_batches_keep_job_mapping():
    """Sustained load drives the depth-1 dispatch pipeline (batch i+1
    dispatched before batch i's readback): every job must still get ITS
    row — stamped by the stub with the job's own wav value — and close()
    must finalize an in-flight pending batch rather than strand it."""
    b = Batcher(_StubPipe(), batch_size=2, max_pending=64, wait_ms=1)
    try:
        jobs = []
        for v in range(1, 41):  # 20 back-to-back batches
            wav = np.full(4, float(v), np.float32)
            jobs.append((v, b.submit(wav)))
        for v, j in jobs:
            assert j.done.wait(timeout=30)
            assert j.error is None
            assert int(j.result[0, 0, 0]) == v, "pipelined rows crossed jobs"
    finally:
        b.close()
    assert not b._thread.is_alive()


def test_batcher_pipelined_dispatch_precedes_readback():
    """The depth-1 pipeline must dispatch batch i+1 BEFORE forcing batch
    i's readback under sustained load. The lazy stub records both sides,
    so a regression that forces readback at dispatch time (serializing
    the device) flips the event order and fails here even though the
    job↔row mapping test above would still pass."""
    pipe = _StubPipe(delay_s=0.05)
    b = Batcher(pipe, batch_size=2, max_pending=64, wait_ms=1)
    try:
        jobs = [
            b.submit(np.full(4, float(v + 1), np.float32)) for v in range(8)
        ]
        for j in jobs:
            assert j.done.wait(timeout=30)
            assert j.error is None
    finally:
        b.close()
    pos = {e: k for k, e in enumerate(pipe.events)}
    reads = sorted(i for kind, i in pipe.events if kind == "readback")
    assert reads == list(range(1, pipe.calls + 1))  # every batch read back
    # readbacks are forced in batch order...
    read_order = [i for kind, i in pipe.events if kind == "readback"]
    assert read_order == reads
    # ...and at least one later batch was dispatched before an earlier
    # batch's readback was forced (the overlap actually happened; all 8
    # jobs are queued while batch 1 sits in its 50 ms dispatch delay, so
    # batch 2 must dispatch before batch 1 is finalized)
    assert any(
        pos.get(("dispatch", i + 1), 1 << 30) < pos[("readback", i)]
        for i in range(1, pipe.calls)
    )


def test_server_caps_body_size_before_reading():
    """An attacker-controlled Content-Length beyond ``max_body_bytes``
    must be rejected with 413 BEFORE the body is read into host memory;
    a legitimate small wav on the same server still serves 200/PNG."""
    import io
    import threading
    import urllib.error
    import urllib.request

    from s2i_tpu.audio.wavio import write_wav
    from s2i_tpu.serving import make_server

    pipe = _StubPipe()
    # warmup + (future) sync paths go through .generate
    pipe.generate = lambda wavs, lens, output_dtype="uint8": np.asarray(
        pipe.generate_async(wavs, lens, output_dtype)
    )
    srv = make_server(
        pipe, "127.0.0.1", 0, batch_size=2,
        max_body_bytes=4096, job_timeout_s=30,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        big = b"\x00" * 8192  # > cap: must bounce without decoding
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=big, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 413

        buf = io.BytesIO()
        write_wav(buf, np.zeros(160, np.float32), 16000)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=buf.getvalue(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.shutdown()
        srv.server_close()
