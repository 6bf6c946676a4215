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


class _StubPipe:
    """pipe.generate_async stand-in (the collator's dispatch hook):
    returns per-row tiles stamped with each row's first wav sample, so
    tests can assert the pipelined jobs↔batch mapping stays correct."""

    def __init__(
        self, delay_s: float = 0.0, fail: bool = False,
        fail_readback: bool = False,
    ):
        self.p = _StubParams()
        self.delay_s = delay_s
        self.fail = fail
        self.fail_readback = fail_readback
        self.calls = 0

    def generate_async(self, wavs, lens, output_dtype="uint8"):
        self.calls += 1
        if self.delay_s:
            time.sleep(self.delay_s)
        if self.fail:
            raise RuntimeError("device gone")
        if self.fail_readback:
            return _LazyReadbackFail()
        stamp = wavs[:, 0].astype(np.uint8)
        return np.broadcast_to(
            stamp[:, None, None, None], (wavs.shape[0], 8, 8, 3)
        ).copy()


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
