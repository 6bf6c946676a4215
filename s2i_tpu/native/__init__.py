"""Native (C++) host data-path bindings.

Compiles ``image_loader.cpp`` on first use (g++ -O3, links libjpeg) and
exposes it through ctypes; the pure-PIL path in ``data/stackgan.py`` is the
fallback whenever the toolchain, libjpeg, or a decode is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "build", "libimage_loader.so")
_SRC = os.path.join(_HERE, "image_loader.cpp")
_lock = threading.Lock()
_lib = None
_unavailable: str | None = None


def _build() -> None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
        "-ljpeg",
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the ctypes lib or None if native support is unavailable."""
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.il_load_batch.restype = ctypes.c_int
            lib.il_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_uint64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.il_load_batch_u8.restype = ctypes.c_int
            lib.il_load_batch_u8.argtypes = lib.il_load_batch.argtypes
            lib.il_probe.restype = ctypes.c_int
            lib.il_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception as e:  # toolchain/libjpeg missing: PIL fallback
            _unavailable = str(e)
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_batch(
    paths: list[str],
    bboxes: np.ndarray | None,
    imsize: int,
    branch_num: int,
    seed: int,
    augment: bool,
    num_threads: int = 8,
    dtype: str = "float32",
    fast_decode: bool = False,
) -> tuple[list[np.ndarray], int]:
    """Decode+transform a batch natively.

    Returns ([branch_num arrays [N, S, S, 3]], n_failed). ``dtype="float32"``
    yields [-1,1] values; ``dtype="uint8"`` yields raw [0,255] for device-side
    normalization (4x fewer host->device bytes — see DATA.IMAGE_DTYPE).
    ``fast_decode`` enables DCT-scaled JPEG decode (libjpeg M/8 scaling
    chosen so the scaled crop region still covers the resize target) — an
    opt-in approximation knob (DATA.FAST_DECODE) for throughput-bound hosts.
    Failed slots are zeroed — the caller backfills them via PIL.
    """
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    if dtype not in ("float32", "uint8"):
        raise ValueError(f"unsupported loader dtype {dtype!r}")
    n = len(paths)
    base = imsize >> (branch_num - 1)
    np_dtype = np.float32 if dtype == "float32" else np.uint8
    outs = [
        np.empty((n, base << i, base << i, 3), np_dtype)
        for i in range(branch_num)
    ]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if bboxes is not None:
        bb = np.ascontiguousarray(bboxes, dtype=np.float32)
        c_bb = bb.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        c_bb = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    c_outs = (ctypes.c_void_p * branch_num)(
        *[o.ctypes.data_as(ctypes.c_void_p) for o in outs]
    )
    entry = lib.il_load_batch if dtype == "float32" else lib.il_load_batch_u8
    failed = entry(
        c_paths,
        n,
        c_bb,
        imsize,
        branch_num,
        ctypes.c_uint64(seed & (2**64 - 1)),
        1 if augment else 0,
        c_outs,
        num_threads,
        1 if fast_decode else 0,
    )
    return outs, int(failed)
