"""Independent numpy oracle for the audio frontend (test-only).

Computes log-mel the *conventional* way — per-frame window multiply then
``np.fft.rfft`` — sharing no code path with the matmul-formulated jnp/Pallas
implementations except the filterbank constants. SURVEY.md §4 calls for
exactly this kind of trusted host reference since the reference repo ships no
tests of its own.
"""

from __future__ import annotations

import numpy as np

from s2i_tpu.audio import filters
from s2i_tpu.audio.frontend import FrontendParams


def logmel_numpy(wav: np.ndarray, p: FrontendParams) -> np.ndarray:
    """wav [n_samples] or [B, n_samples] → log-mel [..., n_frames, n_mels]."""
    wav = np.asarray(wav, dtype=np.float64)
    if wav.ndim == 1:
        return _logmel_1d(wav, p)
    return np.stack([_logmel_1d(w, p) for w in wav])


def _logmel_1d(wav: np.ndarray, p: FrontendParams) -> np.ndarray:
    if p.preemphasis:
        wav = np.concatenate([wav[:1], wav[1:] - p.preemphasis * wav[:-1]])
    if p.center:
        pad = p.win_length // 2
        wav = np.pad(wav, (pad, pad), mode="reflect")
    window = filters.hann_window(p.win_length)
    n_frames = 1 + (len(wav) - p.win_length) // p.hop_length
    spec = np.empty((n_frames, p.n_bins))
    for i in range(n_frames):
        frame = wav[i * p.hop_length : i * p.hop_length + p.win_length] * window
        fft = np.fft.rfft(frame, n=p.n_fft)
        spec[i] = np.abs(fft) ** 2
    fb = filters.mel_filterbank(
        p.sample_rate, p.n_fft, p.n_mels, p.fmin, p.fmax, p.htk_mel, p.mel_norm
    )
    return np.log(spec @ fb.T + p.log_offset)
