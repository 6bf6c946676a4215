"""Pure-JAX audio frontend: wav → log-mel / MFCC.

This is the *reference path*: straightforward jnp built from the constant
matrices in :mod:`s2i_tpu.audio.filters`. The production path is the fused
Pallas kernel in :mod:`s2i_tpu.ops.mel_kernel`, which must match this to float
tolerance (tests/test_frontend.py). Pipeline (reference: librosa
melspectrogram → log → crop/pad → normalize, SURVEY.md §3.1):

  wav [B, n_samples]
  → (optional pre-emphasis)
  → frame (win_length, hop_length; no center padding by default)
  → windowed real-DFT power spectrum  (two matmuls against constant C/S)
  → mel filterbank projection         (matmul)
  → log(mel + offset)
  → (optional DCT-II → MFCC)
  → crop/pad to MAX_FRAMES
  → per-utterance mean/var normalization
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2i_tpu.audio import filters


@dataclasses.dataclass(frozen=True)
class FrontendParams:
    """Static frontend config + precomputed constant matrices (host numpy).

    Constants are float32 numpy; jnp paths close over them (XLA hoists them
    into the executable as literals / device constants).
    """

    sample_rate: int = 16000
    win_length: int = 400  # 25 ms @ 16 kHz
    hop_length: int = 160  # 10 ms @ 16 kHz
    n_fft: int = 512
    n_mels: int = 40
    fmin: float = 0.0
    fmax: float = 8000.0
    htk_mel: bool = False
    mel_norm: str = "slaney"
    log_offset: float = 1e-6
    max_frames: int = 1024
    normalize: str = "utterance"
    feature: str = "logmel"
    n_mfcc: int = 40
    preemphasis: float = 0.0
    center: bool = False

    # Derived constants (filled by __post_init__ via object.__setattr__).
    # compare=False keeps the dataclass hashable (hash/eq over the scalar
    # config only), which lets FrontendParams be a jit static argument.
    dft_cos: np.ndarray = dataclasses.field(default=None, repr=False, compare=False)
    dft_sin: np.ndarray = dataclasses.field(default=None, repr=False, compare=False)
    mel_fb: np.ndarray = dataclasses.field(default=None, repr=False, compare=False)
    dct: np.ndarray = dataclasses.field(default=None, repr=False, compare=False)

    def __post_init__(self):
        if self.win_length > self.n_fft:
            # librosa zero-pads the WINDOW up to n_fft but truncating the
            # frame time-aliases the DFT: windowed_dft_matrices would build
            # angles for t up to win_length-1 against an n_fft-period basis
            # (silently different features vs the np.fft oracle), and the
            # Pallas kernels assume frame rows fit the n_fft span. Fail
            # fast with the fix instead.
            raise ValueError(
                f"win_length={self.win_length} > n_fft={self.n_fft}: raise "
                "AUDIO.N_FFT to the next power of two >= the window"
            )
        c, s = filters.windowed_dft_matrices(self.win_length, self.n_fft)
        fb = filters.mel_filterbank(
            self.sample_rate,
            self.n_fft,
            self.n_mels,
            self.fmin,
            self.fmax,
            htk=self.htk_mel,
            norm=self.mel_norm,
        )
        d = filters.dct_matrix(self.n_mfcc, self.n_mels)
        object.__setattr__(self, "dft_cos", c.astype(np.float32))
        object.__setattr__(self, "dft_sin", s.astype(np.float32))
        object.__setattr__(self, "mel_fb", fb.astype(np.float32))
        object.__setattr__(self, "dct", d.astype(np.float32))

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def n_features(self) -> int:
        return self.n_mfcc if self.feature == "mfcc" else self.n_mels

    def num_frames(self, n_samples: int) -> int:
        n = n_samples + (self.win_length // 2) * 2 if self.center else n_samples
        if n < self.win_length:
            return 0
        return 1 + (n - self.win_length) // self.hop_length


def frontend_params_from_cfg(audio_cfg: Any) -> FrontendParams:
    """Build FrontendParams from a cfg.AUDIO block (reference-style keys)."""
    sr = int(audio_cfg.SAMPLE_RATE)
    return FrontendParams(
        sample_rate=sr,
        win_length=int(round(sr * float(audio_cfg.WIN_MS) / 1000.0)),
        hop_length=int(round(sr * float(audio_cfg.HOP_MS) / 1000.0)),
        n_fft=int(audio_cfg.N_FFT),
        n_mels=int(audio_cfg.N_MELS),
        fmin=float(audio_cfg.FMIN),
        fmax=float(audio_cfg.FMAX),
        htk_mel=bool(audio_cfg.HTK_MEL),
        mel_norm=str(audio_cfg.MEL_NORM),
        log_offset=float(audio_cfg.LOG_OFFSET),
        max_frames=int(audio_cfg.MAX_FRAMES),
        normalize=str(audio_cfg.NORMALIZE),
        feature=str(audio_cfg.FEATURE),
        n_mfcc=int(audio_cfg.N_MFCC),
        preemphasis=float(audio_cfg.PREEMPHASIS),
        center=bool(audio_cfg.CENTER),
    )


def preemphasize(wav: jax.Array, coeff: float) -> jax.Array:
    if coeff == 0.0:
        return wav
    return jnp.concatenate(
        [wav[..., :1], wav[..., 1:] - coeff * wav[..., :-1]], axis=-1
    )


def frame_signal(wav: jax.Array, p: FrontendParams) -> jax.Array:
    """[..., n_samples] → [..., n_frames, win_length] (static shapes only)."""
    if p.center:
        pad = p.win_length // 2
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    n_samples = wav.shape[-1]
    n_frames = 1 + (n_samples - p.win_length) // p.hop_length
    idx = (
        np.arange(n_frames)[:, None] * p.hop_length + np.arange(p.win_length)[None, :]
    )
    return wav[..., idx]


def power_spectrum(frames: jax.Array, p: FrontendParams) -> jax.Array:
    """[..., F, win] → [..., F, n_bins] via two matmuls (window folded in)."""
    c = jnp.asarray(p.dft_cos)
    s = jnp.asarray(p.dft_sin)
    # HIGHEST keeps these fp32 on TPU (no bf16 decomposition) — the log that
    # follows amplifies error in near-zero bins.
    re = jnp.dot(frames, c, precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, s, precision=jax.lax.Precision.HIGHEST)
    return re * re + im * im


def logmel_jnp(wav: jax.Array, p: FrontendParams) -> jax.Array:
    """wav [..., n_samples] → log-mel [..., n_frames, n_mels]."""
    wav = preemphasize(wav.astype(jnp.float32), p.preemphasis)
    frames = frame_signal(wav, p)
    pspec = power_spectrum(frames, p)
    mel = jnp.dot(
        pspec, jnp.asarray(p.mel_fb).T, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.log(mel + p.log_offset)


def mfcc_jnp(wav: jax.Array, p: FrontendParams) -> jax.Array:
    """wav → MFCC [..., n_frames, n_mfcc] (DCT-II of log-mel)."""
    lm = logmel_jnp(wav, p)
    return lm @ jnp.asarray(p.dct).T


def crop_or_pad_frames(
    feats: jax.Array, max_frames: int, pad_value: float = 0.0
) -> tuple[jax.Array, jax.Array]:
    """Fixed-length crop/pad along the frame axis (-2).

    Returns (features [..., max_frames, D], valid_mask [..., max_frames]).
    The mask marks real (non-padding) frames so downstream pooling/normalize
    can ignore padding — the reference pads host-side and ignores the issue;
    we keep the mask because fixed shapes are mandatory under jit.
    """
    n = feats.shape[-2]
    if n >= max_frames:
        out = feats[..., :max_frames, :]
        mask = jnp.ones(out.shape[:-1], dtype=bool)
    else:
        pad = [(0, 0)] * (feats.ndim - 2) + [(0, max_frames - n), (0, 0)]
        out = jnp.pad(feats, pad, constant_values=pad_value)
        mask = jnp.broadcast_to(jnp.arange(max_frames) < n, out.shape[:-1])
    return out, mask


def frames_valid_mask(
    wav_len: jax.Array, p: FrontendParams, max_frames: int
) -> jax.Array:
    """Valid-frame mask [B, max_frames] from per-utterance sample counts —
    frame i is real iff its window fits inside the signal as framed, i.e.
    including the reflect padding when ``p.center`` (mirrors
    ``FrontendParams.num_frames``: without the pad term, center mode would
    wrongly invalidate the last ~win/hop real frames of every utterance)."""
    idx = jnp.arange(max_frames)
    eff_len = wav_len + (2 * (p.win_length // 2) if p.center else 0)
    return idx[None, :] * p.hop_length + p.win_length <= eff_len[:, None]


def normalize_features(
    feats: jax.Array, mask: jax.Array | None = None, eps: float = 1e-8
) -> jax.Array:
    """Per-utterance mean/variance normalization over (frames, features).

    With a mask, statistics are computed over valid frames only.
    """
    if mask is None:
        mean = jnp.mean(feats, axis=(-2, -1), keepdims=True)
        var = jnp.var(feats, axis=(-2, -1), keepdims=True)
    else:
        m = mask[..., None].astype(feats.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=(-2, -1), keepdims=True), 1.0) * feats.shape[-1]
        mean = jnp.sum(feats * m, axis=(-2, -1), keepdims=True) / denom
        var = (
            jnp.sum(jnp.square(feats - mean) * m, axis=(-2, -1), keepdims=True)
            / denom
        )
    out = (feats - mean) * jax.lax.rsqrt(var + eps)
    if mask is not None:
        out = out * mask[..., None].astype(feats.dtype)
    return out


_FUSED_PROBE: dict[tuple, bool] = {}


def _fused_kernel_compiles(shape, dtype, p: FrontendParams) -> bool:
    """One-time per-(shape, geometry) probe: can the fused Pallas kernel
    actually LOWER on this backend? Compiles it standalone via AOT
    (``jit(...).lower(...).compile()`` on ShapeDtypeStructs — no device
    data, legal even while an outer function is being traced) and caches
    the verdict. A Python-side ValueError pre-check rejection also lands
    here as False, so the auto path never hard-fails on a valid cfg.

    Only DETERMINISTIC rejections (the ValueError pre-check, Mosaic
    lowering errors) are cached: a transient backend failure (relay
    "UNAVAILABLE", dropped connection) answers False for THIS call — the
    jnp fallback keeps the caller working — but is retried next call, so
    an outage at probe time cannot permanently demote the production TPU
    frontend to the 1.59×-slower jnp path."""
    key = (tuple(shape), str(dtype), p)
    hit = _FUSED_PROBE.get(key)
    if hit is not None:
        return hit
    try:
        from s2i_tpu.ops import mel_kernel

        jax.jit(
            lambda w: mel_kernel.logmel_pallas_fused(w, p)
        ).lower(jax.ShapeDtypeStruct(shape, dtype)).compile()
        ok = True
    except ValueError:  # kernel's own geometry pre-check: deterministic
        ok = False
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        transient = any(
            s in msg
            for s in (
                "UNAVAILABLE",
                "Unable to initialize backend",
                "DEADLINE_EXCEEDED",
                "Socket closed",
                "Connection reset",
            )
        )
        if transient:
            logging.warning(
                "fused mel kernel probe hit a transient backend error "
                "(falling back to jnp for this call, will re-probe): %s",
                msg,
            )
            return False
        ok = False  # Mosaic/lowering rejection: deterministic for this key
    _FUSED_PROBE[key] = ok
    return ok


def extract_features(
    wav: jax.Array,
    p: FrontendParams,
    use_pallas: bool | None = None,
    wav_len: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full L0 pipeline: wav [B, n_samples] → ([B, max_frames, D], mask).

    ``use_pallas=None`` (production default) auto-selects: on TPU the
    fused-framing Pallas kernel (`ops.mel_kernel.logmel_pallas_fused` —
    framing + windowed-DFT + mel + log in one VMEM-resident kernel,
    certified 1.59× the jnp path on v5e, docs/PERF.md round 3); elsewhere
    the jnp/XLA formulation. ``True``/``False`` force kernel/jnp. The v1
    kernel (XLA-side framing gather) remains as `logmel_pallas` for A/Bs —
    it LOSES to jnp (~0.55×) and is not selected. All paths agree with the
    numpy oracle to ~1e-4. ``wav_len`` (per-utterance sample counts for
    zero-padded batches) tightens the validity mask so padding frames are
    excluded from normalization and downstream pooling.
    """
    auto = use_pallas is None
    if auto:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and auto:
        # Mosaic rejects some block shapes only at LOWERING time (see
        # CLAUDE.md), which surfaces when the ENCLOSING jit compiles —
        # after tracing, outside the try/except below. The auto path
        # therefore AOT-compiles the kernel standalone once per
        # (geometry, wav shape) and falls back to jnp if the backend
        # refuses; an explicit use_pallas=True skips the probe but still
        # falls back (with a warning) on the kernel's own geometry
        # pre-check — the frontend may never hard-fail on a valid cfg
        # (tests/test_frontend.py pins this contract).
        use_pallas = _fused_kernel_compiles(wav.shape, wav.dtype, p)
    if use_pallas:
        from s2i_tpu.ops import mel_kernel

        try:
            feats = mel_kernel.logmel_pallas_fused(wav, p)
        except ValueError as e:
            # exotic frame geometry the fused kernel rejects (e.g.
            # n_fft/hop > 9): fall back to the jnp formulation. Warn when
            # the caller FORCED the kernel so a pinned-kernel benchmark
            # can't silently measure the jnp path as "fused".
            if not auto:
                logging.warning(
                    "use_pallas=True but the fused mel kernel rejected "
                    "this geometry (%s); computing the jnp path instead",
                    e,
                )
            use_pallas = False
        else:
            if p.feature == "mfcc":
                feats = feats @ jnp.asarray(p.dct).T
    if not use_pallas:
        feats = mfcc_jnp(wav, p) if p.feature == "mfcc" else logmel_jnp(wav, p)
    feats, mask = crop_or_pad_frames(feats, p.max_frames)
    if wav_len is not None:
        mask = mask & frames_valid_mask(wav_len, p, p.max_frames)
    if p.normalize == "utterance":
        feats = normalize_features(feats, mask)
    return feats, mask
