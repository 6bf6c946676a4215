"""Fused Pallas TPU kernel for the log-mel frontend.

Replaces the reference's host-side librosa melspectrogram (SURVEY.md §2 row 1)
with one on-device fused kernel per frame-block:

    frames @ C  ─┐
                 ├─ re² + im²  →  @ melᵀ  →  log(· + offset)
    frames @ S  ─┘

All three contractions hit the MXU; the square/add/log run on the VPU over
VMEM-resident intermediates, so the power spectrum never round-trips to HBM.
The windowed-DFT matrices C/S come from
:func:`s2i_tpu.audio.filters.windowed_dft_matrices` with the Hann window and
the n_fft zero-padding folded in (rows ≥ win_length are zero, which lets the
host framing gather a full ``n_fft`` span per frame without masking).

Equivalence against the pure-jnp path is enforced by tests/test_frontend.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from s2i_tpu.audio.frontend import FrontendParams, preemphasize


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mel_kernel(
    frames_ref, cs_ref, melt_ref, out_ref, *, log_offset, n_bins_pad, precision
):
    f = frames_ref[:]
    # ONE DFT matmul against the concatenated [cos | sin] matrix: half the
    # MXU dispatches and a single pass over the frame block, vs separate
    # re/im contractions.
    cs = jnp.dot(
        f, cs_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    re = cs[:, :n_bins_pad]
    im = cs[:, n_bins_pad:]
    power = re * re + im * im
    mel = jnp.dot(
        power, melt_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out_ref[:] = jnp.log(mel + log_offset)


@functools.partial(
    jax.jit, static_argnames=("p", "block_frames", "precision")
)
def logmel_pallas(
    wav: jax.Array,
    p: FrontendParams,
    block_frames: int = 256,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """wav [B, n_samples] → log-mel [B, n_frames, n_mels] via the fused kernel.

    Framing is a strided gather done by XLA (bandwidth-bound, fuses with the
    preceding load); everything downstream of framing is one pallas_call.
    """
    assert wav.ndim == 2, "expect [batch, n_samples]"
    wav = preemphasize(wav.astype(jnp.float32), p.preemphasis)
    if p.center:
        pad = p.win_length // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")

    b, n_samples = wav.shape
    n_frames = 1 + (n_samples - p.win_length) // p.hop_length
    if n_frames <= 0:
        raise ValueError("signal shorter than one window")

    # Gather n_fft (not win_length) samples per frame; DFT rows >= win_length
    # are zero so the extra samples never contribute. Pad the tail so the last
    # frame's span exists.
    span = p.n_fft
    wav = jnp.pad(wav, ((0, 0), (0, max(0, span - p.win_length))))
    idx = (
        np.arange(n_frames)[:, None] * p.hop_length + np.arange(span)[None, :]
    )
    frames = wav[:, idx].reshape(b * n_frames, span)

    # Pad constant matrices to lane-aligned shapes.
    bins_pad = _round_up(p.n_bins, 128)
    mels_pad = _round_up(p.n_mels, 128)
    span_pad = _round_up(span, 128)

    cs = np.zeros((span_pad, 2 * bins_pad), np.float32)
    cs[: p.win_length, : p.n_bins] = p.dft_cos
    cs[: p.win_length, bins_pad : bins_pad + p.n_bins] = p.dft_sin
    melt = np.zeros((bins_pad, mels_pad), np.float32)
    melt[: p.n_bins, : p.n_mels] = p.mel_fb.T

    rows = frames.shape[0]
    rows_pad = _round_up(rows, block_frames)
    frames = jnp.pad(frames, ((0, rows_pad - rows), (0, span_pad - span)))

    grid = (rows_pad // block_frames,)
    # On non-TPU backends (CPU test mesh) run the kernel in interpreter mode —
    # same kernel body, same coverage, no TPU required (SURVEY.md §4).
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _mel_kernel,
            log_offset=p.log_offset,
            n_bins_pad=bins_pad,
            precision=precision,
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, mels_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_frames, span_pad),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (span_pad, 2 * bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bins_pad, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_frames, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * span_pad * bins_pad * 2
            + 2 * rows_pad * bins_pad * mels_pad,
            bytes_accessed=4
            * (
                rows_pad * span_pad
                + 2 * span_pad * bins_pad
                + bins_pad * mels_pad
                + rows_pad * mels_pad
            ),
            transcendentals=rows_pad * mels_pad,
        ),
    )(frames, jnp.asarray(cs), jnp.asarray(melt))

    return out[:rows, : p.n_mels].reshape(b, n_frames, p.n_mels)


def _mel_fused_kernel(
    wav_ref,
    tail_ref,
    cs_ref,
    melt_ref,
    out_ref,
    *,
    log_offset,
    n_bins_pad,
    block_frames,
    rows_per_frame,
    precision,
):
    F = block_frames
    # Framing INSIDE the kernel: the pipeline delivers this block's F
    # hop-sized wav rows plus the NEXT 8 rows (a second, overlapping
    # in_spec on the same array — double-buffered by pallas, no manual
    # DMA): HBM sees each wav sample ~once, not the 3.2× of a
    # materialized XLA frame gather.
    x = jnp.concatenate([wav_ref[0], tail_ref[0]], axis=0)  # [F+8, hop]
    hop = x.shape[-1]
    # The frame matrix is never built: frames[f] = wav[f·hop : f·hop + span]
    # means frames @ CS = Σ_r x[r : F+r] @ CS[r·hop : (r+1)·hop] — an
    # accumulated matmul over row-shifted VMEM views. (A concatenate of the
    # shifted slices is the same math but Mosaic rejects mismatched sublane
    # offsets on the non-concat dimension; the matmul-operand form lowers.)
    cs = jnp.zeros(
        (F, cs_ref.shape[-1]), jnp.float32
    )
    for r in range(rows_per_frame):
        cs = cs + jnp.dot(
            x[r : F + r],
            cs_ref[pl.ds(r * hop, hop), :],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    re = cs[:, :n_bins_pad]
    im = cs[:, n_bins_pad:]
    power = re * re + im * im
    mel = jnp.dot(
        power, melt_ref[:], preferred_element_type=jnp.float32, precision=precision
    )
    out_ref[0] = jnp.log(mel + log_offset)


@functools.partial(
    jax.jit, static_argnames=("p", "block_frames", "precision")
)
def logmel_pallas_fused(
    wav: jax.Array,
    p: FrontendParams,
    block_frames: int = 256,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """wav [B, n_samples] → log-mel [B, n_frames, n_mels]; framing fused.

    v2 of :func:`logmel_pallas` (VERDICT r2 missing #4): the strided
    overlapping-frame gather moves INSIDE the kernel. The wav reshapes to
    hop-sized rows host-free ([B, n_rows, hop] is a view); the pipeline
    streams each block's F rows plus an overlapping 8-row tail (two
    in_specs on the same array), and the frame matmul runs directly on
    row-shifted VMEM views via ``frames @ CS = Σ_r x[r:F+r] @ CS_r`` — the
    [F, span] frame matrix never exists anywhere. The DFT/mel matmuls and
    log run as in v1. Requires frames to start on hop boundaries (true of
    this frontend: pads are applied before framing)."""
    assert wav.ndim == 2, "expect [batch, n_samples]"
    wav = preemphasize(wav.astype(jnp.float32), p.preemphasis)
    if p.center:
        pad = p.win_length // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")

    b, n_samples = wav.shape
    n_frames = 1 + (n_samples - p.win_length) // p.hop_length
    if n_frames <= 0:
        raise ValueError("signal shorter than one window")

    hop = p.hop_length
    rows_per_frame = -(-p.n_fft // hop)  # ceil: rows covering one frame span
    span = rows_per_frame * hop  # ≥ n_fft; DFT rows ≥ win_length are zero
    if rows_per_frame - 1 > 8:
        raise ValueError("fused kernel assumes n_fft/hop ≤ 9 (8-row tail)")
    if block_frames % 8:
        raise ValueError("block_frames must be a multiple of 8")
    n_blocks = -(-n_frames // block_frames)
    frames_pad = n_blocks * block_frames
    need = (frames_pad + 8) * hop  # + the 8-row tail block past the end
    if need >= n_samples:
        wav = jnp.pad(wav, ((0, 0), (0, need - n_samples)))
    else:
        # need < n_samples is possible when rows_per_frame == 9 and
        # n_frames lands exactly on a block boundary; every frame's window
        # still ends by (n_frames-1)*hop + span <= need, so the surplus
        # samples are unused — truncate instead of jnp.pad(negative)
        wav = wav[:, :need]
    wav_rows = wav.reshape(b, need // hop, hop)

    bins_pad = _round_up(p.n_bins, 128)
    mels_pad = _round_up(p.n_mels, 128)
    cs = np.zeros((span, 2 * bins_pad), np.float32)
    cs[: p.win_length, : p.n_bins] = p.dft_cos
    cs[: p.win_length, bins_pad : bins_pad + p.n_bins] = p.dft_sin
    melt = np.zeros((bins_pad, mels_pad), np.float32)
    melt[: p.n_bins, : p.n_mels] = p.mel_fb.T

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _mel_fused_kernel,
            log_offset=p.log_offset,
            n_bins_pad=bins_pad,
            block_frames=block_frames,
            rows_per_frame=rows_per_frame,
            precision=precision,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, frames_pad, mels_pad), jnp.float32
        ),
        grid=(b, n_blocks),
        in_specs=[
            # This block's F wav rows...
            pl.BlockSpec(
                (1, block_frames, hop),
                lambda bb, i: (bb, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # ...plus the NEXT 8 rows: a second (overlapping) view of the
            # same array, block-indexed in 8-row units. Together they cover
            # the rows_per_frame-1 rows of frame overlap into block i+1.
            pl.BlockSpec(
                (1, 8, hop),
                lambda bb, i, _f=block_frames: (bb, (i + 1) * _f // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (span, 2 * bins_pad),
                lambda bb, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bins_pad, mels_pad),
                lambda bb, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_frames, mels_pad),
            lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * frames_pad * span * bins_pad * 2
            + 2 * b * frames_pad * bins_pad * mels_pad,
            bytes_accessed=4
            * (
                b * need
                + 2 * span * bins_pad
                + bins_pad * mels_pad
                + b * frames_pad * mels_pad
            ),
            transcendentals=b * frames_pad * mels_pad,
        ),
    )(wav_rows, wav_rows, jnp.asarray(cs), jnp.asarray(melt))

    return out[:, :n_frames, : p.n_mels]
