"""L0 audio-frontend tests: jnp path vs numpy oracle vs fused Pallas kernel.

The Pallas kernel runs in interpreter semantics on CPU (pallas supports CPU
lowering via interpret through the same API), giving bit-faithful coverage of
the kernel math without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2i_tpu.audio import (
    FrontendParams,
    frontend_params_from_cfg,
    logmel_jnp,
    mfcc_jnp,
    extract_features,
    crop_or_pad_frames,
    normalize_features,
    mel_filterbank,
)
from s2i_tpu.audio.oracle import logmel_numpy
from s2i_tpu import config


P_SMALL = FrontendParams(max_frames=64)


def _chirp(n, sr=16000, f0=200.0, f1=4000.0, seed=0):
    # Chirp + broadband noise floor: every mel bin carries energy, so the
    # log-domain comparison is well-conditioned in float32 (pure tones leave
    # near-zero bins where log() amplifies fp32 rounding noise).
    t = np.arange(n) / sr
    tone = np.sin(2 * np.pi * (f0 + (f1 - f0) * t / t[-1] / 2) * t)
    noise = 0.05 * np.random.default_rng(seed).standard_normal(n)
    return (tone + noise).astype(np.float32)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 512, 40, 0.0, 8000.0)
    assert fb.shape == (40, 257)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # HTK variant differs from Slaney
    fb_htk = mel_filterbank(16000, 512, 40, 0.0, 8000.0, htk=True, norm="none")
    assert not np.allclose(fb, fb_htk)


def test_logmel_jnp_matches_numpy_oracle():
    wav = _chirp(16000)  # 1 s
    got = np.asarray(logmel_jnp(jnp.asarray(wav)[None], P_SMALL))[0]
    want = logmel_numpy(wav, P_SMALL)
    assert got.shape == want.shape == (P_SMALL.num_frames(16000), 40)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_logmel_pallas_matches_jnp():
    from s2i_tpu.ops.mel_kernel import logmel_pallas

    wav = jnp.asarray(np.stack([_chirp(8000), _chirp(8000, f0=400.0)]))
    want = logmel_jnp(wav, P_SMALL)
    got = logmel_pallas(wav, P_SMALL)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_logmel_pallas_fused_matches_jnp():
    """v2 kernel (framing fused via in-kernel DMA of hop-sized wav rows)
    must equal the jnp path exactly like v1 — including on lengths that
    exercise the block/row padding, and with center padding on."""
    from s2i_tpu.ops.mel_kernel import logmel_pallas_fused

    for n in (8000, 8777):  # aligned + ragged tail
        wav = jnp.asarray(np.stack([_chirp(n), _chirp(n, f0=400.0)]))
        want = logmel_jnp(wav, P_SMALL)
        got = logmel_pallas_fused(wav, P_SMALL, block_frames=16)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )
    p_c = FrontendParams(max_frames=64, center=True)
    wav = jnp.asarray(_chirp(6000))[None]
    np.testing.assert_allclose(
        np.asarray(logmel_pallas_fused(wav, p_c, block_frames=16)),
        np.asarray(logmel_jnp(wav, p_c)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_extract_features_falls_back_on_exotic_geometry():
    """use_pallas=True with a frame geometry the fused kernel rejects
    (n_fft/hop > 9) must silently fall back to the jnp path — the kernel
    is the production default, so it may never hard-fail on valid cfgs."""
    from s2i_tpu.audio.frontend import extract_features

    p = FrontendParams(hop_length=32, max_frames=64)
    wav = jnp.asarray(_chirp(6000))[None]
    f_k, m_k = extract_features(wav, p, use_pallas=True)
    f_j, m_j = extract_features(wav, p, use_pallas=False)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_j), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_j))


def test_fused_kernel_compile_probe():
    """The auto-select path (use_pallas=None on TPU) probes whether the
    fused kernel LOWERS before embedding it — Mosaic rejections surface
    at the enclosing jit's compile, where extract_features' try/except
    can't reach. The probe must say no for geometries the kernel rejects,
    yes for the production geometry, and cache the verdict."""
    from s2i_tpu.audio import frontend

    wav = jnp.asarray(_chirp(6000))[None]
    bad = FrontendParams(hop_length=32, max_frames=64)  # n_fft/hop > 9
    assert not frontend._fused_kernel_compiles(wav.shape, wav.dtype, bad)
    good = FrontendParams(max_frames=64)
    assert frontend._fused_kernel_compiles(wav.shape, wav.dtype, good)
    assert (tuple(wav.shape), str(wav.dtype), good) in frontend._FUSED_PROBE


def test_fused_kernel_probe_does_not_cache_transient_failures(monkeypatch):
    """A relay outage at probe time (UNAVAILABLE / backend-init failure)
    must answer False for that call (jnp fallback keeps working) but NOT
    be cached — otherwise one transient error permanently demotes the
    production TPU frontend to the 1.59×-slower jnp path. Deterministic
    lowering rejections ARE cached."""
    from s2i_tpu.audio import frontend
    from s2i_tpu.ops import mel_kernel

    p = FrontendParams(max_frames=64)
    shape, dtype = (1, 6000), jnp.dtype(jnp.float32)
    key = (shape, str(dtype), p)
    frontend._FUSED_PROBE.pop(key, None)

    def boom(w, params):
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend"
        )

    monkeypatch.setattr(mel_kernel, "logmel_pallas_fused", boom)
    assert not frontend._fused_kernel_compiles(shape, dtype, p)
    assert key not in frontend._FUSED_PROBE  # transient: retried next call

    def mosaic_reject(w, params):
        raise RuntimeError("INTERNAL: Mosaic failed to compile TPU kernel")

    monkeypatch.setattr(mel_kernel, "logmel_pallas_fused", mosaic_reject)
    assert not frontend._fused_kernel_compiles(shape, dtype, p)
    assert frontend._FUSED_PROBE[key] is False  # deterministic: cached
    frontend._FUSED_PROBE.pop(key, None)  # leave real state for other tests


def test_mfcc_shapes():
    wav = jnp.asarray(_chirp(8000))[None]
    m = mfcc_jnp(wav, P_SMALL)
    assert m.shape == (1, P_SMALL.num_frames(8000), P_SMALL.n_mfcc)


def test_crop_pad_and_mask():
    x = jnp.ones((2, 10, 40))
    out, mask = crop_or_pad_frames(x, 16)
    assert out.shape == (2, 16, 40)
    assert bool(mask[:, :10].all()) and not bool(mask[:, 10:].any())
    out2, mask2 = crop_or_pad_frames(x, 8)
    assert out2.shape == (2, 8, 40) and bool(mask2.all())


def test_normalize_masked_stats():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(3.0, 2.0, (1, 20, 8)).astype(np.float32))
    mask = jnp.arange(20)[None, :] < 15
    y = normalize_features(x, mask)
    valid = np.asarray(y)[0, :15]
    assert abs(valid.mean()) < 1e-4
    assert abs(valid.std() - 1.0) < 1e-3
    assert np.all(np.asarray(y)[0, 15:] == 0.0)


def test_extract_features_end_to_end():
    p = FrontendParams(max_frames=128)
    wav = jnp.asarray(
        np.stack([_chirp(16000), np.pad(_chirp(12000), (0, 4000))])
    )
    feats, mask = extract_features(wav, p)
    assert feats.shape == (2, 128, 40)
    assert mask.shape == (2, 128)
    # normalized over valid frames
    assert abs(float(feats[0][np.asarray(mask[0])].mean())) < 1e-3


def test_frames_valid_mask_center_counts():
    """frames_valid_mask must agree with FrontendParams.num_frames in BOTH
    center modes: with center=True the signal is reflect-padded by win//2
    per side before framing, so the mask condition must use the padded
    length (regression: it used the raw wav_len, invalidating the last
    ~win/hop real frames of every utterance)."""
    from s2i_tpu.audio.frontend import frames_valid_mask

    for center in (False, True):
        p = FrontendParams(max_frames=64, center=center)
        for wav_len in (3200, 6399, 6400, 399):
            mask = frames_valid_mask(
                jnp.asarray([wav_len], jnp.int32), p, p.max_frames
            )
            got = int(np.asarray(mask).sum())
            want = min(p.num_frames(wav_len), p.max_frames)
            assert got == want, (center, wav_len, got, want)


def test_fused_kernel_exact_block_boundary_truncation():
    """rows_per_frame == 9 with n_frames an exact block multiple makes the
    kernel's padded sample budget SMALLER than the input (the 8-row tail
    already covers the last window) — this must truncate, not crash in
    jnp.pad with a negative width. Interpret mode on CPU; numerics vs jnp."""
    from s2i_tpu.ops.mel_kernel import logmel_pallas_fused

    p = FrontendParams(
        win_length=870, hop_length=100, n_fft=870, max_frames=256
    )
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, 26469)).astype(np.float32))
    # n_frames = 1 + (26469-870)//100 = 256; need = (256+8)*100 < 26469
    got = logmel_pallas_fused(wav, p)
    want = logmel_jnp(wav, p)
    assert got.shape[1] >= want.shape[1]
    np.testing.assert_allclose(
        np.asarray(got)[:, : want.shape[1]], np.asarray(want),
        rtol=1e-4, atol=1e-4,
    )


def test_frontend_params_from_cfg():
    c = config.default_cfg()
    p = frontend_params_from_cfg(c.AUDIO)
    assert p.win_length == 400 and p.hop_length == 160
    assert p.n_bins == 257 and p.n_features == 40
    c2 = config.cfg_from_string("AUDIO:\n  FEATURE: mfcc\n  N_MFCC: 13\n")
    p2 = frontend_params_from_cfg(c2.AUDIO)
    assert p2.n_features == 13


def test_frontend_rejects_window_longer_than_fft():
    """win_length > n_fft would silently time-alias the matmul-DFT (the
    np.fft oracle truncates instead — silently different features) and
    break the Pallas kernels' frame-row layout: must fail fast."""
    import pytest

    from s2i_tpu.audio.frontend import FrontendParams

    with pytest.raises(ValueError, match="win_length"):
        FrontendParams(win_length=640)  # 40 ms @ 16 kHz vs n_fft=512
