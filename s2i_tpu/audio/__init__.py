"""L0 audio frontend: wav → log-mel/MFCC features (SURVEY.md §1 L0, §2 row 1).

The reference does this host-side with librosa inside its speech dataset
(``audio_encoder/dataset*.py``); here the hot path is a fused Pallas TPU
kernel (framing folded into windowed-DFT matmuls → power → mel projection →
log → normalize) with a pure-jnp reference path and a numpy oracle for
equivalence tests.
"""

from s2i_tpu.audio.frontend import (
    FrontendParams,
    frontend_params_from_cfg,
    frame_signal,
    logmel_jnp,
    mfcc_jnp,
    extract_features,
    crop_or_pad_frames,
    normalize_features,
)
from s2i_tpu.audio.filters import (
    mel_filterbank,
    windowed_dft_matrices,
    dct_matrix,
    hann_window,
)

__all__ = [
    "FrontendParams",
    "frontend_params_from_cfg",
    "frame_signal",
    "logmel_jnp",
    "mfcc_jnp",
    "extract_features",
    "crop_or_pad_frames",
    "normalize_features",
    "mel_filterbank",
    "windowed_dft_matrices",
    "dct_matrix",
    "hann_window",
]
