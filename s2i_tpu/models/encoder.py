"""Speech encoder (SURVEY.md §2 row "Speech encoder"; reference
``SpeechEncoder``/``AudioModels`` in ``audio_encoder/model*.py``): CNN over
the log-mel spectrogram (strided 1-D convs over time) → bi-GRU → masked
temporal pooling → FC → 1024-d embedding in the teacher (char-CNN-RNN) space.

TPU design (SURVEY.md §7 step 2 and hard-part 2):
  - The conv stack stride-downsamples the frame axis (e.g. ×8) *before* the
    recurrence, shrinking the sequential scan length — same trick the
    reference uses, and the main lever for GRU throughput on TPU.
  - The GRU input projections for all timesteps are one big batched matmul
    hoisted out of the scan; the ``lax.scan`` body only does the [B,H]×[H,3H]
    recurrent matmul, which XLA pipelines.
  - Padding frames are handled with a mask: the hidden state is carried
    through masked steps unchanged, so variable-length utterances batch into
    fixed shapes without affecting the result.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRULayer(nn.Module):
    """Single-direction GRU over time-major input with hoisted input proj.

    On TPU the recurrence runs as the fused Pallas kernel
    (s2i_tpu.ops.gru_kernel: weights + hidden state pinned in VMEM across the
    whole sequence, custom VJP); elsewhere — and when ``use_pallas=False`` —
    the mathematically identical ``lax.scan`` path runs.
    """

    hidden: int
    reverse: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool | None = None  # None = auto (pallas iff on TPU)

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        """x: [B, T, C], mask: [B, T] → outputs [B, T, hidden]."""
        from s2i_tpu.ops.gru_kernel import fused_gru, gru_scan_reference

        b, t, _ = x.shape
        h0 = jnp.zeros((b, self.hidden), dtype=jnp.float32)
        # One matmul for r/z/n input projections of every timestep.
        xw = nn.Dense(3 * self.hidden, dtype=self.dtype, name="input_proj")(x)
        xw = xw.astype(jnp.float32)
        w_h = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(column_axis=-1),
            (self.hidden, 3 * self.hidden),
            jnp.float32,
        )
        b_h = self.param(
            "recurrent_bias", nn.initializers.zeros, (3 * self.hidden,), jnp.float32
        )

        xw_t = jnp.moveaxis(xw, 1, 0)  # [T, B, 3H]
        mask_t = jnp.moveaxis(mask, 1, 0).astype(jnp.float32)
        if self.reverse:
            xw_t = jnp.flip(xw_t, axis=0)
            mask_t = jnp.flip(mask_t, axis=0)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        fn = fused_gru if use_pallas else gru_scan_reference
        ys = fn(xw_t, w_h, b_h, mask_t, h0)

        if self.reverse:
            ys = jnp.flip(ys, axis=0)
        return jnp.moveaxis(ys, 0, 1).astype(self.dtype)  # [B, T, H]


class BiGRU(nn.Module):
    hidden: int
    num_layers: int = 1
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            fwd = GRULayer(self.hidden, False, self.dtype, name=f"fwd{i}")(x, mask)
            if self.bidirectional:
                bwd = GRULayer(self.hidden, True, self.dtype, name=f"bwd{i}")(
                    x, mask
                )
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


class SpeechEncoder(nn.Module):
    """log-mel features [B, T, n_mels] (+ mask [B, T]) → embedding [B, emb_dim].

    Optionally also returns class logits (auxiliary CE head used during
    distillation pretraining, SURVEY.md §2 row "Distillation trainer" [?]).
    """

    emb_dim: int = 1024  # cfg.TEXT.DIMENSION
    conv_channels: tuple[int, ...] = (64, 128, 256)
    conv_kernel: int = 5
    conv_stride: int = 2
    # "SAME" (TPU-native default) or "torch": symmetric k//2 padding exactly
    # as torch Conv1d(padding=k//2). Output LENGTHS are identical for odd k
    # (both = floor((T-1)/s)+1), but SAME pads asymmetrically at even T so
    # the window ALIGNMENT differs — ported torch encoder checkpoints
    # (s2i_tpu/port/audio_encoder_torch.py) need "torch" to reproduce the
    # source model's outputs.
    conv_padding: str = "SAME"
    rnn_hidden: int = 512
    rnn_layers: int = 1
    bidirectional: bool = True
    pool: str = "mean_max"
    n_classes: int = 0  # 0 disables the class head
    norm_out: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None  # cross-device BN stat sync under shard_map

    @nn.compact
    def __call__(
        self, feats: jax.Array, mask: jax.Array | None = None, train: bool = True
    ):
        b, t, _ = feats.shape
        if mask is None:
            mask = jnp.ones((b, t), dtype=bool)
        # Zero padded frames so their (arbitrary) content cannot leak through
        # the conv receptive field or the BatchNorm statistics.
        x = feats.astype(self.dtype) * mask[:, :, None].astype(self.dtype)
        if self.conv_padding == "SAME":
            padding = "SAME"
        elif self.conv_padding == "torch":
            padding = [(self.conv_kernel // 2, self.conv_kernel // 2)]
        else:
            raise ValueError(f"unknown conv_padding {self.conv_padding!r}")
        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(
                ch,
                (self.conv_kernel,),
                strides=(self.conv_stride,),
                padding=padding,
                use_bias=False,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            # Downsample the mask with the same stride: a pooled step is
            # valid if its first source frame was valid.
            mask = mask[:, :: self.conv_stride][:, : x.shape[1]]

        x = BiGRU(
            self.rnn_hidden, self.rnn_layers, self.bidirectional, self.dtype
        )(x, mask)

        m = mask[:, :, None].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        nvalid = m.sum(axis=1)  # pre-clamp: 0 for an all-masked utterance
        denom = jnp.maximum(nvalid, 1.0)
        mean = (xf * m).sum(axis=1) / denom
        neg_inf = jnp.asarray(-1e30, jnp.float32)
        mx = jnp.where(m > 0, xf, neg_inf).max(axis=1)
        # guard on the UNclamped count (denom >= 1 always): an all-masked
        # row (wav shorter than one window, padding row in a partial batch)
        # must pool to 0, not -1e30
        mx = jnp.where(nvalid > 0, mx, 0.0)
        if self.pool == "mean":
            pooled = mean
        elif self.pool == "max":
            pooled = mx
        elif self.pool == "mean_max":
            pooled = jnp.concatenate([mean, mx], axis=-1)
        else:
            raise ValueError(f"unknown pool {self.pool!r}")

        emb = nn.Dense(self.emb_dim, dtype=jnp.float32, name="head")(pooled)
        if self.norm_out:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
        if self.n_classes:
            logits = nn.Dense(self.n_classes, dtype=jnp.float32, name="cls")(
                pooled
            )
            return emb, logits
        return emb
