"""Shared building blocks for the GAN models (StackGAN-v2 lineage).

Functional contract per SURVEY.md §2 rows 6–8: GLU activations in G,
BatchNorm in G and D trunks, LeakyReLU(0.2) in D, nearest-neighbor ×2
upsampling + 3×3 conv in G, 4×4/stride-2 conv downsampling in D. All convs
NHWC; compute dtype is a parameter (bf16 for MXU throughput, params fp32).

Heads return raw logits (the reference applies sigmoid in-module and uses
BCELoss; logits + BCE-with-logits is the numerically stable equivalent and
fuses better under XLA).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# StackGAN-lineage init scheme (reference ``miscc/utils.py`` weights_init):
# convs ~ N(0, 0.02); BN scale ~ N(1, 0.02), bias 0; linears orthogonal.
# GAN training dynamics are sensitive to this, so we match it exactly.
conv_init = nn.initializers.normal(stddev=0.02)
dense_init = nn.initializers.orthogonal()


def bn_scale_init(key, shape, dtype=jnp.float32):
    import jax

    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Gated linear unit: split channels in half, gate with sigmoid."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * nn.sigmoid(b)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, 2H, 2W, C], nearest neighbor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Conv3x3(nn.Module):
    """3×3 'same' conv, no bias (BN follows in every use)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_init,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm wrapper: cross-device stat sync via ``axis_name`` so the
    data-parallel mesh sees global batch statistics (the reference's
    DataParallel computed per-GPU stats; syncing is strictly better and the
    single-device math is identical)."""

    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            scale_init=bn_scale_init,
        )(x)


class UpBlockGLU(nn.Module):
    """Nearest ×2 upsample → 3×3 conv(2·out) → BN → GLU  (G upsampling unit)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample_nearest_2x(x)
        x = Conv3x3(self.features * 2, self.dtype)(x)
        x = BatchNorm(self.dtype, self.axis_name)(x, train)
        return glu(x)


class Block3x3GLU(nn.Module):
    """3×3 conv(2·out) → BN → GLU (same-resolution G unit)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features * 2, self.dtype)(x)
        x = BatchNorm(self.dtype, self.axis_name)(x, train)
        return glu(x)


class ResBlockGLU(nn.Module):
    """G residual block: conv(2c)→BN→GLU→conv(c)→BN, additive skip."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        r = Conv3x3(self.features * 2, self.dtype)(x)
        r = BatchNorm(self.dtype, self.axis_name)(r, train)
        r = glu(r)
        r = Conv3x3(self.features, self.dtype)(r)
        r = BatchNorm(self.dtype, self.axis_name)(r, train)
        return x + r


class DownBlock(nn.Module):
    """D downsampling unit: 4×4 stride-2 conv → (BN) → LeakyReLU(0.2)."""

    features: int
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_init,
        )(x)
        if self.use_bn:
            x = BatchNorm(self.dtype, self.axis_name)(x, train)
        return nn.leaky_relu(x, 0.2)


class Block3x3LeakyReLU(nn.Module):
    """D same-resolution unit: 3×3 conv → BN → LeakyReLU(0.2)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features, self.dtype)(x)
        x = BatchNorm(self.dtype, self.axis_name)(x, train)
        return nn.leaky_relu(x, 0.2)
