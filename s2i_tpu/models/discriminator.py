"""Per-scale discriminators (SURVEY.md §2 row "Discriminators ×3"; reference
``D_NET64/128/256`` + ``D_GET_LOGITS`` in the GAN's ``model.py``).

Each D downsamples its scale to a 4×4×(8·df) code, then produces:
  - a *conditional* logit (embedding c tiled over 4×4, concatenated, 3×3
    block, 4×4 valid conv → scalar), and
  - an *unconditional* logit (4×4 valid conv → scalar).

Raw logits out; the trainer uses BCE-with-logits (see layers.py docstring).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2i_tpu.models.layers import Block3x3LeakyReLU, DownBlock


class _Encode16(nn.Module):
    """Downsample ×16: s → s/16 spatial, 8·df channels (first block no BN)."""

    df_dim: int
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ndf = self.df_dim
        x = DownBlock(ndf, False, self.dtype, self.axis_name)(x, train)
        x = DownBlock(ndf * 2, True, self.dtype, self.axis_name)(x, train)
        x = DownBlock(ndf * 4, True, self.dtype, self.axis_name)(x, train)
        x = DownBlock(ndf * 8, True, self.dtype, self.axis_name)(x, train)
        return x


class _Logits(nn.Module):
    """Conditional + unconditional logit heads over the 4×4 code."""

    df_dim: int
    ef_dim: int
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, code, c=None, train: bool = True):
        ndf = self.df_dim
        uncond = nn.Conv(
            1, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype
        )(code)
        uncond = uncond.reshape(code.shape[0]).astype(jnp.float32)
        if not (self.b_condition and c is not None):
            return None, uncond
        b, h, w, _ = code.shape
        c_tiled = jnp.broadcast_to(
            c[:, None, None, :], (b, h, w, c.shape[-1])
        ).astype(code.dtype)
        x = jnp.concatenate([code, c_tiled], axis=-1)
        x = Block3x3LeakyReLU(ndf * 8, self.dtype, self.axis_name)(x, train)
        cond = nn.Conv(
            1, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype
        )(x)
        cond = cond.reshape(b).astype(jnp.float32)
        return cond, uncond


class DNet64(nn.Module):
    df_dim: int = 64
    ef_dim: int = 128
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, img, c=None, train: bool = True):
        code = _Encode16(self.df_dim, self.dtype, self.axis_name)(img, train)
        return _Logits(
            self.df_dim, self.ef_dim, self.b_condition, self.dtype, self.axis_name
        )(code, c, train)


class DNet128(nn.Module):
    df_dim: int = 64
    ef_dim: int = 128
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, img, c=None, train: bool = True):
        ndf = self.df_dim
        code = _Encode16(ndf, self.dtype, self.axis_name)(img, train)
        code = DownBlock(ndf * 16, True, self.dtype, self.axis_name)(code, train)
        code = Block3x3LeakyReLU(ndf * 8, self.dtype, self.axis_name)(code, train)
        return _Logits(
            ndf, self.ef_dim, self.b_condition, self.dtype, self.axis_name
        )(code, c, train)


class DNet256(nn.Module):
    df_dim: int = 64
    ef_dim: int = 128
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, img, c=None, train: bool = True):
        ndf = self.df_dim
        code = _Encode16(ndf, self.dtype, self.axis_name)(img, train)
        code = DownBlock(ndf * 16, True, self.dtype, self.axis_name)(code, train)
        code = DownBlock(ndf * 32, True, self.dtype, self.axis_name)(code, train)
        code = Block3x3LeakyReLU(ndf * 16, self.dtype, self.axis_name)(code, train)
        code = Block3x3LeakyReLU(ndf * 8, self.dtype, self.axis_name)(code, train)
        return _Logits(
            ndf, self.ef_dim, self.b_condition, self.dtype, self.axis_name
        )(code, c, train)


_D_CLASSES = {64: DNet64, 128: DNet128, 256: DNet256}


def build_discriminators(
    branch_num: int,
    df_dim: int = 64,
    ef_dim: int = 128,
    b_condition: bool = True,
    dtype: Any = jnp.float32,
    axis_name: str | None = None,
) -> list[nn.Module]:
    """One D per scale, smallest first (mirrors the reference's D list)."""
    return [
        _D_CLASSES[64 * 2**i](df_dim, ef_dim, b_condition, dtype, axis_name)
        for i in range(branch_num)
    ]
