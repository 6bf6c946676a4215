"""Per-scale discriminators (SURVEY.md §2 row "Discriminators ×3"; reference
``D_NET64/128/256`` + ``D_GET_LOGITS`` in the GAN's ``model.py``).

Each D has a *trunk* that downsamples its scale to a 4×4×(8·df) code and two
heads over that code:
  - conditional logit (embedding c tiled over 4×4, concat, 3×3 block, 4×4
    valid conv → scalar),
  - unconditional logit (4×4 valid conv → scalar).

Trunk and heads are separately callable (``method='train_logits'``) so the
train step runs the trunk ONCE per image batch and reuses the real-image code
for both the matched and wrong-pair conditional heads — the reference re-runs
the full D on the wrong pairs, one of three trunk passes we fuse away.

Raw logits out; the trainer uses BCE-with-logits (see layers.py docstring).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2i_tpu.models.layers import Block3x3LeakyReLU, DownBlock, conv_init


class _Trunk(nn.Module):
    """Downsample to a 4×4 × (8·df) code. ``extra_down`` adds the deeper
    pyramid used at 128 (1) and 256 (2) with the channel-resqueeze blocks."""

    df_dim: int
    extra_down: int = 0
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # GAN.S2D: the input image arrives in space-to-depth layout; the first
    # DownBlock consumes it via the rearranged-kernel conv (same params).
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        ndf = self.df_dim
        x = DownBlock(
            ndf, False, self.dtype, self.axis_name, s2d_in=self.s2d_in
        )(x, train, groups)
        x = DownBlock(ndf * 2, True, self.dtype, self.axis_name)(x, train, groups)
        x = DownBlock(ndf * 4, True, self.dtype, self.axis_name)(x, train, groups)
        x = DownBlock(ndf * 8, True, self.dtype, self.axis_name)(x, train, groups)
        ch = ndf * 8
        for _ in range(self.extra_down):
            ch *= 2
            x = DownBlock(ch, True, self.dtype, self.axis_name)(x, train, groups)
        while ch > ndf * 8:
            ch //= 2
            x = Block3x3LeakyReLU(ch, self.dtype, self.axis_name)(x, train, groups)
        return x  # [B, 4, 4, 8·ndf]


class _Heads(nn.Module):
    """Conditional + unconditional logit heads over the 4×4 code."""

    df_dim: int
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, code, c=None, train: bool = True, groups: int = 1):
        ndf = self.df_dim
        uncond = nn.Conv(
            1, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype,
            name="uncond_logit", kernel_init=conv_init,
        )(code)
        uncond = uncond.reshape(code.shape[0]).astype(jnp.float32)
        if not (self.b_condition and c is not None):
            return None, uncond
        b, h, w, _ = code.shape
        c_tiled = jnp.broadcast_to(
            c[:, None, None, :], (b, h, w, c.shape[-1])
        ).astype(code.dtype)
        x = jnp.concatenate([code, c_tiled], axis=-1)
        x = Block3x3LeakyReLU(ndf * 8, self.dtype, self.axis_name, name="joint")(
            x, train, groups
        )
        cond = nn.Conv(
            1, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype,
            name="cond_logit", kernel_init=conv_init,
        )(x)
        cond = cond.reshape(b).astype(jnp.float32)
        return cond, uncond


class DNetBase(nn.Module):
    """Shared D structure; ``EXTRA_DOWN`` picks the scale."""

    df_dim: int = 64
    ef_dim: int = 128
    b_condition: bool = True
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # Batch real|fake through ONE trunk dispatch (and the three condition
    # pairings through ONE heads dispatch) with per-segment BN statistics —
    # identical math to the sequential passes (GroupedBatchNorm), fewer and
    # better-utilized MXU kernels. Equivalence test in tests/test_models.py.
    trunk_batch: bool = False
    # GAN.S2D: this D's input image is space-to-depth (top scale only).
    s2d_in: bool = False

    EXTRA_DOWN: int = 0

    def setup(self):
        self.trunk = _Trunk(
            self.df_dim,
            self.EXTRA_DOWN,
            self.dtype,
            self.axis_name,
            self.s2d_in,
        )
        self.heads = _Heads(
            self.df_dim, self.b_condition, self.dtype, self.axis_name
        )

    def _check_c(self, c):
        # the conditional head infers its width from c at trace time, so a
        # cfg↔tensor mismatch would silently build a differently-shaped
        # head; fail fast against the declared ef_dim instead
        if c is not None and c.shape[-1] != self.ef_dim:
            raise ValueError(
                f"condition dim {c.shape[-1]} != ef_dim {self.ef_dim} "
                "(GAN.EMBEDDING_DIM)"
            )

    def __call__(self, img, c=None, train: bool = True):
        self._check_c(c)
        return self.heads(self.trunk(img, train), c, train)

    def train_logits(self, real, fake, c, c_wrong, train: bool = True):
        """All six logit groups for one D step with two trunk passes.

        Returns (cond_real, uncond_real, cond_wrong, uncond_wrong,
        cond_fake, uncond_fake); uncond_wrong aliases uncond_real because the
        wrong *pair* reuses the real image (reference pairs real images with
        shifted embeddings)."""
        self._check_c(c)
        self._check_c(c_wrong)
        if self.trunk_batch and self.b_condition and c is not None:
            b = real.shape[0]
            code2 = self.trunk(
                jnp.concatenate([real, fake], axis=0), train, groups=2
            )
            code3 = jnp.concatenate([code2[:b], code2], axis=0)
            c3 = jnp.concatenate([c, c_wrong, c], axis=0)
            cond3, uncond3 = self.heads(code3, c3, train, groups=3)
            return (
                cond3[:b],          # cond_real
                uncond3[:b],        # uncond_real
                cond3[b : 2 * b],   # cond_wrong
                uncond3[:b],        # uncond_wrong aliases uncond_real
                cond3[2 * b :],     # cond_fake
                uncond3[2 * b :],   # uncond_fake
            )
        code_real = self.trunk(real, train)
        code_fake = self.trunk(fake, train)
        cond_real, uncond_real = self.heads(code_real, c, train)
        cond_wrong, _ = self.heads(code_real, c_wrong, train)
        cond_fake, uncond_fake = self.heads(code_fake, c, train)
        return cond_real, uncond_real, cond_wrong, uncond_real, cond_fake, uncond_fake


class DNet64(DNetBase):
    EXTRA_DOWN: int = 0


class DNet128(DNetBase):
    EXTRA_DOWN: int = 1


class DNet256(DNetBase):
    EXTRA_DOWN: int = 2


_D_CLASSES = {64: DNet64, 128: DNet128, 256: DNet256}


def build_discriminators(
    branch_num: int,
    df_dim: int = 64,
    ef_dim: int = 128,
    b_condition: bool = True,
    dtype: Any = jnp.float32,
    axis_name: str | None = None,
    trunk_batch: bool = False,
    s2d_top: bool = False,
    s2d_mid: bool = False,
) -> list[nn.Module]:
    """One D per scale, smallest first (mirrors the reference's D list).
    ``s2d_top``: the LARGEST scale's D consumes its image in space-to-depth
    layout (GAN.S2D — the train step ships that scale s2d). ``s2d_mid``:
    same for the middle scales 0 < i < branch_num-1 (GAN.S2D_MID)."""
    return [
        _D_CLASSES[64 * 2**i](
            df_dim,
            ef_dim,
            b_condition,
            dtype,
            axis_name,
            trunk_batch,
            (s2d_top and i == branch_num - 1)
            or (s2d_mid and 0 < i < branch_num - 1),
        )
        for i in range(branch_num)
    ]
