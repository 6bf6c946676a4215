"""Multi-stage generator (SURVEY.md §2 row "Generator (multi-stage)";
reference ``G_NET``/``INIT_STAGE_G``/``NEXT_STAGE_G``/``GET_IMAGE_G`` in the
GAN's ``model.py``, StackGAN-v2 joint-generator topology).

One forward produces images at every scale (64 → 128 → 256 for
``branch_num=3``):

  init stage : [z ‖ c] → fc → BN → GLU → 4×4×(16·gf) map → 4 up-blocks → 64²×gf
  next stage : tile c over h×w, concat → 3×3 GLU block → R_NUM res-blocks
               → up-block (channels halve, resolution doubles)
  to-RGB     : 3×3 conv → tanh, one head per stage

All stages live in one Flax module so the whole multi-scale forward is a
single XLA program (the jitted train step differentiates through it once).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2i_tpu.models.layers import (
    dense_init,
    BatchNorm,
    Block3x3GLU,
    Conv3x3,
    ResBlockGLU,
    UpBlockGLU,
    glu,
)


class InitStageG(nn.Module):
    gf_dim: int  # channel count at the 4×4 map == 16 * cfg.GAN.GF_DIM
    dtype: Any = jnp.float32
    axis_name: str | None = None
    up_mode: str = "naive"

    @nn.compact
    def __call__(self, z: jax.Array, c: jax.Array, train: bool = True):
        ngf = self.gf_dim
        x = jnp.concatenate([z, c.astype(z.dtype)], axis=-1)
        x = nn.Dense(
            ngf * 4 * 4 * 2,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=dense_init,
        )(x)
        x = BatchNorm(self.dtype, self.axis_name)(x, train)
        x = glu(x)
        # NHWC layout choice: the fc output is interpreted as (h, w, c) —
        # torch reshapes to (c, h, w). Internal-only (no external generator
        # weights exist to port), consistent across train/sample/ckpt.
        x = x.reshape(x.shape[0], 4, 4, ngf)
        for i in range(4):  # 4×4 → 64×64
            x = UpBlockGLU(
                ngf // (2 ** (i + 1)),
                self.dtype,
                self.axis_name,
                self.up_mode,
            )(x, train)
        return x  # [B, 64, 64, ngf/16]


class NextStageG(nn.Module):
    gf_dim: int  # input channel count
    num_res: int = 2
    dtype: Any = jnp.float32
    axis_name: str | None = None
    up_mode: str = "naive"
    # GAN.S2D: the final up-block emits space-to-depth [B,H,W,4·ngf/2]
    # instead of [B,2H,2W,ngf/2] — same values, same params (layers.UpBlockGLU).
    s2d_out: bool = False

    @nn.compact
    def __call__(self, h: jax.Array, c: jax.Array, train: bool = True):
        ngf = self.gf_dim
        b, hh, ww, _ = h.shape
        c_tiled = jnp.broadcast_to(
            c[:, None, None, :], (b, hh, ww, c.shape[-1])
        ).astype(h.dtype)
        x = jnp.concatenate([h, c_tiled], axis=-1)
        x = Block3x3GLU(ngf, self.dtype, self.axis_name)(x, train)
        for _ in range(self.num_res):
            x = ResBlockGLU(ngf, self.dtype, self.axis_name)(x, train)
        x = UpBlockGLU(
            ngf // 2,
            self.dtype,
            self.axis_name,
            self.up_mode,
            s2d_out=self.s2d_out,
        )(x, train)
        return x  # [B, 2H, 2W, ngf/2] (or its s2d form)


class ToRGB(nn.Module):
    dtype: Any = jnp.float32
    # s2d=True: input AND output in space-to-depth layout ([B,H,W,12] image);
    # same conv kernel at the same param path (layers.Conv3x3 s2d mode).
    s2d: bool = False

    @nn.compact
    def __call__(self, h: jax.Array):
        img = Conv3x3(3, self.dtype, s2d=self.s2d)(h)
        return nn.tanh(img.astype(jnp.float32))


class GNet(nn.Module):
    """Joint multi-stage generator. Returns a list of images, one per stage,
    each [B, S, S, 3] in [-1, 1] with S = 64·2^i."""

    gf_dim: int = 64  # cfg.GAN.GF_DIM
    branch_num: int = 3  # cfg.TREE.BRANCH_NUM
    num_res: int = 2  # cfg.GAN.R_NUM
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # Rematerialize each stage in the backward pass (cfg.GAN.REMAT): trades
    # recompute FLOPs for HBM activation traffic — enables larger batches.
    remat: bool = False
    # cfg.GAN.REMAT_POLICY — what the remat'd stages may SAVE:
    #   "none": save nothing (classic full remat; +13% step FLOPs at b192,
    #           docs/PERF.md batch sweep — the convs recompute too);
    #   "conv": save conv/matmul outputs, recompute only the elementwise
    #           BN/GLU/upsample chains (cheap FLOPs; they are the bulk of the
    #           saved activations since each up-block holds 3 similar-size
    #           intermediates of which only the conv out survives).
    remat_policy: str = "none"
    # Upsample-conv formulation (cfg.GAN.UPSAMPLE_MODE, see UpConv3x3);
    # all modes are checkpoint-compatible with each other. "transpose"
    # measured fastest on v5e (docs/PERF.md A/B).
    up_mode: str = "transpose"
    # GAN.S2D: compute the TOP stage (the HBM-bound low-channel 2S×2S maps)
    # in space-to-depth layout — top up-block, BN/GLU, and to-RGB all run at
    # S×S×4C. Exact same math and parameter tree as the normal layout
    # (tests/test_models.py). The call's ``s2d_out`` chooses the top image's
    # layout: True returns its s2d form [B,S,S,12] (train step: D256 and the
    # color loss consume s2d directly, so the 2S×2S tensor never exists);
    # False applies one final depth_to_space (sampling path).
    s2d_top: bool = False
    # GAN.S2D_MID: same recode for the MIDDLE stages (0 < i < branch_num-1,
    # e.g. the 128² stage of a 3-branch tree): their up-block + to-RGB run in
    # s2d layout; one depth_to_space (a layout op, not a conv) restores the
    # interleaved feature map for the next stage's consumption. Independent
    # of ``s2d_top``; identical params either way.
    s2d_mid: bool = False

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        c: jax.Array,
        train: bool = True,
        s2d_out: bool = False,
    ) -> list[jax.Array]:
        from s2i_tpu.models.layers import depth_to_space

        init_cls, next_cls = InitStageG, NextStageG
        if self.remat:
            policy = None
            if self.remat_policy == "conv":
                # Saveable set = the MXU ops (convs + the init fc). Everything
                # else in a stage is elementwise/BN plumbing whose recompute
                # is nearly free next to a conv recompute.
                def policy(prim, *_, **__):  # noqa: ANN001
                    return prim.name in ("conv_general_dilated", "dot_general")

            elif self.remat_policy != "none":
                raise ValueError(
                    f"GAN.REMAT_POLICY must be 'none'|'conv', got "
                    f"{self.remat_policy!r}"
                )
            init_cls = nn.remat(InitStageG, static_argnums=(3,), policy=policy)
            next_cls = nn.remat(NextStageG, static_argnums=(3,), policy=policy)
        imgs = []
        h = init_cls(
            self.gf_dim * 16,
            self.dtype,
            self.axis_name,
            self.up_mode,
            name="init",
        )(z, c, train)
        imgs.append(ToRGB(self.dtype, name="to_rgb0")(h))
        ngf = self.gf_dim
        for i in range(1, self.branch_num):
            is_top = i == self.branch_num - 1
            is_s2d = (self.s2d_top and is_top) or (self.s2d_mid and not is_top)
            h = next_cls(
                ngf,
                self.num_res,
                self.dtype,
                self.axis_name,
                self.up_mode,
                is_s2d,
                name=f"next{i}",
            )(h, c, train)
            ngf //= 2
            img = ToRGB(self.dtype, s2d=is_s2d, name=f"to_rgb{i}")(h)
            if is_s2d and not s2d_out:
                img = depth_to_space(img)
            imgs.append(img)
            if is_s2d and not is_top:
                h = depth_to_space(h)  # next stage consumes interleaved
        return imgs
