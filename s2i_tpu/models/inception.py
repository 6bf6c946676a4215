"""Flax InceptionV3 for Inception-Score / FID (SURVEY.md §2 rows "Inception
Score"/"FID"; the reference uses StackGAN's fine-tuned Inception for IS and a
pytorch-fid-style pool3 feature extractor for FID).

The module mirrors torchvision's ``inception_v3`` block structure
(BasicConv2d = conv + BN(eps=1e-3) + ReLU; InceptionA/B/C/D/E) so that real
fine-tuned weights, once available as an external asset, port over by name
(`s2i_tpu.eval.weights.load_torch_inception`). Until then the metric plumbing
is exercised with random/stub weights (SURVEY.md §4 "Eval" strategy:
FID(X,X)=0, IS(uniform)=1 hold for any fixed weights).

Input: [B, 299, 299, 3] NHWC in [-1, 1]. Outputs: dict with
``pool3`` [B, 2048] features and ``logits`` [B, num_classes].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=1e-3,
            momentum=0.9,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


def _pad(k: int) -> tuple[tuple[int, int], tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


def avg_pool_same(x, window=3):
    return nn.avg_pool(
        x, (window, window), strides=(1, 1), padding=_pad(window)
    )


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), dtype=d, name="branch5x5_2")(
            b5, train
        )
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=d, name="branch3x3dbl_2")(
            b3, train
        )
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=d, name="branch3x3dbl_3")(
            b3, train
        )
        bp = avg_pool_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(
            bp, train
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(
            x, train
        )
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=d, name="branch3x3dbl_2")(
            bd, train
        )
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(
            bd, train
        )
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c7 = self.dtype, self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(
            b7, train
        )
        b7 = BasicConv2d(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(
            b7, train
        )
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(
            bd, train
        )
        bd = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(
            bd, train
        )
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(
            bd, train
        )
        bd = BasicConv2d(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(
            bd, train
        )
        bp = avg_pool_same(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(
            b3, train
        )
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=p17, dtype=d, name="branch7x7x3_2")(
            b7, train
        )
        b7 = BasicConv2d(192, (7, 1), padding=p71, dtype=d, name="branch7x7x3_3")(
            b7, train
        )
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(
            b7, train
        )
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=p13, dtype=d, name="branch3x3_2a")(
            b3, train
        )
        b3b = BasicConv2d(384, (3, 1), padding=p31, dtype=d, name="branch3x3_2b")(
            b3, train
        )
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3), dtype=d, name="branch3x3dbl_2")(
            bd, train
        )
        bda = BasicConv2d(384, (1, 3), padding=p13, dtype=d, name="branch3x3dbl_3a")(
            bd, train
        )
        bdb = BasicConv2d(384, (3, 1), padding=p31, dtype=d, name="branch3x3dbl_3b")(
            bd, train
        )
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = avg_pool_same(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns {'pool3': [B,2048], 'logits': [B,num_classes]}."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), (2, 2), dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), dtype=d, name="Conv2d_2b_3x3")(
            x, train
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, d, name="Mixed_5b")(x, train)
        x = InceptionA(64, d, name="Mixed_5c")(x, train)
        x = InceptionA(64, d, name="Mixed_5d")(x, train)
        x = InceptionB(d, name="Mixed_6a")(x, train)
        x = InceptionC(128, d, name="Mixed_6b")(x, train)
        x = InceptionC(160, d, name="Mixed_6c")(x, train)
        x = InceptionC(160, d, name="Mixed_6d")(x, train)
        x = InceptionC(192, d, name="Mixed_6e")(x, train)
        x = InceptionD(d, name="Mixed_7a")(x, train)
        x = InceptionE(d, name="Mixed_7b")(x, train)
        x = InceptionE(d, name="Mixed_7c")(x, train)
        pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 2048]
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(pool)
        return {"pool3": pool, "logits": logits}
