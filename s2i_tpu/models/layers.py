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

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# StackGAN-v2-lineage init scheme (reference ``miscc/utils.py``
# weights_init, [?]-grade recall per SURVEY §0): convs AND linears
# orthogonal (gain 1); BN scale ~ N(1, 0.02), bias 0. The v1/DCGAN
# N(0, 0.02) conv init was used here through round 3; the round-4
# convergence cert showed the deep G's early gradients are much better
# conditioned under orthogonal, matching the v2 lineage.
conv_init = nn.initializers.orthogonal()
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


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 2H, 2W, C] → [B, H, W, 4C], phase-major channel layout:
    out[..., (2p+q)·C + c] = x[b, 2i+p, 2j+q, c].

    The s2d recoding of the 256² stages (GAN.S2D): the same pixels at a
    quarter of the spatial extent and 4× the channel depth — the lane/tile
    shape TPUs prefer for low-C high-resolution feature maps."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


# Phase-collapse matrices for the sub-pixel forms of UpConv3x3 (below).
# R_a maps the 3 kernel taps of output phase a onto its 2 source taps:
# output row 2i+a of conv3x3(nearest2x(x)) only ever reads source rows
# {i-1, i} (a=0, weights [W0, W1+W2]) or {i, i+1} (a=1, [W0+W1, W2]).
_PHASE_R = (
    ((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),  # a = 0
    ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)),  # a = 1
)
# The same collapse written as one interleaved 4-tap kernel for the
# lhs-dilated (transposed-conv) form: rows [W0, W0+W1, W1+W2, W2].
_PHASE_M4 = (
    (1.0, 0.0, 0.0),
    (1.0, 1.0, 0.0),
    (0.0, 1.0, 1.0),
    (0.0, 0.0, 1.0),
)


_UP_DN = ("NHWC", "HWIO", "NHWC")


def _upconv_t_raw(x, kt):
    """lhs-dilated (stride-2 transposed) conv with the 4×4 interleaved-phase
    kernel — the 'transpose' UpConv3x3 forward."""
    return jax.lax.conv_general_dilated(
        x,
        kt,
        (1, 1),
        ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=_UP_DN,
    )


@jax.custom_vjp
def _upconv_t(x, kt):
    """_upconv_t_raw with a hand-written input-gradient.

    XLA lowers autodiff's input-gradient of the lhs-dilated conv with a
    spatial ``reverse`` of the upstream 2H×2W gradient — ~100 MB of pure
    data movement per 256² up-block (profiled: reverse.5, docs/PERF.md).
    The same gradient is exactly a stride-2 conv with the REVERSED 4×4
    kernel (io-swapped), whose reverse is free. Weight gradient reuses
    autodiff's own lowering (it has no reverse)."""
    return _upconv_t_raw(x, kt)


def _upconv_t_fwd(x, kt):
    return _upconv_t_raw(x, kt), (x, kt)


def _upconv_t_bwd(res, g):
    x, kt = res
    k_rev = jnp.swapaxes(kt[::-1, ::-1], 2, 3)  # [4,4,co,ci]
    dx = jax.lax.conv_general_dilated(
        g,
        k_rev,
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=_UP_DN,
    )
    _, vjp_k = jax.vjp(lambda kk: _upconv_t_raw(x, kk), kt)
    (dkt,) = vjp_k(g)
    return dx, dkt


_upconv_t.defvjp(_upconv_t_fwd, _upconv_t_bwd)


class UpConv3x3(nn.Module):
    """3×3 'same' conv applied to the nearest-neighbor ×2 upsample of the
    input. Four mathematically identical formulations (``mode``), sharing one
    standard ``[3,3,C_in,C_out]`` kernel param — checkpoints are
    interchangeable and ``GAN.UPSAMPLE_MODE`` can be flipped on a run:

    - ``naive``:     materialize the 2H×2W upsample, one 3×3 conv (XLA often
                     fuses the broadcast into the conv input).
    - ``fused``:     sub-pixel phase decomposition as ONE 2×2 conv on the
                     1-padded source producing all 4 phases (4·C_out
                     channels), sliced + interleaved back to 2H×2W.
                     16 MACs/out-pixel·C_in vs the naive 36.
    - ``fused4``:    same math as ``fused`` but four separate 2×2 convs with
                     per-phase padding (no offset slices), then interleave.
    - ``transpose``: one lhs-dilated (stride-2 transposed) conv with the
                     4×4 interleaved-phase kernel — XLA picks the lowering.

    All tap sums happen in fp32 before the compute-dtype cast."""

    features: int
    dtype: Dtype = jnp.float32
    mode: str = "naive"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.features
        kernel = self.param(
            "kernel", conv_init, (3, 3, cin, cout), jnp.float32
        )
        dn = ("NHWC", "HWIO", "NHWC")
        b, h, w, _ = x.shape

        if self.mode == "naive":
            return jax.lax.conv_general_dilated(
                upsample_nearest_2x(x).astype(self.dtype),
                kernel.astype(self.dtype),
                (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=dn,
            )

        if self.mode in ("transpose", "transpose_cvjp"):
            m = jnp.asarray(_PHASE_M4, kernel.dtype)
            kt = jnp.einsum("rp,sq,pqio->rsio", m, m, kernel)
            op = _upconv_t if self.mode == "transpose_cvjp" else _upconv_t_raw
            return op(x.astype(self.dtype), kt.astype(self.dtype))

        rs = tuple(jnp.asarray(r, kernel.dtype) for r in _PHASE_R)
        phase_k = [
            jnp.einsum("up,vq,pqio->uvio", rs[a], rs[bb], kernel)
            for a in (0, 1)
            for bb in (0, 1)
        ]
        if self.mode == "s2d":
            # space-to-depth OUTPUT: the four sub-pixel phases stay stacked
            # along channels (phase-major — exactly space_to_depth of the
            # naive output) instead of being interleaved back to 2H×2W.
            # Skipping the interleave is the point: the consumer (BN/GLU/
            # to-RGB in s2d form) keeps working at H×W×4C.
            xc = x.astype(self.dtype)
            return jnp.concatenate(
                [
                    jax.lax.conv_general_dilated(
                        xc,
                        phase_k[2 * a + bb].astype(self.dtype),
                        (1, 1),
                        ((1 - a, a), (1 - bb, bb)),
                        dimension_numbers=dn,
                    )
                    for a in (0, 1)
                    for bb in (0, 1)
                ],
                axis=-1,
            )
        if self.mode == "fused":
            k4 = jnp.stack(phase_k, axis=-2).reshape(2, 2, cin, 4 * cout)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp.astype(self.dtype),
                k4.astype(self.dtype),
                (1, 1),
                "VALID",
                dimension_numbers=dn,
            )  # [b, h+1, w+1, 4*cout]; phase (a,b) lives at [:, a:a+h, b:b+w]
            y = y.reshape(b, h + 1, w + 1, 4, cout)
            phases = [
                y[:, a : a + h, bb : bb + w, 2 * a + bb]
                for a in (0, 1)
                for bb in (0, 1)
            ]
        elif self.mode == "fused4":
            xc = x.astype(self.dtype)
            phases = [
                jax.lax.conv_general_dilated(
                    xc,
                    phase_k[2 * a + bb].astype(self.dtype),
                    (1, 1),
                    ((1 - a, a), (1 - bb, bb)),
                    dimension_numbers=dn,
                )
                for a in (0, 1)
                for bb in (0, 1)
            ]
        else:
            raise ValueError(f"unknown UpConv3x3 mode {self.mode!r}")
        t = jnp.stack(
            [
                jnp.stack([phases[2 * a + bb] for bb in (0, 1)], axis=3)
                for a in (0, 1)
            ],
            axis=2,
        )  # t[n, i, a, j, b, c] = phase (a,b) at source (i, j)
        return t.reshape(b, 2 * h, 2 * w, cout)


def _phase_select(n_src: int, n_k: int, shift: int) -> jnp.ndarray:
    """Selection tensor S[s,u,d] = 1 iff d == 2s + u + shift (0 ≤ d < n_k):
    maps an interleaved-domain kernel tap d onto (source-tap s, phase u) of
    the space-to-depth domain. Out-of-range combinations are zero taps."""
    import numpy as np

    s = np.arange(n_src)[:, None, None]
    u = np.arange(2)[None, :, None]
    d = np.arange(n_k)[None, None, :]
    return jnp.asarray((d == 2 * s + u + shift).astype(np.float32))


class S2DConv(nn.Module):
    """Drop-in for the ``nn.Conv`` inside :class:`Conv3x3` / :class:`DownBlock`
    when the input arrives in space-to-depth layout. Holds the IDENTICAL
    ``[kh,kw,Cin,Cout]`` kernel param (same name, shape, init — checkpoints
    interchange freely with the normal mode) and convolves with the
    zero-expanded rearranged kernel over the s2d grid. Exact same math as
    the interleaved-domain conv (equivalence tests in tests/test_models.py);
    the zero taps cost extra MACs (≤2.25×) on convs that are a fraction of a
    percent of the step — the point is never touching the 2H×2W layout.

    mode 'down4x4':   4×4 stride-2 pad-1 conv on the interleaved 2H×2W image
                      ⇔ 3×3 stride-1 pad-1 conv on [B,H,W,4C], std output.
    mode 'same3x3':   3×3 stride-1 SAME conv, s2d input AND s2d output.
    """

    features: int
    mode: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 4
        kh = 4 if self.mode == "down4x4" else 3
        kernel = self.param(
            "kernel", conv_init, (kh, kh, cin, self.features), jnp.float32
        )
        if self.mode == "down4x4":
            m = _phase_select(3, 4, -1)
            k = jnp.einsum("sud,tve,deio->stuvio", m, m, kernel)
            k = k.reshape(3, 3, 4 * cin, self.features)
        elif self.mode == "same3x3":
            a = jnp.stack([_phase_select(3, 3, -1 - p) for p in (0, 1)])
            k = jnp.einsum("psud,qtve,deio->stuvipqo", a, a, kernel)
            k = k.reshape(3, 3, 4 * cin, 4 * self.features)
        else:
            raise ValueError(f"unknown S2DConv mode {self.mode!r}")
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=_UP_DN,
        )


class Conv3x3(nn.Module):
    """3×3 'same' conv, no bias (BN follows in every use).

    ``s2d=True``: the input is space-to-depth [B,H,W,4C] and the output stays
    s2d — same kernel param at the same path (see S2DConv)."""

    features: int
    dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            return S2DConv(self.features, "same3x3", self.dtype, name="Conv_0")(x)
        return nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv_init,
        )(x)


class GroupedBatchNorm(nn.Module):
    """BatchNorm with flax's ``nn.BatchNorm`` semantics replicated exactly
    (fp32 fast-variance stats, clipped var, stacked-pmean ``axis_name`` sync,
    momentum running averages; equality test in tests/test_models.py) plus a
    ``groups`` call argument: the leading batch axis splits into ``groups``
    equal segments that each get their OWN batch statistics — exactly as if
    the segments were normalized by separate sequential calls. This lets the
    D trunk run real|fake (and the heads the three condition pairings)
    through ONE conv dispatch at G·B batch without changing the math;
    running averages fold sequentially in segment order, matching the
    unbatched call order. Variable names/shapes match ``nn.BatchNorm`` so
    checkpoints are interchangeable."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool, groups: int = 1):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        scale = self.param("scale", bn_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (x - mean) * mul + bias
            return jnp.asarray(y, self.dtype or y.dtype)

        if x.shape[0] % groups:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by groups={groups}"
            )
        xg = x.reshape(groups, -1, *x.shape[1:])
        xf = xg.astype(jnp.promote_types(x.dtype, jnp.float32))
        axes = tuple(range(1, xf.ndim - 1))  # per-group batch+spatial
        mu = xf.mean(axes)  # [G, C]
        mu2 = (xf * xf).mean(axes)
        if self.axis_name is not None and not self.is_initializing():
            mu, mu2 = jax.lax.pmean(jnp.stack([mu, mu2]), self.axis_name)
        var = jnp.maximum(0.0, mu2 - mu * mu)

        if not self.is_initializing():
            m, v = ra_mean.value, ra_var.value
            for g in range(groups):
                m = self.momentum * m + (1.0 - self.momentum) * mu[g]
                v = self.momentum * v + (1.0 - self.momentum) * var[g]
            ra_mean.value, ra_var.value = m, v

        shp = (groups,) + (1,) * (xg.ndim - 2) + (c,)
        mul = jax.lax.rsqrt(var + self.epsilon).reshape(shp) * scale
        y = (xg - mu.reshape(shp)) * mul + bias
        return jnp.asarray(y.reshape(x.shape), self.dtype or y.dtype)


class BatchNorm(nn.Module):
    """BatchNorm wrapper: cross-device stat sync via ``axis_name`` so the
    data-parallel mesh sees global batch statistics (the reference's
    DataParallel computed per-GPU stats; syncing is strictly better and the
    single-device math is identical). ``groups`` (see GroupedBatchNorm) keeps
    per-segment statistics when disjoint sub-batches share one dispatch."""

    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, groups: int = 1):
        return GroupedBatchNorm(
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="BatchNorm_0",
        )(x, use_running_average=not train, groups=groups)


class UpBlockGLU(nn.Module):
    """Nearest ×2 upsample → 3×3 conv(2·out) → BN → GLU  (G upsampling unit).
    ``mode`` selects the upsample-conv formulation (see UpConv3x3); all
    settings share the same parameter tree.

    ``s2d_out=True`` (GAN.S2D): the whole block runs in space-to-depth
    layout and returns [B,H,W,4·features] = space_to_depth of the normal
    [B,2H,2W,features] output — exactly, including BN statistics: per-channel
    stats pool over the four phase positions via a phase→width fold (BN is
    permutation-invariant over non-channel positions), and GLU splits within
    each phase block. Same parameter tree as the normal mode."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    mode: str = "naive"
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not self.s2d_out:
            x = UpConv3x3(self.features * 2, self.dtype, self.mode)(x)
            x = BatchNorm(self.dtype, self.axis_name)(x, train)
            return glu(x)
        c2 = self.features * 2
        y = UpConv3x3(c2, self.dtype, "s2d")(x)  # [B,H,W,4·2f] phase-major
        b, h, w, _ = y.shape
        y = BatchNorm(self.dtype, self.axis_name)(
            y.reshape(b, h, w * 4, c2), train
        ).reshape(b, h, w, 4, c2)
        a_, g_ = jnp.split(y, 2, axis=-1)  # GLU within each phase block
        return (a_ * nn.sigmoid(g_)).reshape(b, h, w, 4 * self.features)


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
    """D downsampling unit: 4×4 stride-2 conv → (BN) → LeakyReLU(0.2).

    ``s2d_in=True`` (GAN.S2D): the input arrives as space_to_depth of the
    2H×2W image; the same kernel param applies via the rearranged-kernel
    conv (S2DConv 'down4x4') — identical math and output shape."""

    features: int
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        if self.s2d_in:
            x = S2DConv(self.features, "down4x4", self.dtype, name="Conv_0")(x)
        else:
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
            x = BatchNorm(self.dtype, self.axis_name)(x, train, groups)
        return nn.leaky_relu(x, 0.2)


class Block3x3LeakyReLU(nn.Module):
    """D same-resolution unit: 3×3 conv → BN → LeakyReLU(0.2)."""

    features: int
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        x = Conv3x3(self.features, self.dtype)(x)
        x = BatchNorm(self.dtype, self.axis_name)(x, train, groups)
        return nn.leaky_relu(x, 0.2)
