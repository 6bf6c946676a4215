"""Conditioning Augmentation network (SURVEY.md §2 row "Conditioning
Augmentation"; reference ``CA_NET`` in the GAN's ``model.py``).

emb[1024] → fc(4·c_dim) → GLU → (μ, logσ²)[c_dim each] → reparameterized
sample c.  KL(N(μ,σ)‖N(0,1)) is computed by :func:`kl_divergence` and enters
the G loss with coefficient ``cfg.TRAIN.COEFF.KL`` (StackGAN default 2.0).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from s2i_tpu.models.layers import dense_init, glu


class CANet(nn.Module):
    c_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embedding: jax.Array,
        rng: jax.Array | None = None,
        train: bool = True,
        eps: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (c_code, mu, logvar).

        ``train=True`` needs a noise source: either ``rng`` (drawn here) or a
        pre-drawn ``eps`` of shape [B, c_dim]. The GAN step passes ``eps`` so
        the draw can be made per-example/sharding-invariant (the same global
        batch yields the same noise on any mesh size).
        """
        x = nn.Dense(
            self.c_dim * 4, dtype=self.dtype, kernel_init=dense_init
        )(embedding)
        x = glu(x)
        mu, logvar = x[..., : self.c_dim], x[..., self.c_dim :]
        if train:
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            if eps is None:
                if rng is None:
                    raise ValueError("CANet needs rng or eps when train=True")
                eps = jax.random.normal(rng, std.shape, dtype=jnp.float32)
            c = mu.astype(jnp.float32) + eps.astype(jnp.float32) * std
        else:
            c = mu.astype(jnp.float32)
        return c.astype(mu.dtype), mu, logvar


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Mean KL(N(mu, sigma) || N(0, 1)) over the batch (scalar, fp32)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=-1)
    return jnp.mean(kl)
