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
    """KL(N(mu, sigma) || N(0, 1)) with the REFERENCE's normalization:
    the StackGAN-lineage ``KL_loss`` takes ``torch.mean`` of the per-element
    KL integrand over batch AND condition dims (not the textbook per-example
    dim-sum), so the effective weight of ``TRAIN.COEFF.KL`` is 1/c_dim of
    the dim-summed form. Matching this exactly matters: with c_dim=128 the
    dim-summed form is a 128x stronger regularizer, which collapses the CA
    posterior onto the prior and strips the conditioning signal (observed as
    a flat fixture-FID curve in the round-4 convergence cert)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.mean(kl)
