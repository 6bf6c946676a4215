"""Loss functions for the GAN and distillation trainers.

Functional contract (SURVEY.md §2 "GAN trainer", §3.3): per-scale D loss with
real / fake / wrong-pair terms over conditional + unconditional logit pairs;
G loss with per-stage adversarial terms + KL + optional color-consistency
regularizer across stages; distillation = MSE to teacher (+ aux class CE).

The reference applies sigmoid inside D and uses BCELoss; we keep raw logits
and use the stable log-sigmoid formulation (identical objective).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def bce_logits(logits: jax.Array, target: float) -> jax.Array:
    """Mean binary cross-entropy against a constant 0/1 target."""
    labels = jnp.full(logits.shape, target, dtype=jnp.float32)
    return optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), labels).mean()


def discriminator_loss(
    cond_real: jax.Array | None,
    uncond_real: jax.Array,
    cond_wrong: jax.Array | None,
    uncond_wrong: jax.Array,
    cond_fake: jax.Array | None,
    uncond_fake: jax.Array,
    uncond_coeff: float = 1.0,
) -> tuple[jax.Array, dict]:
    """One scale's D loss. ``wrong`` = real image paired with a mismatched
    embedding: conditional head → fake label, unconditional head → real label
    (the image itself is real)."""
    loss = 0.0
    if cond_real is not None:
        loss = bce_logits(cond_real, 1.0) + bce_logits(cond_wrong, 0.0)
        loss = loss + bce_logits(cond_fake, 0.0)
    if uncond_coeff > 0.0:
        loss = loss + uncond_coeff * (
            bce_logits(uncond_real, 1.0)
            + bce_logits(uncond_wrong, 1.0)
            + bce_logits(uncond_fake, 0.0)
        )
    aux = {
        "real_acc": jnp.mean((uncond_real > 0).astype(jnp.float32)),
        "fake_acc": jnp.mean((uncond_fake < 0).astype(jnp.float32)),
    }
    return loss, aux


def generator_adversarial_loss(
    cond_fake: jax.Array | None,
    uncond_fake: jax.Array,
    uncond_coeff: float = 1.0,
) -> jax.Array:
    """One scale's adversarial G term (non-saturating BCE toward 'real')."""
    loss = 0.0
    if cond_fake is not None:
        loss = bce_logits(cond_fake, 1.0)
    if uncond_coeff > 0.0:
        loss = loss + uncond_coeff * bce_logits(uncond_fake, 1.0)
    return loss


def _channel_stats(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-image channel mean [B,3] and covariance [B,3,3] over pixels."""
    b, h, w, c = img.shape
    x = img.reshape(b, h * w, c).astype(jnp.float32)
    mu = x.mean(axis=1)
    xc = x - mu[:, None, :]
    cov = jnp.einsum("bpc,bpd->bcd", xc, xc) / (h * w - 1)
    return mu, cov


def color_consistency_loss(
    imgs: list[jax.Array], lambda_mu: float = 1.0, lambda_cov: float = 5.0
) -> jax.Array:
    """StackGAN-v2 color-consistency regularizer between consecutive stages:
    match per-image channel means and covariances (coefficients per the
    StackGAN-v2 lineage; overall weight is cfg.TRAIN.COEFF.COLOR_LOSS)."""
    loss = jnp.asarray(0.0, jnp.float32)
    if len(imgs) < 2:
        return loss
    stats = [_channel_stats(i) for i in imgs]
    for (mu1, cov1), (mu2, cov2) in zip(stats[:-1], stats[1:]):
        loss = loss + lambda_mu * jnp.mean(
            jnp.sum(jnp.square(mu1 - mu2), axis=-1)
        ) + lambda_cov * jnp.mean(jnp.sum(jnp.square(cov1 - cov2), axis=(-2, -1)))
    return loss


def distillation_loss(
    emb: jax.Array,
    teacher: jax.Array,
    logits: jax.Array | None = None,
    labels: jax.Array | None = None,
    ce_coeff: float = 0.0,
) -> tuple[jax.Array, dict]:
    """Speech-encoder pretraining loss: MSE to the teacher embedding plus an
    optional auxiliary class cross-entropy (SURVEY.md §2 'Distillation
    trainer', §3.1)."""
    mse = jnp.mean(jnp.square(emb.astype(jnp.float32) - teacher.astype(jnp.float32)))
    metrics = {"mse": mse}
    loss = mse
    if ce_coeff > 0.0 and logits is not None and labels is not None:
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()
        loss = loss + ce_coeff * ce
        metrics["ce"] = ce
        metrics["cls_acc"] = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, metrics
