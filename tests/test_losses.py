"""Loss-function unit tests: closed-form BCE values, wrong-pair direction,
color-consistency identities, distillation composition."""

import numpy as np
import jax.numpy as jnp
import pytest

from s2i_tpu.train import losses


def test_bce_logits_closed_form():
    # BCE(logit=0, target) = log 2 for either target
    assert float(losses.bce_logits(jnp.zeros(4), 1.0)) == pytest.approx(
        np.log(2.0), rel=1e-6
    )
    # large positive logit vs target 1 → ~0; vs target 0 → ~logit
    big = jnp.full(4, 20.0)
    assert float(losses.bce_logits(big, 1.0)) == pytest.approx(0.0, abs=1e-6)
    assert float(losses.bce_logits(big, 0.0)) == pytest.approx(20.0, rel=1e-4)


def test_discriminator_loss_prefers_correct_classification():
    good = jnp.full(8, 10.0)
    bad = -good
    # perfectly classifying D: real→+, wrong→−, fake→−
    loss_good, aux = losses.discriminator_loss(
        good, good, bad, good, bad, bad, uncond_coeff=1.0
    )
    # inverted D
    loss_bad, _ = losses.discriminator_loss(
        bad, bad, good, bad, good, good, uncond_coeff=1.0
    )
    assert float(loss_good) < 0.01
    assert float(loss_bad) > 10
    assert float(aux["real_acc"]) == 1.0 and float(aux["fake_acc"]) == 1.0


def test_discriminator_loss_uncond_only():
    logits = jnp.zeros(4)
    loss, _ = losses.discriminator_loss(
        None, logits, None, logits, None, logits, uncond_coeff=1.0
    )
    assert float(loss) == pytest.approx(3 * np.log(2.0), rel=1e-5)


def test_generator_adversarial_loss_direction():
    fooled = jnp.full(8, 10.0)  # D says "real" for fakes
    caught = -fooled
    assert float(
        losses.generator_adversarial_loss(fooled, fooled)
    ) < 0.01
    assert float(losses.generator_adversarial_loss(caught, caught)) > 10


def test_color_consistency_identities():
    rng = np.random.default_rng(0)
    img64 = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    # identical stats across stages (same image upsampled) → ~0
    img128 = jnp.repeat(jnp.repeat(img64, 2, axis=1), 2, axis=2)
    small = float(losses.color_consistency_loss([img64, img128]))
    assert small == pytest.approx(0.0, abs=1e-3)
    # channel-shifted stage → positive
    big = float(losses.color_consistency_loss([img64, img128 * 0.2 + 0.5]))
    assert big > 0.1
    # single stage → exactly 0
    assert float(losses.color_consistency_loss([img64])) == 0.0


def test_distillation_loss_composition():
    emb = jnp.ones((4, 8))
    teacher = jnp.zeros((4, 8))
    logits = jnp.asarray(np.eye(4, 5, dtype=np.float32) * 10)
    labels = jnp.arange(4)
    loss, mets = losses.distillation_loss(emb, teacher, logits, labels, 0.5)
    assert float(mets["mse"]) == pytest.approx(1.0, rel=1e-6)
    assert float(mets["cls_acc"]) == 1.0
    assert float(loss) == pytest.approx(
        1.0 + 0.5 * float(mets["ce"]), rel=1e-6
    )
    # ce_coeff=0 drops the head entirely
    loss2, mets2 = losses.distillation_loss(emb, teacher, logits, labels, 0.0)
    assert float(loss2) == pytest.approx(1.0, rel=1e-6)
    assert "ce" not in mets2
