"""ONE-STEP TRAIN PARITY vs a torch reference trainer (SURVEY.md §3.3).

The strongest correctness evidence available while the reference mount is
empty: build the torch StackGAN-v2-lineage nets (tests/_torch_stackgan.py),
port their weights into the framework (s2i_tpu/port/stackgan_torch.py), run
ONE full GAN train step on BOTH sides with identical batch/noise/labels and
identical Adam hyperparameters, and require

  - every per-scale D loss, the G adversarial / KL / color terms, and the
    totals to agree to fp32 tolerance, and
  - the POST-STEP parameters (G, CA, every D) to agree leaf-for-leaf.

That certifies the whole gradient path — G forward (saved-VJP), D trunk +
dual heads, wrong-pair roll, stop_gradient placement, BN train-mode batch
statistics, optimizer wiring — not just the forward math the port tests
already pin.

Torch-side conventions mirrored from the reference lineage:
  - wrong pair: the reference rolls the *images* within the batch and pairs
    them with the in-place embeddings; rolling the *conditions* by +1 (what
    the framework does) produces the identical multiset of (image, wrong
    embedding) pairs, so the batch-mean BCE terms are equal exactly.
  - uncond wrong term: the wrong pair's image is real, so its uncond logit
    is the real image's (the framework aliases them; torch reuses the same
    forward's tensor — same doubled gradient).
  - KL: torch.mean over batch AND dims (reference KL_loss), see
    ca_net.kl_divergence.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from s2i_tpu import config  # noqa: E402
from s2i_tpu.train import gan  # noqa: E402
from s2i_tpu.train.gan import _per_example_normal  # noqa: E402
from s2i_tpu.port.stackgan_torch import (  # noqa: E402
    export_dnet,
    export_gnet,
    port_dnet,
    port_gnet,
)
from tests import _torch_stackgan as ts  # noqa: E402

B = 6
GF = 8
DF = 8
ZDIM = 8
CDIM = 16
TDIM = 32
RNUM = 2
BRANCH = 2
KL_COEFF = 2.0
UNCOND = 1.0
COLOR = 10.0
G_LR = 2e-4
D_LR = 2e-4
BETAS = (0.5, 0.999)


def _cfg():
    c = config.default_cfg()
    c.TREE.BRANCH_NUM = BRANCH
    c.GAN.GF_DIM = GF
    c.GAN.DF_DIM = DF
    c.GAN.Z_DIM = ZDIM
    c.GAN.EMBEDDING_DIM = CDIM
    c.GAN.R_NUM = RNUM
    c.TEXT.DIMENSION = TDIM
    c.TRAIN.BATCH_SIZE = B
    c.TRAIN.GENERATOR_LR = G_LR
    c.TRAIN.DISCRIMINATOR_LR = D_LR
    c.TRAIN.ADAM_BETA1 = BETAS[0]
    c.TRAIN.ADAM_BETA2 = BETAS[1]
    c.TRAIN.COEFF.KL = KL_COEFF
    c.TRAIN.COEFF.UNCOND_LOSS = UNCOND
    c.TRAIN.COEFF.COLOR_LOSS = COLOR
    c.DTYPE.COMPUTE = "float32"
    # plain formulation: the batching/s2d levers are proven equal-math by
    # their own invariance tests; parity mirrors the simple form
    c.GAN.D_TRUNK_BATCH = False
    c.GAN.S2D = False
    c.GAN.S2D_MID = False
    c.DATA.SHIP_SCALES = "all"
    c.DATA.IMAGE_DTYPE = "float32"
    return c


def _bce(logits, target):
    return F.binary_cross_entropy_with_logits(
        logits, torch.full_like(logits, target)
    )


def _color_loss(fakes):
    """Mirror of losses.color_consistency_loss on NCHW torch tensors."""
    stats = []
    for im in fakes:
        b, c3, h, w = im.shape
        x = im.reshape(b, c3, h * w)
        mu = x.mean(2)
        xc = x - mu[:, :, None]
        cov = torch.einsum("bcp,bdp->bcd", xc, xc) / (h * w - 1)
        stats.append((mu, cov))
    loss = fakes[0].new_zeros(())
    for (m1, c1), (m2, c2) in zip(stats[:-1], stats[1:]):
        loss = (
            loss
            + ((m1 - m2) ** 2).sum(-1).mean()
            + 5.0 * ((c1 - c2) ** 2).sum((-2, -1)).mean()
        )
    return loss


def _torch_step(g, ds, opt_g, opt_ds, imgs, emb, z, eps):
    """One reference-ordered train step; returns the loss scalars."""
    mu, logvar = g.ca_net.encode(emb)
    c = mu + eps * torch.exp(0.5 * logvar)
    fakes = g(z, c)
    mu_d = mu.detach()
    wrong = torch.roll(mu_d, 1, 0)

    d_losses = []
    for d, opt, real, fake in zip(ds, opt_ds, imgs, fakes):
        fake = fake.detach()
        cond_r, unc_r = d(real, mu_d)
        cond_w, _ = d(real, wrong)
        cond_f, unc_f = d(fake, mu_d)
        li = (
            _bce(cond_r, 1.0)
            + _bce(cond_w, 0.0)
            + _bce(cond_f, 0.0)
            + UNCOND * (_bce(unc_r, 1.0) + _bce(unc_r, 1.0) + _bce(unc_f, 0.0))
        )
        opt.zero_grad()
        li.backward()
        opt.step()
        d_losses.append(float(li))

    adv = fakes[0].new_zeros(())
    for d, fake in zip(ds, fakes):
        cond_f, unc_f = d(fake, mu)
        adv = adv + _bce(cond_f, 1.0) + UNCOND * _bce(unc_f, 1.0)
    kl = -0.5 * torch.mean(1.0 + logvar - mu.pow(2) - logvar.exp())
    color = _color_loss(fakes)
    total = adv + KL_COEFF * kl + COLOR * color
    opt_g.zero_grad()
    total.backward()
    opt_g.step()
    return {
        "d_losses": d_losses,
        "d_loss": sum(d_losses),
        "g_adv": float(adv),
        "kl": float(kl),
        "color": float(color),
        "g_loss": float(total),
    }


def _assert_tree_close(ours, theirs_sd, skip_running=True, atol=3e-5):
    """Compare an exported framework state_dict against a torch one."""
    for k, v in theirs_sd.items():
        if "num_batches_tracked" in k:
            continue
        if skip_running and ("running_mean" in k or "running_var" in k):
            continue
        got = ours[k]
        np.testing.assert_allclose(
            np.asarray(got),
            v.detach().numpy(),
            atol=atol,
            rtol=1e-4,
            err_msg=k,
        )


def test_one_step_parity_vs_torch_reference():
    torch.manual_seed(7)
    tg = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=BRANCH, r_num=RNUM)
    tds = [ts.D_NET64(DF, CDIM), ts.D_NET128(DF, CDIM)]

    cfg = _cfg()
    models = gan.build_models(cfg)

    rng = np.random.default_rng(3)
    imgs_np = [
        rng.uniform(-1, 1, size=(B, 64 * 2**i, 64 * 2**i, 3)).astype(
            np.float32
        )
        for i in range(BRANCH)
    ]
    emb_np = rng.normal(size=(B, TDIM)).astype(np.float32)
    batch = {
        "images": tuple(jnp.asarray(x) for x in imgs_np),
        "embedding": jnp.asarray(emb_np),
    }

    # --- port torch init into the framework train state ---
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    g_params, g_stats, _ = port_gnet(tg.state_dict())
    d_ported = [port_dnet(d.state_dict()) for d in tds]
    state = state.replace(
        g_params={"ca": g_params["ca"], "g": g_params["g"]},
        g_stats={"g": g_stats["g"]},
        d_params=tuple(p for p, _, _ in d_ported),
        d_stats=tuple(s for _, s, _ in d_ported),
    )

    # --- reproduce the jax step's internal noise draws for torch ---
    base_rng = jax.random.key(42)
    step_rng = jax.random.fold_in(base_rng, 0)
    rng_z, rng_ca = jax.random.split(step_rng)
    idx = jnp.arange(B)
    z_np = np.asarray(_per_example_normal(rng_z, idx, (ZDIM,)))
    eps_np = np.asarray(_per_example_normal(rng_ca, idx, (CDIM,)))

    # --- one framework step ---
    step_fn = jax.jit(gan.make_train_step(cfg, models))
    state2, mets = step_fn(state, batch, base_rng)
    mets = {k: float(v) for k, v in mets.items()}

    # --- one torch reference step on the identical inputs ---
    opt_g = torch.optim.Adam(tg.parameters(), lr=G_LR, betas=BETAS)
    opt_ds = [
        torch.optim.Adam(d.parameters(), lr=D_LR, betas=BETAS) for d in tds
    ]
    timgs = [
        torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()
        for x in imgs_np
    ]
    ref = _torch_step(
        tg,
        tds,
        opt_g,
        opt_ds,
        timgs,
        torch.from_numpy(emb_np),
        torch.from_numpy(z_np),
        torch.from_numpy(eps_np),
    )

    # --- losses agree ---
    for i in range(BRANCH):
        assert mets[f"d{i}_loss"] == pytest.approx(
            ref["d_losses"][i], rel=1e-4, abs=1e-5
        ), f"d{i}_loss"
    assert mets["d_loss"] == pytest.approx(ref["d_loss"], rel=1e-4)
    assert mets["g_adv"] == pytest.approx(ref["g_adv"], rel=1e-4)
    assert mets["kl"] == pytest.approx(ref["kl"], rel=1e-4, abs=1e-6)
    assert mets["color"] == pytest.approx(ref["color"], rel=1e-3, abs=1e-6)
    assert mets["g_loss"] == pytest.approx(ref["g_loss"], rel=1e-4)

    # --- post-step parameters agree leaf-for-leaf ---
    _assert_tree_close(
        export_gnet(state2.g_params, state2.g_stats), tg.state_dict()
    )
    for i, d in enumerate(tds):
        _assert_tree_close(
            export_dnet(state2.d_params[i], state2.d_stats[i]),
            d.state_dict(),
        )


def test_three_step_loss_trajectory_parity():
    """Three consecutive steps stay in lockstep — catches state-threading
    bugs (optimizer moments, BN stats reuse) a single step can't see."""
    torch.manual_seed(11)
    tg = ts.G_NET(GF, TDIM, CDIM, ZDIM, branch_num=1, r_num=RNUM)
    tds = [ts.D_NET64(DF, CDIM)]

    cfg = _cfg()
    cfg.TREE.BRANCH_NUM = 1
    cfg.TRAIN.COEFF.COLOR_LOSS = 0.0
    models = gan.build_models(cfg)

    rng = np.random.default_rng(5)
    imgs_np = [rng.uniform(-1, 1, size=(B, 64, 64, 3)).astype(np.float32)]
    emb_np = rng.normal(size=(B, TDIM)).astype(np.float32)
    batch = {
        "images": (jnp.asarray(imgs_np[0]),),
        "embedding": jnp.asarray(emb_np),
    }

    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    g_params, g_stats, _ = port_gnet(tg.state_dict())
    d_ported = [port_dnet(d.state_dict()) for d in tds]
    state = state.replace(
        g_params={"ca": g_params["ca"], "g": g_params["g"]},
        g_stats={"g": g_stats["g"]},
        d_params=tuple(p for p, _, _ in d_ported),
        d_stats=tuple(s for _, s, _ in d_ported),
    )

    base_rng = jax.random.key(9)
    step_fn = jax.jit(gan.make_train_step(cfg, models))

    opt_g = torch.optim.Adam(tg.parameters(), lr=G_LR, betas=BETAS)
    opt_ds = [
        torch.optim.Adam(d.parameters(), lr=D_LR, betas=BETAS) for d in tds
    ]
    timgs = [torch.from_numpy(imgs_np[0].transpose(0, 3, 1, 2)).contiguous()]
    temb = torch.from_numpy(emb_np)

    global COLOR
    color_saved = COLOR
    try:
        COLOR = 0.0
        for step in range(3):
            step_rng = jax.random.fold_in(base_rng, step)
            rng_z, rng_ca = jax.random.split(step_rng)
            idx = jnp.arange(B)
            z_np = np.asarray(_per_example_normal(rng_z, idx, (ZDIM,)))
            eps_np = np.asarray(_per_example_normal(rng_ca, idx, (CDIM,)))

            state, mets = step_fn(state, batch, base_rng)
            ref = _torch_step(
                tg,
                tds,
                opt_g,
                opt_ds,
                timgs,
                temb,
                torch.from_numpy(z_np),
                torch.from_numpy(eps_np),
            )
            assert float(mets["d_loss"]) == pytest.approx(
                ref["d_loss"], rel=2e-3
            ), f"step {step} d_loss"
            assert float(mets["g_loss"]) == pytest.approx(
                ref["g_loss"], rel=2e-3
            ), f"step {step} g_loss"
    finally:
        COLOR = color_saved
