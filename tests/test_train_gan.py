"""GAN train-step tests (SURVEY.md §4 "Integration"): one jitted step runs
and produces finite losses; a short run moves D toward separating real/fake;
joint mode threads encoder grads; EMA tracks G."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2i_tpu import config
from s2i_tpu.data import SyntheticGanDataset, SyntheticSpeechDataset
from s2i_tpu.train import gan


def tiny_cfg(branch_num=2, joint=False):
    c = config.default_cfg()
    c.TREE.BRANCH_NUM = branch_num
    c.GAN.GF_DIM = 8
    c.GAN.DF_DIM = 8
    c.GAN.Z_DIM = 16
    c.GAN.EMBEDDING_DIM = 16
    c.TEXT.DIMENSION = 32
    c.TRAIN.BATCH_SIZE = 8
    c.TRAIN.COEFF.COLOR_LOSS = 1.0
    c.DTYPE.COMPUTE = "float32"
    if joint:
        c.TRAIN.JOINT_FT = True
        c.TRAIN.COEFF.DISTILL = 1.0
        c.ENCODER.CONV_CHANNELS = [8, 16]
        c.ENCODER.RNN_HIDDEN = 16
        c.AUDIO.N_MELS = 8
        c.AUDIO.MAX_FRAMES = 32
    return c


def gan_batch(cfg, n=8):
    ds = SyntheticGanDataset(
        num_classes=4,
        examples_per_class=4,
        branch_num=int(cfg.TREE.BRANCH_NUM),
        emb_dim=int(cfg.TEXT.DIMENSION),
    )
    return ds, {
        k: v for k, v in ds.batch(np.arange(n)).items() if k != "class_id"
    }


def test_single_step_runs_and_is_finite():
    cfg = tiny_cfg()
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state2, mets = step(state, batch, jax.random.key(1))
    assert int(state2.step) == 1
    for k, v in mets.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # params actually moved
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_params, state2.g_params
    )
    assert max(jax.tree.leaves(delta)) > 0


def test_training_moves_d_toward_separation():
    cfg = tiny_cfg(branch_num=1)
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    mets = None
    for i, b in enumerate(ds.batches(8, 30)):
        b.pop("class_id")
        state, mets = step(state, b, jax.random.key(1))
    # After 30 steps on a tiny set, D should separate real from fake
    assert float(mets["d0_real_acc"]) > 0.6
    assert float(mets["d0_fake_acc"]) > 0.6
    assert np.isfinite(float(mets["g_loss"]))


def test_ema_tracks_g():
    cfg = tiny_cfg(branch_num=1)
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state2, _ = step(state, batch, jax.random.key(1))
    # EMA moved slightly toward new params but is not equal to them
    l0 = jax.tree.leaves(state.ema_g)[0]
    l2 = jax.tree.leaves(state2.ema_g)[0]
    lp = jax.tree.leaves({"ca": state2.g_params["ca"], "g": state2.g_params["g"]})[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l2))
    assert not np.allclose(np.asarray(l2), np.asarray(lp))


def test_ema_warmup_tracks_raw_then_averages():
    """TRAIN.EMA_WARMUP: while step < warmup the EMA copy IS the raw G
    (decay 0), afterwards Polyak engages — so an early-training sampler
    never sees the off-manifold average of cold-start params (see
    train/gan.py ema warmup comment / round-4 convergence cert)."""
    cfg = tiny_cfg(branch_num=1)
    cfg.TRAIN.EMA_WARMUP = 2
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))

    def assert_ema(state, matches_raw: bool):
        cur = {"ca": state.g_params["ca"], "g": state.g_params["g"]}
        same = all(
            np.array_equal(np.asarray(e), np.asarray(p))
            for e, p in zip(jax.tree.leaves(state.ema_g), jax.tree.leaves(cur))
        )
        assert same == matches_raw

    for i in range(2):  # updates at step=0,1 → still warmup
        state, _ = step(state, batch, jax.random.key(i))
        assert_ema(state, matches_raw=True)
    state, _ = step(state, batch, jax.random.key(9))  # update at step=2
    assert_ema(state, matches_raw=False)
    # and the post-warmup EMA is a tight average around the raw params,
    # not the init values: |ema - raw| must be ~(1-decay)·|update|, tiny
    d = max(
        float(jnp.abs(e - p).max())
        for e, p in zip(
            jax.tree.leaves(state.ema_g),
            jax.tree.leaves({"ca": state.g_params["ca"], "g": state.g_params["g"]}),
        )
    )
    assert 0 < d < 1e-2


def test_bn_recalc_restores_corrupted_stats():
    """gan.make_bn_recalc_fn: re-estimating G's BN running stats under the
    EMA weights must recover eval-mode behavior from arbitrarily wrong
    stats (the round-4 EMA-collapse diagnosis: Polyak weights with
    raw-trajectory stats emitted structure-free mean color while the raw
    G had FID 463 — docs/QUALITY.md). Property pinned here: with EMA ==
    raw params (warmup), eval-mode outputs under stats recalced FROM
    CORRUPTED values land back at the honest-running-stats outputs — the
    corrupt init is washed out (momentum 0.9^40 ≈ 1.5% residual) — while
    the corrupted stats themselves are far off (measured: corrupt 0.25
    mean-abs from honest, recalced 0.046)."""
    cfg = tiny_cfg(branch_num=1)
    cfg.TRAIN.EMA_WARMUP = 1000  # ema_g tracks raw exactly → known-good ref
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    for i in range(5):
        state, _ = step(state, batch, jax.random.key(i))

    params = state.ema_g
    emb = jnp.asarray(batch["embedding"])
    z = jax.random.normal(jax.random.key(7), (8, int(cfg.GAN.Z_DIM)))
    c, _, _ = models.ca.apply({"params": params["ca"]}, emb, train=False)

    def eval_out(stats):
        return models.g.apply(
            {"params": params["g"], "batch_stats": stats}, z, c, train=False
        )[-1]

    base = eval_out(state.g_stats["g"])  # honest running-stats outputs

    def dist(stats) -> float:
        return float(jnp.abs(eval_out(stats) - base).mean())

    corrupt = jax.tree.map(lambda x: x * 50.0 + 3.0, state.g_stats["g"])
    bad = state.replace(g_stats={**state.g_stats, "g": corrupt})
    recalc = jax.jit(gan.make_bn_recalc_fn(cfg, models, batches=40))
    fixed = recalc(bad, emb, jax.random.key(11))
    assert dist(fixed) < 0.3 * dist(corrupt), (dist(fixed), dist(corrupt))
    # deterministic: same rng → bitwise-identical stats
    again = recalc(bad, emb, jax.random.key(11))
    for a, b in zip(jax.tree.leaves(fixed), jax.tree.leaves(again)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_joint_mode_updates_encoder():
    cfg = tiny_cfg(branch_num=1, joint=True)
    models = gan.build_models(cfg, joint=True)
    assert models.encoder is not None
    gan_ds, batch = gan_batch(cfg)
    sp = SyntheticSpeechDataset(
        num_classes=4,
        examples_per_class=4,
        max_frames=int(cfg.AUDIO.MAX_FRAMES),
        n_mels=int(cfg.AUDIO.N_MELS),
        emb_dim=int(cfg.TEXT.DIMENSION),
    )
    sb = sp.batch(np.arange(8))
    batch = {**batch, "feats": sb["feats"], "feat_mask": sb["feat_mask"],
             "teacher": sb["teacher"]}
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    assert "enc" in state.g_params
    step = jax.jit(gan.make_train_step(cfg, models))
    state2, mets = step(state, batch, jax.random.key(1))
    assert "distill_mse" in mets and np.isfinite(float(mets["distill_mse"]))
    enc_delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.g_params["enc"],
        state2.g_params["enc"],
    )
    assert max(jax.tree.leaves(enc_delta)) > 0


def test_sample_fn_deterministic():
    cfg = tiny_cfg(branch_num=2)
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    sample = jax.jit(gan.make_sample_fn(cfg, models))
    emb = jnp.asarray(batch["embedding"])
    imgs1 = sample(state, emb, jax.random.key(7))
    imgs2 = sample(state, emb, jax.random.key(7))
    imgs3 = sample(state, emb, jax.random.key(8))
    assert len(imgs1) == 2 and imgs1[-1].shape == (8, 128, 128, 3)
    np.testing.assert_array_equal(np.asarray(imgs1[0]), np.asarray(imgs2[0]))
    assert not np.allclose(np.asarray(imgs1[0]), np.asarray(imgs3[0]))


def test_overfit_one_batch_stage1():
    """SURVEY.md §4 'overfit-one-batch': on a single repeated batch the GAN
    should drive D to near-perfect real/fake separation while G's samples
    drift toward the data's channel statistics."""
    cfg = tiny_cfg(branch_num=1)
    cfg.TRAIN.COEFF.COLOR_LOSS = 0.0
    models = gan.build_models(cfg)
    ds, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    sample = jax.jit(gan.make_sample_fn(cfg, models, use_ema=False))
    emb = jnp.asarray(batch["embedding"])

    real_mean = float(np.asarray(batch["images"][0]).mean())
    init_imgs = np.asarray(sample(state, emb, jax.random.key(5))[0])
    init_gap = abs(float(init_imgs.mean()) - real_mean)

    for _ in range(60):
        state, mets = step(state, batch, jax.random.key(1))

    assert float(mets["d0_real_acc"]) > 0.8
    assert float(mets["d0_fake_acc"]) > 0.8
    final_imgs = np.asarray(sample(state, emb, jax.random.key(5))[0])
    final_gap = abs(float(final_imgs.mean()) - real_mean)
    # G's global statistics should move toward the (single) real batch
    assert final_gap < init_gap + 0.05
    assert np.isfinite(final_imgs).all()


def test_training_improves_fixture_fid():
    """Convergence regression guard (SURVEY.md §4 'the training curves
    reproduce'; VERDICT r3 'Missing #1'): a short tiny-config run must
    REDUCE the Fréchet distance between generated and real samples. The
    on-chip convergence cert (scripts/quality_cert.py, docs/QUALITY.md)
    is the deep version with a fine-tuned Inception; here the features
    are 4x4 average-pooled pixels so the same ``eval.fid`` machinery runs
    in CPU-suite budget.

    Setup notes (measured trajectories, round 4): at this scale the
    recipe LR (2e-4) moves pooled-pixel FID only ~14% in 400 steps —
    within seed noise of the threshold — while lr=1e-3 drops it
    monotonically ~38% in 300 (2.86 -> 1.78). The LR is a test-budget
    acceleration, not the recipe. Conditional (per-class) structure does
    NOT emerge at this scale in any test budget, so this guards the
    unconditional distribution match only; the conditioning/KL math is
    pinned exactly by tests/test_train_parity.py instead."""
    from s2i_tpu.eval.fid import fid_from_stats, gaussian_stats

    cfg = tiny_cfg(branch_num=1)
    cfg.TRAIN.GENERATOR_LR = 1e-3
    cfg.TRAIN.DISCRIMINATOR_LR = 1e-3
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(
        num_classes=4,
        examples_per_class=8,
        branch_num=1,
        emb_dim=int(cfg.TEXT.DIMENSION),
        seed=3,
    )
    batch = {
        k: v for k, v in ds.batch(np.arange(32)).items() if k != "class_id"
    }
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    sample = jax.jit(gan.make_sample_fn(cfg, models, use_ema=False))
    emb = jnp.asarray(batch["embedding"])

    def pixel_features(imgs: np.ndarray) -> np.ndarray:
        # [N,64,64,3] in [-1,1] -> 4x4 average pool -> [N,48]
        x = np.asarray(imgs, np.float64)
        n = x.shape[0]
        x = x.reshape(n, 4, 16, 4, 16, 3).mean(axis=(2, 4))
        return x.reshape(n, -1)

    def fid_now(state) -> float:
        fakes = [
            np.asarray(sample(state, emb, jax.random.key(100 + s))[0])
            for s in range(4)
        ]
        fake_feats = pixel_features(np.concatenate(fakes))
        real_feats = pixel_features(np.asarray(batch["images"][0]))
        return fid_from_stats(
            *gaussian_stats(fake_feats), *gaussian_stats(real_feats)
        )

    fid0 = fid_now(state)
    for r in range(6):
        for b in ds.batches(8, 50, seed=1 + r):
            b.pop("class_id")
            state, mets = step(state, b, jax.random.key(2))
    fid1 = fid_now(state)
    assert np.isfinite(fid1)
    # measured 0.62x at 300 steps; 0.8 leaves seed/backend margin while
    # still requiring a decisive drop
    assert fid1 < 0.8 * fid0, f"FID did not improve: {fid0:.2f} -> {fid1:.2f}"


def test_wrong_pair_sources_avoid_class_collisions():
    """Class-aware wrong pairs: every chosen source has a different class
    whenever one exists in the batch (VERDICT r1 item 7)."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        cls = jnp.asarray(rng.integers(0, 4, size=12), jnp.int32)
        src = np.asarray(gan.wrong_pair_sources(cls))
        assert ((src - np.arange(12)) % 12 != 0).all()  # never self
        cls_np = np.asarray(cls)
        for j in range(12):
            if (cls_np != cls_np[j]).any():
                assert cls_np[src[j]] != cls_np[j], (trial, j, cls_np, src)


def test_wrong_pair_sources_all_same_class_falls_back_to_roll():
    cls = jnp.zeros((6,), jnp.int32)
    src = np.asarray(gan.wrong_pair_sources(cls))
    np.testing.assert_array_equal(src, (np.arange(6) - 1) % 6)


def test_class_aware_step_runs():
    """The jitted step accepts class_id and trains with WRONG_PAIR=class_aware."""
    cfg = tiny_cfg()
    cfg.TRAIN.WRONG_PAIR = "class_aware"
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = dict(ds.batch(np.arange(8)))
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state, mets = step(state, batch, jax.random.key(1))
    assert int(state.step) == 1
    for k, v in mets.items():
        assert np.isfinite(float(v)), k


def test_class_aware_without_class_id_raises():
    cfg = tiny_cfg()
    cfg.TRAIN.WRONG_PAIR = "class_aware"
    models = gan.build_models(cfg)
    ds = SyntheticGanDataset(branch_num=2, emb_dim=32)
    batch = {k: v for k, v in ds.batch(np.arange(8)).items() if k != "class_id"}
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    with pytest.raises(ValueError, match="class_id"):
        step(state, batch, jax.random.key(1))


def test_build_models_threads_upsample_mode():
    """cfg.GAN.UPSAMPLE_MODE reaches the generator (and REMAT composes):
    the four formulations share one param tree, so a checkpoint written
    under any mode restores under any other."""
    import jax.numpy as jnp

    from s2i_tpu import config
    from s2i_tpu.train import gan

    cfg = config.default_cfg()
    cfg.GAN.UPSAMPLE_MODE = "fused4"
    cfg.GAN.REMAT = True
    cfg.GAN.REMAT_POLICY = "conv"
    models = gan.build_models(cfg)
    assert models.g.up_mode == "fused4" and models.g.remat
    assert models.g.remat_policy == "conv"

    cfg2 = config.default_cfg()
    cfg2.GAN.UPSAMPLE_MODE = "transpose"
    g2 = gan.build_models(cfg2).g
    z = jnp.zeros((2, int(cfg.GAN.Z_DIM)))
    c = jnp.zeros((2, int(cfg.GAN.EMBEDDING_DIM)))
    import jax

    v1 = models.g.init(jax.random.key(0), z, c)
    v2 = g2.init(jax.random.key(0), z, c)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)


@pytest.mark.parametrize("s2d", [False, True])
def test_train_step_invariant_to_d_trunk_batch(s2d):
    """One full fp32 train step with GAN.D_TRUNK_BATCH on/off from the same
    init must produce the same params and metrics (GroupedBatchNorm makes the
    batched D dispatches mathematically identical to the sequential ones).

    s2d=False runs under Adam (the round-2 certified claim). s2d=True runs
    under SGD: the s2d phase-kernel contractions add fp32 reduction-reorder
    noise between the two dispatch graphs, which Adam's sign-like first step
    amplifies to ~lr scale (same rationale as test_train_step_invariant_to_s2d
    and tests/test_parallel.py). The Adam case's param atol sits at 5e-4
    (≈2·lr): under the orthogonal conv init (layers.conv_init) the larger
    activations push the fused-vs-sequential conv reduction reorder to the
    point where Adam occasionally flips ONE element's first-step direction
    (~1e-5 fraction of params at ≤2·lr each); a real segmentation bug
    (wrong BN stats per sub-batch) moves a large fraction of params and the
    loss metrics, which stay tightly checked."""
    outs = []
    for flag in (False, True):
        cfg = tiny_cfg()
        cfg.GAN.D_TRUNK_BATCH = flag
        cfg.GAN.S2D = s2d
        if s2d:
            cfg.TRAIN.OPTIMIZER = "sgd"
        models = gan.build_models(cfg)
        _, batch = gan_batch(cfg)
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        step = jax.jit(gan.make_train_step(cfg, models))
        state, metrics = step(state, batch, jax.random.key(1))
        outs.append((state, metrics))
    (s0, m0), (s1, m1) = outs
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=5e-4,
        ),
        (s0.g_params, s0.d_params),
        (s1.g_params, s1.d_params),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-5,
        ),
        m0,
        m1,
    )


def test_train_step_invariant_to_s2d():
    """One full fp32 train step with GAN.S2D on/off from the same init must
    produce the same params and metrics: the space-to-depth recode of the
    top scale (G up-block + to-RGB + D first conv + color loss) is exactly
    the interleaved math with a rearranged layout. SGD so the comparison is
    at fp32 reduction-noise level (Adam's sign-like first step amplifies
    the phase-conv reorder noise in near-zero grads to ±2·lr — same
    rationale as tests/test_parallel.py)."""
    outs = []
    for flag in (False, True):
        cfg = tiny_cfg(branch_num=3)
        cfg.TRAIN.OPTIMIZER = "sgd"
        cfg.GAN.S2D = flag
        models = gan.build_models(cfg)
        _, batch = gan_batch(cfg)
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        step = jax.jit(gan.make_train_step(cfg, models))
        state, metrics = step(state, batch, jax.random.key(1))
        outs.append((state, metrics))
    (s0, m0), (s1, m1) = outs
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=5e-5, atol=5e-5,
        ),
        (s0.g_params, s0.d_params, m0),
        (s1.g_params, s1.d_params, m1),
    )


def test_train_step_invariant_to_s2d_mid():
    """One full fp32 train step with GAN.S2D_MID (middle-scale s2d recode)
    — alone and stacked with GAN.S2D — equals the both-off step from the
    same init (same SGD rationale as the s2d test)."""
    outs = []
    for s2d, mid in ((False, False), (False, True), (True, True)):
        cfg = tiny_cfg(branch_num=3)
        cfg.TRAIN.OPTIMIZER = "sgd"
        cfg.GAN.S2D = s2d
        cfg.GAN.S2D_MID = mid
        models = gan.build_models(cfg)
        _, batch = gan_batch(cfg)
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        step = jax.jit(gan.make_train_step(cfg, models))
        state, metrics = step(state, batch, jax.random.key(1))
        outs.append((state, metrics))
    (s0, m0) = outs[0]
    for s1, m1 in outs[1:]:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-5, atol=5e-5,
            ),
            (s0.g_params, s0.d_params, m0),
            (s1.g_params, s1.d_params, m1),
        )


def test_s2d_mid_noop_with_two_branches():
    """GAN.S2D_MID with TREE.BRANCH_NUM=2 must be a structural no-op: a
    2-branch tree has no middle stage."""
    cfg = tiny_cfg(branch_num=2)
    cfg.GAN.S2D_MID = True
    assert not gan.s2d_mid_enabled(cfg)
    assert gan.s2d_scale_flags(cfg)[0] is False


def test_s2d_noop_with_single_branch():
    """GAN.S2D with TREE.BRANCH_NUM=1 must be a structural no-op: the only
    image comes from the init stage (no s2d formulation exists there), so
    the flag must not s2d the real pyramid or D's input mode — regression
    for the smoke-chain crash (s2d real concat'd with a standard fake in
    D's trunk-batch path)."""
    cfg = tiny_cfg(branch_num=1)
    cfg.GAN.S2D = True
    cfg.GAN.D_TRUNK_BATCH = True
    assert not gan.s2d_enabled(cfg)
    models = gan.build_models(cfg)
    _, batch = gan_batch(cfg)
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state, metrics = step(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_s2d_sampling_matches_normal():
    """GAN.S2D does not change the sampling path: same checkpoint, same
    images (standard layout) with the flag on or off."""
    cfg_n = tiny_cfg(branch_num=3)
    cfg_n.GAN.S2D = False  # pin: the "auto" default resolves ON at tiny batch
    cfg_s = tiny_cfg(branch_num=3)
    cfg_s.GAN.S2D = True
    cfg_s.GAN.S2D_MID = True
    models_n = gan.build_models(cfg_n)
    models_s = gan.build_models(cfg_s)
    _, batch = gan_batch(cfg_n)
    state = gan.init_state(cfg_n, models_n, jax.random.key(0), batch)
    emb = jnp.asarray(batch["embedding"])
    imgs_n = jax.jit(gan.make_sample_fn(cfg_n, models_n))(
        state, emb, jax.random.key(7)
    )
    imgs_s = jax.jit(gan.make_sample_fn(cfg_s, models_s))(
        state, emb, jax.random.key(7)
    )
    for a, b in zip(imgs_n, imgs_s):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


def test_scale_by_adam_cast_fp32_is_exact_adam():
    """_scale_by_adam_cast(dtype=float32) must be bitwise optax.adam — the
    bf16-moment mode differs from stock Adam ONLY by the storage rounding."""
    import optax
    from s2i_tpu.train.gan import _scale_by_adam_cast

    params = {
        "w": jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32),
        "b": jnp.zeros((8,), jnp.float32),
    }
    tx_ref = optax.adam(2e-4, b1=0.5, b2=0.999)
    tx_cast = optax.chain(
        _scale_by_adam_cast(0.5, 0.999, dtype=jnp.float32),
        optax.scale(-2e-4),
    )
    s_ref, s_cast = tx_ref.init(params), tx_cast.init(params)
    g = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).normal(size=p.shape), jnp.float32
        ),
        params,
    )
    for _ in range(3):
        u_ref, s_ref = tx_ref.update(g, s_ref, params)
        u_cast, s_cast = tx_cast.update(g, s_cast, params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            u_ref,
            u_cast,
        )


def test_moment_dtype_bf16_trains_and_tracks_fp32():
    """TRAIN.MOMENT_DTYPE=bfloat16 quality guard: the first step's param
    delta stays within bf16-moment rounding of the fp32 run, the moments of
    large leaves are actually stored in bf16, and a short training run
    remains finite."""
    first = {}
    for mdt in ("float32", "bfloat16"):
        cfg = tiny_cfg()
        cfg.TRAIN.MOMENT_DTYPE = mdt
        cfg.TRAIN.MOMENT_DTYPE_MIN_SIZE = 1024  # tiny model: catch convs
        models = gan.build_models(cfg)
        _, batch = gan_batch(cfg)
        state = gan.init_state(cfg, models, jax.random.key(0), batch)
        step = jax.jit(gan.make_train_step(cfg, models))
        for i in range(5):
            state, mets = step(state, batch, jax.random.key(1))
            if i == 0:
                first[mdt] = state
        for k, v in mets.items():
            assert np.isfinite(float(v)), f"{mdt}: {k} not finite"
        if mdt == "bfloat16":
            # bf16 moments exist where promised (large conv kernels)
            bf16_leaves = [
                x
                for x in jax.tree.leaves(state.d_opt)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
            ]
            assert bf16_leaves, "no bf16 moment leaves found"
    # First-step param delta within bf16-moment rounding of fp32 Adam
    # (~0.4% of an lr-sized update; later steps diverge chaotically through
    # the GAN dynamics, which is expected of ANY perturbation).
    for (path, a), b in zip(
        jax.tree.leaves_with_path(first["float32"].g_params),
        jax.tree.leaves(first["bfloat16"].g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_step_accepts_uint8_images():
    """DATA.IMAGE_DTYPE=uint8 batches normalize inside the jitted step
    (train + init): one step runs and is finite on raw [0,255] images."""
    cfg = tiny_cfg()
    models = gan.build_models(cfg)
    _, batch = gan_batch(cfg)
    batch["images"] = tuple(
        ((im + 1.0) * 127.5 + 0.5).clip(0, 255).astype(np.uint8)
        for im in batch["images"]
    )
    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    step = jax.jit(gan.make_train_step(cfg, models))
    state2, mets = step(state, batch, jax.random.key(1))
    assert int(state2.step) == 1
    for k, v in mets.items():
        assert np.isfinite(float(v)), f"{k} not finite"


@pytest.mark.parametrize(
    "desc,flags",
    [
        # the full production transfer/lever stack, in joint mode: uint8
        # top-scale-only batches, s2d + batched D dispatch, class-aware
        # wrong pairs, EMA on
        (
            "joint_production",
            dict(joint=True, s2d=True, dtb=True, uint8=True, ship_top=True,
                 class_aware=True),
        ),
        # EMA disabled while class-aware + s2d are on
        ("no_ema_class_aware", dict(ema_off=True, class_aware=True, s2d=True)),
        # stage-I (single-branch) joint finetune without EMA — s2d/ship-top
        # have no second scale to act on here
        ("joint_stage1_no_ema", dict(joint=True, branch=1, ema_off=True)),
        # bf16 compute stacked with the small-batch levers + uint8 transfer
        ("bf16_levers", dict(bf16=True, s2d=True, dtb=True, uint8=True)),
    ],
)
def test_flag_combination_smoke(desc, flags):
    """Interacting config flags, exercised TOGETHER: each lever has its own
    exact-math test above, but a user composes them (cfg/birds_joint_ft.yml
    + DATA.* defaults do exactly this) — one step must run, stay finite, and
    move the params under each realistic combination."""
    joint = flags.get("joint", False)
    cfg = tiny_cfg(branch_num=flags.get("branch", 2), joint=joint)
    cfg.GAN.S2D = flags.get("s2d", False)
    cfg.GAN.D_TRUNK_BATCH = flags.get("dtb", False)
    if flags.get("ema_off"):
        cfg.TRAIN.EMA_G = 0.0
    if flags.get("class_aware"):
        cfg.TRAIN.WRONG_PAIR = "class_aware"
    if flags.get("bf16"):
        cfg.DTYPE.COMPUTE = "bfloat16"

    models = gan.build_models(cfg, joint=joint)
    ds = SyntheticGanDataset(
        num_classes=4,
        examples_per_class=4,
        branch_num=int(cfg.TREE.BRANCH_NUM),
        emb_dim=int(cfg.TEXT.DIMENSION),
    )
    batch = dict(ds.batch(np.arange(8)))
    if not flags.get("class_aware"):
        batch.pop("class_id")
    if flags.get("uint8"):
        batch["images"] = tuple(
            ((im + 1.0) * 127.5 + 0.5).clip(0, 255).astype(np.uint8)
            for im in batch["images"]
        )
    if flags.get("ship_top"):
        batch["images"] = batch["images"][-1:]
    if joint:
        sp = SyntheticSpeechDataset(
            num_classes=4,
            examples_per_class=4,
            max_frames=int(cfg.AUDIO.MAX_FRAMES),
            n_mels=int(cfg.AUDIO.N_MELS),
            emb_dim=int(cfg.TEXT.DIMENSION),
        )
        sb = sp.batch(np.arange(8))
        batch.update(
            feats=sb["feats"], feat_mask=sb["feat_mask"], teacher=sb["teacher"]
        )

    state = gan.init_state(cfg, models, jax.random.key(0), batch)
    assert bool(state.ema_g) == (not flags.get("ema_off", False))
    step = jax.jit(gan.make_train_step(cfg, models))
    state2, mets = step(state, batch, jax.random.key(1))
    state3, mets3 = step(state2, batch, jax.random.key(1))
    assert int(state3.step) == 2
    for m in (mets, mets3):
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{desc}: {k} not finite"
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        state.g_params, state3.g_params,
    )
    assert max(jax.tree.leaves(delta)) > 0
    if joint:
        assert "distill_mse" in mets


def test_ship_top_only_matches_full_pyramid():
    """DATA.SHIP_SCALES=top: a batch carrying only the 256-scale produces the
    same step as the full host-side pyramid (the device's 2x area-pool is the
    same linear op the loaders apply)."""
    cfg = tiny_cfg()  # branch_num=2, float32
    models = gan.build_models(cfg)
    _, batch_full = gan_batch(cfg)
    batch_top = dict(batch_full, images=batch_full["images"][-1:])

    state0 = gan.init_state(cfg, models, jax.random.key(0), batch_full)
    step = jax.jit(gan.make_train_step(cfg, models))
    s_full, m_full = step(state0, batch_full, jax.random.key(1))
    s_top, m_top = step(state0, batch_top, jax.random.key(1))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-5,
        ),
        (s_full.g_params, m_full),
        (s_top.g_params, m_top),
    )
