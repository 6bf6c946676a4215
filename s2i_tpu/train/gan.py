"""Alternating G/D conditional-GAN training as ONE jitted XLA program per
step (reference: ``condGANTrainer.train`` in ``trainer.py``, SURVEY.md §3.3;
TPU design per §7 step 4 and hard-part 1).

Step semantics (matching the reference's order):
  1. sample z and the CA condition once,
  2. generate the multi-scale fakes with the current G,
  3. update every D against (real, wrong-pair, stop-gradient(fake)) — the
     three D parameter sets are disjoint, so one value_and_grad over the
     tuple yields all per-D gradients in a single backward,
  4. update G (+CA, + speech encoder in joint mode) against the *updated*
     Ds: per-stage adversarial terms + KL + optional color consistency
     (+ distillation regularizer in joint mode),
  5. Polyak-average G params (StackGAN-v2's avg_param_G).

RNG threading: the caller passes one base key; the step folds in the step
counter, so resuming from a checkpoint reproduces the stream.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from s2i_tpu.models import CANet, GNet, SpeechEncoder, build_discriminators
from s2i_tpu.models.ca_net import kl_divergence
from s2i_tpu.train import losses


class GanModels(NamedTuple):
    ca: CANet
    g: GNet
    ds: tuple
    encoder: SpeechEncoder | None = None  # set in joint-finetune mode


# "auto" crossover thresholds (single-chip A/Bs, docs/PERF.md): the lever
# wins only while the PER-DEVICE kernels are under-full.
S2D_ON_BELOW = 32
D_TRUNK_ON_BELOW = 96


def _lever_value(value, what: str):
    """Validate a tri-state lever: bool | "auto" (case-insensitive).
    Any other string is a config typo ("enabled", "aut0", "auto ") that
    bool() would silently pin ON — raise instead."""
    if isinstance(value, str):
        if value.lower() == "auto":
            return "auto"
        raise ValueError(
            f"GAN.{what} must be a bool or 'auto', got {value!r}"
        )
    return bool(value)


def _resolve_lever(value, cfg, on_below: int, what: str) -> bool:
    """Resolve a tri-state perf lever ("auto" | bool): "auto" turns the
    lever on when TRAIN.BATCH_SIZE < `on_below` — the on-chip A/Bs
    (docs/PERF.md) show these formulations win only while the per-step
    kernels are under-full; past the crossover batch they lose.

    NOTE: this reads the batch size in `cfg` as the per-device batch. The
    mesh entry points (`GanTrainer`, `parallel.mesh.make_parallel_*`,
    `dryrun_multichip`) all call `resolve_perf_levers(cfg, n_devices)`
    before building, freezing the "auto" levers from BATCH_SIZE/n_devices
    (what each chip's kernels actually see) — so single-device resolution
    here only ever applies to genuinely single-device builds."""
    value = _lever_value(value, what)
    if value == "auto":
        return int(cfg.TRAIN.BATCH_SIZE) < on_below
    return value


def resolve_perf_levers(cfg, n_devices: int = 1) -> None:
    """Freeze the tri-state perf levers into booleans IN PLACE using the
    per-device batch (global TRAIN.BATCH_SIZE // n_devices). The crossover
    thresholds come from single-chip A/Bs, so on a data mesh the batch each
    device runs — not the global batch — decides whether the under-full
    formulations (S2D, D_TRUNK_BATCH) pay: an 8-chip b96 run executes b12
    kernels per chip and wants both levers ON."""
    per_dev = max(1, int(cfg.TRAIN.BATCH_SIZE) // max(1, int(n_devices)))
    for key, on_below in (
        ("S2D", S2D_ON_BELOW),
        ("D_TRUNK_BATCH", D_TRUNK_ON_BELOW),
    ):
        v = _lever_value(getattr(cfg.GAN, key, False), key)
        cfg.GAN[key] = per_dev < on_below if v == "auto" else v
    v = _lever_value(getattr(cfg.GAN, "S2D_MID", False), "S2D_MID")
    # S2D_MID measured a loss at every batch (docs/PERF.md): "auto" = off.
    cfg.GAN["S2D_MID"] = False if v == "auto" else v


def s2d_enabled(cfg) -> bool:
    """GAN.S2D is a top-*scale* recode: it targets the HBM-bound low-channel
    maps of the LAST up-stage (generator `next{i}`/`to_rgb{i}`, i≥1). With
    TREE.BRANCH_NUM=1 the only image comes from the init stage, which has no
    s2d formulation — the flag is a structural no-op there, so gate it off
    everywhere consistently (G, Ds, real-pyramid recode). "auto" (default)
    enables it below batch 32: measured +8.9% at b24, −7.8% at b48."""
    on = _resolve_lever(
        getattr(cfg.GAN, "S2D", False), cfg, S2D_ON_BELOW, "S2D"
    )
    return on and int(cfg.TREE.BRANCH_NUM) > 1


def d_trunk_batch_enabled(cfg) -> bool:
    """GAN.D_TRUNK_BATCH tri-state ("auto" resolves on below batch 96:
    measured +6.7% at b24, ~−1% at b96)."""
    return _resolve_lever(
        getattr(cfg.GAN, "D_TRUNK_BATCH", False),
        cfg,
        D_TRUNK_ON_BELOW,
        "D_TRUNK_BATCH",
    )


def s2d_mid_enabled(cfg) -> bool:
    """GAN.S2D_MID: extend the s2d recode to the MIDDLE scales (e.g. 128² of
    a 3-branch tree) — their G up-block/to-RGB and D first conv run in s2d
    layout; one depth_to_space layout op feeds the next stage interleaved.
    Needs at least one middle stage (branch_num ≥ 3). On-chip A/B measured
    it a LOSS (−2.2% at b24, docs/PERF.md: the zero-expanded first-conv
    MACs outweigh the 4×-smaller 128² chains), so "auto" resolves to OFF at
    every batch; an explicit True pins it on (exact math either way)."""
    val = _lever_value(getattr(cfg.GAN, "S2D_MID", False), "S2D_MID")
    if val == "auto":
        return False
    return val and int(cfg.TREE.BRANCH_NUM) >= 3


def s2d_scale_flags(cfg) -> tuple:
    """Per-scale space-to-depth flags for the train step (index i = scale
    64·2^i): top from GAN.S2D, middles from GAN.S2D_MID, init never."""
    n = int(cfg.TREE.BRANCH_NUM)
    top, mid = s2d_enabled(cfg), s2d_mid_enabled(cfg)
    return tuple(
        (top and i == n - 1) or (mid and 0 < i < n - 1) for i in range(n)
    )


def build_models(
    cfg, axis_name: str | None = None, joint: bool = False
) -> GanModels:
    dtype = jnp.dtype(cfg.DTYPE.COMPUTE)
    ca = CANet(c_dim=int(cfg.GAN.EMBEDDING_DIM), dtype=dtype)
    g = GNet(
        gf_dim=int(cfg.GAN.GF_DIM),
        branch_num=int(cfg.TREE.BRANCH_NUM),
        num_res=int(cfg.GAN.R_NUM),
        dtype=dtype,
        axis_name=axis_name,
        remat=bool(cfg.GAN.REMAT),
        remat_policy=str(getattr(cfg.GAN, "REMAT_POLICY", "none")),
        up_mode=str(getattr(cfg.GAN, "UPSAMPLE_MODE", "naive")),
        s2d_top=s2d_enabled(cfg),
        s2d_mid=s2d_mid_enabled(cfg),
    )
    ds = tuple(
        build_discriminators(
            int(cfg.TREE.BRANCH_NUM),
            int(cfg.GAN.DF_DIM),
            int(cfg.GAN.EMBEDDING_DIM),
            bool(cfg.GAN.B_CONDITION),
            dtype,
            axis_name,
            d_trunk_batch_enabled(cfg),
            s2d_enabled(cfg),
            s2d_mid_enabled(cfg),
        )
    )
    encoder = None
    if joint:
        e = cfg.ENCODER
        encoder = SpeechEncoder(
            emb_dim=int(cfg.TEXT.DIMENSION),
            conv_channels=tuple(e.CONV_CHANNELS),
            conv_kernel=int(e.CONV_KERNEL),
            conv_stride=int(e.CONV_STRIDE),
            rnn_hidden=int(e.RNN_HIDDEN),
            rnn_layers=int(e.RNN_LAYERS),
            bidirectional=bool(e.BIDIRECTIONAL),
            pool=str(e.POOL),
            n_classes=0,
            norm_out=bool(e.NORM_OUT),
            dtype=dtype,
            axis_name=axis_name,
        )
    return GanModels(ca, g, ds, encoder)


class GanTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any  # {'ca': ..., 'g': ..., ['enc': ...]} — one optimizer group
    g_stats: Any  # {'g': batch_stats, ['enc': batch_stats]}
    g_opt: Any
    d_params: tuple
    d_stats: tuple
    d_opt: tuple
    ema_g: Any  # Polyak copy of g_params['g'] + ['ca'] (None-like empty if off)


def _scale_by_adam_cast(
    b1: float, b2: float, eps: float = 1e-8, dtype=jnp.bfloat16
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored in ``dtype``.

    The b24 device profile ranks the fp32 m/v/param traffic of the giant
    D256 kernels (4×4×1024×2048 ≈ 100 MB of optimizer-state reads+writes
    per step) in the top-10 fusions (docs/PERF.md). Storing m and v in
    bf16 halves that traffic; the per-step math stays fp32 (load → fp32 →
    update → cast back), so the only difference from stock Adam is the
    rounding of the stored moments (~0.4% relative). With dtype=float32
    this is bitwise `scale_by_adam` (tested)."""

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(z, params),
            nu=jax.tree.map(z, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = lambda x: x.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: b1 * f32(m) + (1.0 - b1) * f32(g), state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * f32(v) + (1.0 - b2) * jnp.square(f32(g)),
            state.nu,
            updates,
        )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
        return out, optax.ScaleByAdamState(count, cast(mu), cast(nu))

    return optax.GradientTransformation(init, update)


def _adam(cfg, lr: float) -> optax.GradientTransformation:
    name = str(getattr(cfg.TRAIN, "OPTIMIZER", "adam")).lower()
    if name == "sgd":
        return optax.sgd(lr)
    if name != "adam":
        raise ValueError(f"unknown TRAIN.OPTIMIZER {name!r}")
    b1 = float(cfg.TRAIN.ADAM_BETA1)
    b2 = float(cfg.TRAIN.ADAM_BETA2)
    mdt = str(getattr(cfg.TRAIN, "MOMENT_DTYPE", "float32")).lower()
    if mdt in ("", "float32", "fp32"):
        return optax.adam(lr, b1=b1, b2=b2)
    # TRAIN.MOMENT_DTYPE=bfloat16: low-precision moments for LARGE leaves
    # only (≥ TRAIN.MOMENT_DTYPE_MIN_SIZE elements — the D256-scale kernels
    # whose state traffic shows in the profile); small leaves (BN scales,
    # biases, heads) keep exact fp32 moments.
    min_size = int(getattr(cfg.TRAIN, "MOMENT_DTYPE_MIN_SIZE", 262144))
    big = lambda params: jax.tree.map(lambda p: p.size >= min_size, params)
    small = lambda params: jax.tree.map(lambda p: p.size < min_size, params)
    return optax.chain(
        optax.masked(
            _scale_by_adam_cast(b1, b2, dtype=jnp.dtype(mdt)), big
        ),
        optax.masked(optax.scale_by_adam(b1=b1, b2=b2), small),
        optax.scale(-lr),
    )


def init_state(cfg, models: GanModels, rng: jax.Array, batch: dict) -> GanTrainState:
    """Initialize params/opt-states from one (host) example batch."""
    images = expand_image_pyramid(
        normalize_images(batch["images"]), int(cfg.TREE.BRANCH_NUM)
    )
    images = s2d_recode(images, s2d_scale_flags(cfg))
    batch = dict(batch, images=images)
    r_ca, r_ca2, r_g, r_z, r_d, r_e = jax.random.split(rng, 6)
    emb_dim = int(cfg.TEXT.DIMENSION)
    b = batch["images"][0].shape[0]
    emb = jnp.zeros((b, emb_dim), jnp.float32)

    ca_vars = models.ca.init(r_ca, emb, r_ca2)
    z = jnp.zeros((b, int(cfg.GAN.Z_DIM)), jnp.float32)
    c = jnp.zeros((b, int(cfg.GAN.EMBEDDING_DIM)), jnp.float32)
    g_vars = models.g.init(r_g, z, c)

    g_params = {"ca": ca_vars["params"], "g": g_vars["params"]}
    g_stats = {"g": g_vars["batch_stats"]}
    if models.encoder is not None:
        e_vars = models.encoder.init(r_e, batch["feats"], batch.get("feat_mask"))
        g_params["enc"] = e_vars["params"]
        g_stats["enc"] = e_vars["batch_stats"]

    d_params, d_stats = [], []
    # One key per discriminator: a shared key would start every shape-matched
    # layer across D64/D128/D256 (the common DownBlock trunk + heads) with
    # identical weights — a correlated D ensemble.
    r_ds = jax.random.split(r_d, len(models.ds))
    for d, img, r_di in zip(models.ds, batch["images"], r_ds):
        d_vars = d.init(r_di, img, c)
        d_params.append(d_vars["params"])
        d_stats.append(d_vars["batch_stats"])

    g_opt = _adam(cfg, float(cfg.TRAIN.GENERATOR_LR)).init(g_params)
    d_opts = [
        _adam(cfg, float(cfg.TRAIN.DISCRIMINATOR_LR)).init(p) for p in d_params
    ]
    ema_decay = float(cfg.TRAIN.EMA_G)
    ema = (
        jax.tree.map(jnp.copy, {"ca": g_params["ca"], "g": g_params["g"]})
        if ema_decay > 0
        else {}
    )
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_stats=g_stats,
        g_opt=g_opt,
        d_params=tuple(d_params),
        d_stats=tuple(d_stats),
        d_opt=tuple(d_opts),
        ema_g=ema,
    )


def normalize_images(images) -> tuple:
    """Device-side [-1,1] normalization of raw uint8 pixel batches.

    ``DATA.IMAGE_DTYPE="uint8"`` ships [0,255] bytes host→device (4x less
    transfer than float32) and normalizes here, inside the jitted step where
    XLA fuses the convert into the first conv's input read. Float input
    passes through untouched (already [-1,1] host-side)."""

    def one(im):
        if jnp.issubdtype(im.dtype, jnp.integer):
            return im.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        return im

    return tuple(one(im) for im in images)


def expand_image_pyramid(images: tuple, branch_num: int) -> tuple:
    """Derive the lower GAN scales from the top scale by 2× area-pooling.

    ``DATA.SHIP_SCALES="top"`` sends ONLY the largest scale host→device (the
    smaller scales are exact area-pools of it — the loaders compute them
    that way), cutting transfer another ~25% on top of uint8 and skipping
    the host-side pooling. Applied after :func:`normalize_images`; a full
    per-scale tuple passes through unchanged."""
    if len(images) == branch_num:
        return tuple(images)
    if len(images) != 1:
        raise ValueError(
            f"batch has {len(images)} image scales; expected 1 or {branch_num}"
        )
    out = [images[0]]
    for _ in range(branch_num - 1):
        b, h, w, c = out[0].shape
        out.insert(
            0, out[0].reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        )
    return tuple(out)


def s2d_recode(images: tuple, flags: tuple) -> tuple:
    """GAN.S2D / GAN.S2D_MID: recode the flagged scales to space-to-depth
    layout — the layout D's first conv and the color loss consume directly,
    so those scales' interleaved tensors never exist inside the train step."""
    from s2i_tpu.models.layers import space_to_depth

    return tuple(
        space_to_depth(im) if fl else im for im, fl in zip(images, flags)
    )


def wrong_pair_sources(class_id: jax.Array) -> jax.Array:
    """Per-example source index for a class-aware "wrong" pair: the nearest
    preceding batch element (smallest roll shift ≥1) whose class differs.
    Falls back to shift 1 — the reference's plain roll — for an example whose
    class fills the whole batch.

    One gathered [B, B-1] comparison + argmax over the shift axis: a few
    traced ops at any B (the previous statically-unrolled roll loop traced
    ~5·B ops — b96's class_aware compile carried 95 rolls)."""
    B = class_id.shape[0]
    if B == 1:
        return jnp.zeros((1,), jnp.int32)
    i = jnp.arange(B)[:, None]
    s = jnp.arange(1, B)[None, :]
    differs = class_id[(i - s) % B] != class_id[:, None]  # [B, B-1]
    shift = jnp.where(differs.any(axis=1), 1 + jnp.argmax(differs, axis=1), 1)
    return (jnp.arange(B) - shift) % B


def _per_example_normal(key: jax.Array, idx: jax.Array, tail: tuple) -> jax.Array:
    """Sharding-invariant normal draw: example ``j``'s noise depends only on
    (key, global index j), never on the mesh layout — so an 8-way sharded
    step sees exactly the noise a single-device step sees on the same global
    batch (testable psum correctness, SURVEY.md §4)."""

    def one(i):
        return jax.random.normal(jax.random.fold_in(key, i), tail, jnp.float32)

    return jax.vmap(one)(idx)


def make_train_step(
    cfg, models: GanModels, axis_name: str | None = None
) -> Callable:
    """Build the (jittable) train step.

    ``axis_name`` set ⇒ the step is meant to run inside shard_map over a
    data mesh: gradients are psum-averaged over the axis before the
    optimizer update (SURVEY.md §2 'Parallelism' row).

    batch: {'images': tuple per scale [B,S,S,3],
            'embedding': [B, emb_dim]}            (frozen-embedding mode)
         + {'feats': [B,T,D], 'feat_mask': [B,T],
            'teacher': [B, emb_dim]}              (joint mode; 'embedding'
                                                   then unused)
    """
    uncond_coeff = float(cfg.TRAIN.COEFF.UNCOND_LOSS)
    kl_coeff = float(cfg.TRAIN.COEFF.KL)
    color_coeff = float(cfg.TRAIN.COEFF.COLOR_LOSS)
    distill_coeff = float(cfg.TRAIN.COEFF.DISTILL)
    b_condition = bool(cfg.GAN.B_CONDITION)
    z_dim = int(cfg.GAN.Z_DIM)
    ema_decay = float(cfg.TRAIN.EMA_G)
    ema_warmup = int(getattr(cfg.TRAIN, "EMA_WARMUP", 0))
    joint = models.encoder is not None
    g_tx = _adam(cfg, float(cfg.TRAIN.GENERATOR_LR))
    d_tx = _adam(cfg, float(cfg.TRAIN.DISCRIMINATOR_LR))

    c_dim = int(cfg.GAN.EMBEDDING_DIM)

    def psum_mean(tree):
        if axis_name is None:
            return tree
        return jax.lax.pmean(tree, axis_name)

    def global_roll1(x):
        """``jnp.roll(x, 1, axis=0)`` over the GLOBAL batch. Under shard_map
        the first local row is the previous shard's last row — one
        ppermute hop over ICI, not an all_gather."""
        if axis_name is None:
            return jnp.roll(x, 1, axis=0)
        n = jax.lax.axis_size(axis_name)
        if n == 1:
            return jnp.roll(x, 1, axis=0)
        prev_last = jax.lax.ppermute(
            x[-1:], axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        return jnp.concatenate([prev_last, x[:-1]], axis=0)

    wrong_pair = str(getattr(cfg.TRAIN, "WRONG_PAIR", "roll")).lower()

    def wrong_conditions(cond, class_id):
        """Conditions for the D's "wrong pair" term (SURVEY.md §3.3). The
        condition vectors are tiny ([B, c_dim]), so the class-aware sharded
        path just all_gathers them, picks globally, and slices local."""
        if wrong_pair == "roll":
            return global_roll1(cond)
        if wrong_pair != "class_aware":
            raise ValueError(f"unknown TRAIN.WRONG_PAIR {wrong_pair!r}")
        if class_id is None:
            raise ValueError(
                "TRAIN.WRONG_PAIR=class_aware needs class_id in the batch"
            )
        class_id = class_id.astype(jnp.int32)
        if axis_name is None:
            return cond[wrong_pair_sources(class_id)]
        cond_g = jax.lax.all_gather(cond, axis_name, tiled=True)
        cls_g = jax.lax.all_gather(class_id, axis_name, tiled=True)
        wrong_g = cond_g[wrong_pair_sources(cls_g)]
        start = jax.lax.axis_index(axis_name) * cond.shape[0]
        return jax.lax.dynamic_slice_in_dim(
            wrong_g, start, cond.shape[0], axis=0
        )

    branch_num = int(cfg.TREE.BRANCH_NUM)
    s2d_flags = s2d_scale_flags(cfg)
    any_s2d = any(s2d_flags)

    def train_step(state: GanTrainState, batch: dict, base_rng: jax.Array):
        images = expand_image_pyramid(
            normalize_images(batch["images"]), branch_num
        )
        images = s2d_recode(images, s2d_flags)
        batch = dict(batch, images=images)
        rng = jax.random.fold_in(base_rng, state.step)
        rng_z, rng_ca = jax.random.split(rng)
        b = batch["images"][0].shape[0]
        offset = (
            jax.lax.axis_index(axis_name) * b if axis_name is not None else 0
        )
        idx = offset + jnp.arange(b)
        z = _per_example_normal(rng_z, idx, (z_dim,))
        ca_eps = _per_example_normal(rng_ca, idx, (c_dim,))

        # ---- ONE G-side forward, with saved VJP residuals ----
        # The same generated images serve the D phase (as constants) and,
        # after the D update, the G backward (chain rule through g_vjp) —
        # exact reference ordering without a second generator forward.
        def g_forward(g_params):
            new_stats = {}
            if joint:
                emb_g, enc_vars = models.encoder.apply(
                    {
                        "params": g_params["enc"],
                        "batch_stats": state.g_stats["enc"],
                    },
                    batch["feats"],
                    batch.get("feat_mask"),
                    train=True,
                    mutable=["batch_stats"],
                )
                new_stats["enc"] = enc_vars["batch_stats"]
            else:
                emb_g = batch["embedding"]
            c, mu, logvar = models.ca.apply(
                {"params": g_params["ca"]}, emb_g, eps=ca_eps
            )
            fakes, g_vars = models.g.apply(
                {"params": g_params["g"], "batch_stats": state.g_stats["g"]},
                z,
                c,
                s2d_out=any_s2d,  # flagged fakes stay s2d: Ds + color eat them
                mutable=["batch_stats"],
            )
            new_stats["g"] = g_vars["batch_stats"]
            return (tuple(fakes), mu, logvar, emb_g), new_stats

        (fakes, mu, logvar, emb_g), g_vjp, g_stats_new = jax.vjp(
            g_forward, state.g_params, has_aux=True
        )
        cond_d = jax.lax.stop_gradient(mu)
        cond_wrong = wrong_conditions(cond_d, batch.get("class_id"))
        fakes_sg = [jax.lax.stop_gradient(f) for f in fakes]

        # ---- D phase: one backward over the disjoint D param tuple ----
        def d_loss_fn(d_params):
            total = jnp.asarray(0.0, jnp.float32)
            new_stats, mets = [], {}
            for i, (d, dp, dst, real, fake) in enumerate(
                zip(models.ds, d_params, state.d_stats, batch["images"], fakes_sg)
            ):
                logits, vars_new = d.apply(
                    {"params": dp, "batch_stats": dst},
                    real,
                    fake,
                    cond_d if b_condition else None,
                    cond_wrong if b_condition else None,
                    mutable=["batch_stats"],
                    method="train_logits",
                )
                li, aux = losses.discriminator_loss(*logits, uncond_coeff)
                total = total + li
                new_stats.append(vars_new["batch_stats"])
                mets[f"d{i}_loss"] = li
                mets[f"d{i}_real_acc"] = aux["real_acc"]
                mets[f"d{i}_fake_acc"] = aux["fake_acc"]
            return total, (tuple(new_stats), mets)

        (d_total, (d_stats_new, d_mets)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_grads = psum_mean(d_grads)

        d_params_new, d_opt_new = [], []
        for dp, dg, do in zip(state.d_params, d_grads, state.d_opt):
            upd, do2 = d_tx.update(dg, do, dp)
            d_params_new.append(optax.apply_updates(dp, upd))
            d_opt_new.append(do2)
        d_params_new, d_opt_new = tuple(d_params_new), tuple(d_opt_new)

        # ---- G phase against the UPDATED Ds (reference order): grads wrt
        # the saved forward's outputs, pulled back through g_vjp ----
        def g_out_loss(fakes2, mu2, logvar2, emb2):
            mets = {}
            adv = jnp.asarray(0.0, jnp.float32)
            for i, (d, dp, dst, fake) in enumerate(
                zip(models.ds, d_params_new, d_stats_new, fakes2)
            ):
                (cond_f, uncond_f), _ = d.apply(
                    {"params": dp, "batch_stats": dst},
                    fake,
                    mu2 if b_condition else None,
                    mutable=["batch_stats"],
                )
                adv = adv + losses.generator_adversarial_loss(
                    cond_f, uncond_f, uncond_coeff
                )
            kl = kl_divergence(mu2, logvar2)
            total = adv + kl_coeff * kl
            mets["g_adv"] = adv
            mets["kl"] = kl
            if color_coeff > 0 and len(fakes2) > 1:
                color_in = list(fakes2)
                for j, fl in enumerate(s2d_flags):
                    if not fl:
                        continue
                    # phase→width fold: [B,H,W,12] → [B,H,4W,3]; per-image
                    # channel stats are position-permutation-invariant, so
                    # the loss equals the interleaved-layout loss exactly
                    t = color_in[j]
                    b2, h2, w2, _ = t.shape
                    color_in[j] = t.reshape(b2, h2, w2, 4, 3).reshape(
                        b2, h2, w2 * 4, 3
                    )
                closs = losses.color_consistency_loss(color_in)
                total = total + color_coeff * closs
                mets["color"] = closs
            if joint and distill_coeff > 0:
                dloss, dmets = losses.distillation_loss(emb2, batch["teacher"])
                total = total + distill_coeff * dloss
                mets["distill_mse"] = dmets["mse"]
            mets["g_loss"] = total
            return total, mets

        (g_total, g_mets), out_bars = jax.value_and_grad(
            g_out_loss, argnums=(0, 1, 2, 3), has_aux=True
        )(fakes, mu, logvar, emb_g)
        (g_grads,) = g_vjp(out_bars)
        g_grads = psum_mean(g_grads)
        g_upd, g_opt_new = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params_new = optax.apply_updates(state.g_params, g_upd)

        # keep stats pytree complete in non-joint mode
        if not joint and "enc" in state.g_stats:
            g_stats_new["enc"] = state.g_stats["enc"]

        if ema_decay > 0:
            # TRAIN.EMA_WARMUP: track raw params exactly (decay 0) for the
            # first N steps, then switch to Polyak. Early GAN params swing
            # through disparate modes whose average is off-manifold — a
            # cold-started EMA G emits mean color for ~1/(1-decay) steps
            # (observed in the round-4 convergence cert: raw FID halved
            # while EMA FID sat at the init value for 3k+ steps).
            decay_t = jnp.where(
                state.step < ema_warmup, 0.0, ema_decay
            ).astype(jnp.float32)
            cur = {"ca": g_params_new["ca"], "g": g_params_new["g"]}
            ema = jax.tree.map(
                lambda e, p: (
                    e * decay_t + p.astype(jnp.float32) * (1.0 - decay_t)
                ).astype(e.dtype),
                state.ema_g,
                cur,
            )
        else:
            ema = state.ema_g

        metrics = {
            "d_loss": d_total,
            **d_mets,
            **g_mets,
        }
        metrics = {k: psum_mean(v) for k, v in metrics.items()}

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params_new,
            g_stats=g_stats_new,
            g_opt=g_opt_new,
            d_params=d_params_new,
            d_stats=tuple(d_stats_new),
            d_opt=d_opt_new,
            ema_g=ema,
        )
        return new_state, metrics

    return train_step


def make_bn_recalc_fn(
    cfg, models: GanModels, batches: int = 30, batch_size: int | None = None
) -> Callable:
    """Re-estimate G's BatchNorm running stats under the EMA weights.

    The Polyak-averaged G (``state.ema_g``) is otherwise evaluated with
    running stats collected along the RAW parameter trajectory
    (``state.g_stats['g']``) — the same latent flaw as the reference
    lineage, where ``avg_param_G`` covers ``netG.parameters()`` but torch
    BN buffers are never averaged. When params move fast relative to the
    EMA horizon the weight/stat mismatch is catastrophic: in the round-4
    convergence cert the EMA G emitted structure-free mean color
    (fixture-FID 2301 at IS=1.0) while the raw G sat at FID 463; thirty
    re-estimation batches restored class-grating structure on the same
    checkpoint (docs/QUALITY.md). The standard fix from the
    weight-averaging GAN literature is to re-estimate the BN population
    statistics under the averaged weights before evaluating them.

    Returns ``recalc(state, embeddings, rng) -> batch_stats`` (the new
    ``g_stats['g']``), jittable: a ``lax.scan`` of ``batches`` train-mode
    G forwards with EMA params — eval-mode CA conditioning (c = mu) on a
    random batch of ``embeddings`` and fresh z per pass, the same input
    distribution sampling uses. With BN momentum 0.9 the initial stats'
    weight after 30 passes is 0.9^30 ≈ 4%. Feed the result back via
    ``state.replace(g_stats={**state.g_stats, 'g': recalced})`` and
    sample as usual. Enable in eval drivers with ``EVAL.EMA_BN_RECALC``.
    """
    z_dim = int(cfg.GAN.Z_DIM)
    bs = int(batch_size or cfg.TRAIN.BATCH_SIZE)

    def recalc(state: GanTrainState, embeddings: jax.Array, rng: jax.Array):
        params = (
            state.ema_g
            if state.ema_g
            else {"ca": state.g_params["ca"], "g": state.g_params["g"]}
        )

        def body(stats, r):
            r_idx, r_z = jax.random.split(r)
            idx = jax.random.randint(
                r_idx, (bs,), 0, embeddings.shape[0]
            )
            c, _, _ = models.ca.apply(
                {"params": params["ca"]}, embeddings[idx], train=False
            )
            z = jax.random.normal(r_z, (bs, z_dim), jnp.float32)
            _, upd = models.g.apply(
                {"params": params["g"], "batch_stats": stats},
                z,
                c,
                train=True,
                mutable=["batch_stats"],
            )
            return upd["batch_stats"], None

        stats, _ = jax.lax.scan(
            body, state.g_stats["g"], jax.random.split(rng, batches)
        )
        return stats

    return recalc


def make_sample_fn(
    cfg, models: GanModels, use_ema: bool = True, axis_name: str | None = None
) -> Callable:
    """Deterministic-per-seed sampling: (state, embedding, rng) → images.

    Uses the Polyak-averaged G (reference snapshots load avg_param_G) and
    eval-mode CA (c = μ). Returns the list of per-stage images. Noise is
    drawn per GLOBAL example index (like the train step), so the
    shard_map-wrapped version (``axis_name`` set — see
    parallel.make_parallel_sample_fn) produces exactly the single-device
    images for the same seed and global batch.

    .. warning:: With ``use_ema=True`` this pairs the Polyak-averaged
       weights with ``state.g_stats['g']`` — BatchNorm running stats
       collected along the RAW parameter trajectory. That mismatch is the
       reference lineage's own latent flaw and on a fast-moving trajectory
       it is catastrophic (round-4 cert: EMA fixture-FID 2301 at IS=1.0 vs
       raw 463 — structure-free mean color; docs/QUALITY.md). Re-estimate
       the stats under the EMA weights first via ``make_bn_recalc_fn`` /
       ``EVAL.EMA_BN_RECALC`` (``GanTrainer.eval_state`` does this for
       you) and sample from the returned state.
    """
    z_dim = int(cfg.GAN.Z_DIM)

    def sample(state: GanTrainState, embedding: jax.Array, rng: jax.Array):
        params = (
            state.ema_g
            if (use_ema and state.ema_g)
            else {"ca": state.g_params["ca"], "g": state.g_params["g"]}
        )
        b = embedding.shape[0]
        offset = (
            jax.lax.axis_index(axis_name) * b if axis_name is not None else 0
        )
        z = _per_example_normal(rng, offset + jnp.arange(b), (z_dim,))
        c, _, _ = models.ca.apply(
            {"params": params["ca"]}, embedding, train=False
        )
        imgs = models.g.apply(
            {"params": params["g"], "batch_stats": state.g_stats["g"]},
            z,
            c,
            train=False,
        )
        return imgs

    return sample
