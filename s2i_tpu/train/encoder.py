"""Speech-encoder distillation pretraining + embedding extraction
(reference ``train_audio_encoder.py`` + the extraction flag, SURVEY.md
§3.1/§3.2, §7 step 6).

The pretrain step is one jitted program: encoder forward on (features, mask)
→ MSE to the teacher embedding (+ optional auxiliary class CE) → Adam.
Extraction runs the eval-mode encoder over all captions in batches and
returns the ``[N, emb_dim]`` array the GAN datasets consume.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from s2i_tpu.models import SpeechEncoder
from s2i_tpu.train import losses


def build_encoder(cfg, axis_name: str | None = None) -> SpeechEncoder:
    e = cfg.ENCODER
    return SpeechEncoder(
        emb_dim=int(cfg.TEXT.DIMENSION),
        conv_channels=tuple(e.CONV_CHANNELS),
        conv_kernel=int(e.CONV_KERNEL),
        conv_stride=int(e.CONV_STRIDE),
        conv_padding=str(getattr(e, "CONV_PADDING", "SAME")),
        rnn_hidden=int(e.RNN_HIDDEN),
        rnn_layers=int(e.RNN_LAYERS),
        bidirectional=bool(e.BIDIRECTIONAL),
        pool=str(e.POOL),
        n_classes=int(e.N_CLASSES) if bool(e.CLS_HEAD) else 0,
        norm_out=bool(e.NORM_OUT),
        dtype=jnp.dtype(cfg.DTYPE.COMPUTE),
        axis_name=axis_name,
    )


class EncoderTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt: Any


def init_encoder_state(
    cfg, model: SpeechEncoder, rng: jax.Array, batch: dict
) -> EncoderTrainState:
    variables = model.init(rng, batch["feats"], batch.get("feat_mask"))
    params = variables["params"]
    opt = optax.adam(float(cfg.ENCODER.LR)).init(params)
    return EncoderTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt=opt,
    )


def make_encoder_train_step(
    cfg, model: SpeechEncoder, axis_name: str | None = None
) -> Callable:
    """batch: {'feats': [B,T,D], 'feat_mask': [B,T], 'teacher': [B,emb_dim],
    'class_id': [B]} → (state, metrics)."""
    ce_coeff = float(cfg.ENCODER.CE_COEFF) if bool(cfg.ENCODER.CLS_HEAD) else 0.0
    tx = optax.adam(float(cfg.ENCODER.LR))

    def train_step(state: EncoderTrainState, batch: dict, base_rng: jax.Array):
        # Fold the step counter into the base key so resume reproduces the
        # stream, and hand it to apply() as the dropout collection — unused
        # by today's deterministic layers, but the threading is already
        # correct for when dropout/spec-augment lands.
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["feats"],
                batch.get("feat_mask"),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            emb, logits = out if isinstance(out, tuple) else (out, None)
            loss, mets = losses.distillation_loss(
                emb,
                batch["teacher"],
                logits,
                batch.get("class_id"),
                ce_coeff,
            )
            return loss, (new_vars["batch_stats"], mets)

        (loss, (stats_new, mets)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            mets = jax.lax.pmean(mets, axis_name)
            # the returned dict flows through a replicated (P()) out_spec:
            # loss must be the global mean like the mets it sits next to,
            # not one device's local-shard value
            loss = jax.lax.pmean(loss, axis_name)
        upd, opt_new = tx.update(grads, state.opt, state.params)
        params_new = optax.apply_updates(state.params, upd)
        new_state = state.replace(
            step=state.step + 1,
            params=params_new,
            batch_stats=stats_new,
            opt=opt_new,
        )
        return new_state, {"loss": loss, **mets}

    return train_step


def make_extract_fn(model: SpeechEncoder) -> Callable:
    """Jitted eval-mode embedding extraction: (state, feats, mask) → emb."""

    @jax.jit
    def extract(state: EncoderTrainState, feats: jax.Array, mask: jax.Array):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats,
            mask,
            train=False,
        )
        emb = out[0] if isinstance(out, tuple) else out
        return emb

    return extract


def extract_all(
    model: SpeechEncoder,
    state: EncoderTrainState,
    feats: Any,
    masks: Any,
    batch_size: int = 64,
):
    """Host loop over the corpus; pads the tail batch to keep shapes static."""
    import numpy as np

    extract = make_extract_fn(model)
    n = feats.shape[0]
    out = []
    for i in range(0, n, batch_size):
        fb = feats[i : i + batch_size]
        mb = masks[i : i + batch_size]
        pad = batch_size - fb.shape[0]
        if pad:
            fb = np.concatenate([fb, np.zeros((pad,) + fb.shape[1:], fb.dtype)])
            mb = np.concatenate([mb, np.zeros((pad,) + mb.shape[1:], mb.dtype)])
        emb = np.asarray(extract(state, jnp.asarray(fb), jnp.asarray(mb)))
        out.append(emb[: batch_size - pad] if pad else emb)
    return np.concatenate(out, axis=0)
