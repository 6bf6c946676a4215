"""Fine-tune the Flax InceptionV3 classifier on a dataset's classes
(SURVEY.md §2 "Inception Score": the StackGAN IS protocol scores with an
Inception model fine-tuned on CUB / Oxford respectively; the original
fine-tuned checkpoints are external assets, so this trainer lets a user
produce an equivalent one from the dataset itself).

Jitted supervised step: 299² center-crop images → logits → CE; optionally
warm-starts from ported ImageNet weights (eval/weights.py) with a fresh
class head.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from s2i_tpu.models.inception import InceptionV3


class InceptionTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt: Any


def init_inception_state(
    num_classes: int,
    rng: jax.Array,
    lr: float = 1e-4,
    warm_start: dict | None = None,
    image_size: int = 299,
) -> tuple[InceptionV3, InceptionTrainState]:
    model = InceptionV3(num_classes=num_classes)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, dummy)
    params, stats = variables["params"], variables["batch_stats"]
    if warm_start is not None:
        # graft everything except the class head (shape differs)
        for k, v in warm_start["params"].items():
            if k != "fc":
                params[k] = v
        stats = warm_start.get("batch_stats", stats)
    opt = optax.adam(lr).init(params)
    return model, InceptionTrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats, opt=opt
    )


def make_inception_train_step(
    model: InceptionV3, lr: float = 1e-4, image_size: int = 299
) -> Callable:
    tx = optax.adam(lr)

    def step(state: InceptionTrainState, images: jax.Array, labels: jax.Array):
        imgs = jax.image.resize(
            images,
            (images.shape[0], image_size, image_size, 3),
            method="bilinear",
        )

        def loss_fn(params):
            out, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out["logits"], labels
            ).mean()
            acc = jnp.mean((jnp.argmax(out["logits"], -1) == labels).astype(jnp.float32))
            return ce, (new_vars["batch_stats"], acc)

        (loss, (stats_new, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        upd, opt_new = tx.update(grads, state.opt, state.params)
        params_new = optax.apply_updates(state.params, upd)
        return (
            state.replace(
                step=state.step + 1,
                params=params_new,
                batch_stats=stats_new,
                opt=opt_new,
            ),
            {"ce": loss, "acc": acc},
        )

    return jax.jit(step)
