"""Shared plumbing for the on-chip quality-certification CLIs
(scripts/quality_cert.py, scripts/joint_quality_cert.py,
scripts/encoder_quality_cert.py).

The certs all follow the same protocol (docs/QUALITY.md): build a
class-structured synthetic fixture (no external assets), fine-tune the
IS/FID protocol's Inception classifier on the fixture classes, then
train a recipe config in chunks and score every boundary in a FIXED
feature space with FIXED sampling populations, so the curve's trend is
the training signal. SURVEY.md §4: the reference's entire validation
story is "the training curves and IS/FID numbers reproduce" — these
helpers are that story's framework-native harness.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Any, Callable, Sequence

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture(out: str, classes: int, per_class: int, captions: int,
                  emb_dim: int, seed: int, test_per_class: int = 1) -> str:
    """Generate the fixture dataset tree on CPU in a subprocess — the
    parent keeps its single TPU session for the train/eval phases."""
    fixture = os.path.join(out, "fixture")
    if os.path.exists(os.path.join(fixture, "train", "filenames.pickle")):
        print(f"fixture exists: {fixture}")
        return fixture
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    subprocess.run(
        [sys.executable, "tools/make_fixture_dataset.py", "--out", fixture,
         "--classes", str(classes), "--per_class", str(per_class),
         "--captions", str(captions), "--emb_dim", str(emb_dim),
         "--seed", str(seed), "--test_per_class", str(test_per_class)],
        cwd=REPO, env=env, check=True,
    )
    return fixture


def load_real_images(splits: Sequence[Any], size: int) -> np.ndarray:
    """All fixture images at the GAN's top scale, [-1,1] NHWC (the FID
    real set; center-crop-free resize — fixture images are square)."""
    from PIL import Image

    imgs = []
    for split in splits:
        for i in range(len(split)):
            im = Image.open(split.image_path(i)).convert("RGB")
            if im.size != (size, size):
                im = im.resize((size, size), Image.BILINEAR)
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    return np.stack(imgs)


def finetune_inception(cfg, split, n_classes: int, epochs: int, batch: int,
                       base_size: int, lr: float):
    """Fine-tune the IS/FID classifier on the fixture classes (StackGAN
    protocol, scripts/finetune_inception.py equivalents, in-process).
    A from-scratch InceptionV3's pool3 features are near-collapsed
    (std ~1e-4) — FID only discriminates once this classifier is genuinely
    trained, so the certs record its final train accuracy as provenance."""
    import jax
    import jax.numpy as jnp

    from s2i_tpu.data.stackgan import GanEpochIterator
    from s2i_tpu.eval.finetune import (
        init_inception_state,
        make_inception_train_step,
    )

    model, state = init_inception_state(
        n_classes, jax.random.key(int(cfg.SEED)), lr=lr
    )
    step = make_inception_train_step(model, lr=lr)
    mets = {}
    for epoch in range(epochs):
        it = GanEpochIterator(split, batch, 1, base_size=base_size,
                              seed=int(cfg.SEED) + epoch)
        for b in it:
            state, mets = step(
                state,
                jnp.asarray(b["images"][0]),
                jnp.asarray(b["class_id"] % n_classes),
            )
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f"  inception epoch {epoch}: "
                  f"ce={float(mets['ce']):.3f} acc={float(mets['acc']):.3f}")
    return {"params": state.params, "batch_stats": state.batch_stats}, mets


def make_fid_is(ex, real_stats, eval_batch: int) -> Callable:
    """fake images → (fid, is_mean, is_std) in ``ex``'s feature space."""
    from s2i_tpu.eval import (
        fid_from_stats,
        gaussian_stats,
        inception_score_from_probs,
    )

    def fid_is_of(fake: np.ndarray) -> tuple[float, float, float]:
        pool, logits = ex.extract(fake, eval_batch)
        fid = fid_from_stats(*gaussian_stats(pool), *real_stats)
        logits = logits - logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        is_mean, is_std = inception_score_from_probs(
            e / e.sum(axis=1, keepdims=True), splits=5
        )
        return float(fid), float(is_mean), float(is_std)

    return fid_is_of


def interpretability_floor(real_pool: np.ndarray, real_logits: np.ndarray,
                           seed: int) -> dict:
    """Anchors for the fixture-FID/IS curve (VERDICT r4 weak #5): the
    real-vs-real FID (random half vs half — the best any generator could
    score at this sample count) and the real set's own IS (the ceiling;
    IS is also bounded above by the class count)."""
    from s2i_tpu.eval import (
        fid_from_stats,
        gaussian_stats,
        inception_score_from_probs,
    )

    halves = np.random.default_rng(seed).permutation(real_pool.shape[0])
    floor_fid = fid_from_stats(
        *gaussian_stats(real_pool[halves[::2]]),
        *gaussian_stats(real_pool[halves[1::2]]),
    )
    rl = real_logits - real_logits.max(axis=1, keepdims=True)
    re_ = np.exp(rl)
    real_is_mean, real_is_std = inception_score_from_probs(
        re_ / re_.sum(axis=1, keepdims=True), splits=5
    )
    return {
        "real_real_fid": round(float(floor_fid), 3),
        "real_is_mean": round(float(real_is_mean), 4),
        "real_is_std": round(float(real_is_std), 4),
    }
