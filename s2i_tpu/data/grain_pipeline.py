"""Grain-based input pipeline (SURVEY.md §1: "L1 → Grain + host decode").

An alternative to the hand-rolled epoch iterators for users who want Grain's
determinism/checkpointing/multiprocessing story: wraps a
:class:`~s2i_tpu.data.stackgan.StackGanSplit` as a random-access source,
applies the StackGAN per-example transform in Grain workers, and batches.
The native C++ loader remains the default high-throughput path in
``GanEpochIterator``; this one slots into the same batch_factory contract.
"""

from __future__ import annotations

import grain
import numpy as np

from s2i_tpu.data.stackgan import StackGanSplit, multiscale


class _GanSource:
    """Random-access (image, embedding, class) source over a split."""

    def __init__(
        self,
        split: StackGanSplit,
        branch_num: int,
        base_size: int,
        image_dtype: str = "float32",
        ship_scales: str = "all",
        seed: int = 0,
    ):
        self.split = split
        self.branch_num = branch_num
        self.base_size = base_size
        self.image_dtype = image_dtype
        self.ship_scales = ship_scales
        self.seed = seed

    def __len__(self) -> int:
        return len(self.split)

    def __getitem__(self, i: int) -> dict:
        i = int(i)
        # Per-example rng keyed by (pipeline seed, index): deterministic
        # under Grain's record shuffling and worker sharding, but — because
        # the factory passes seed=SEED+epoch — the crop/flip augmentation
        # and the caption choice re-draw every epoch. (Keying by index alone
        # froze both for the whole run: with 10 captions/image, 90% of
        # captions were never trained on through this pipeline.)
        rng = np.random.default_rng([self.seed, i])
        top = self.base_size * 2 ** (self.branch_num - 1)
        img = self.split.load_image(i, top, rng, dtype=self.image_dtype)
        scales = (
            [img]
            if self.ship_scales == "top"
            else multiscale(img, self.branch_num, self.base_size)
        )
        cap = int(rng.integers(0, self.split.captions_per_image))
        return {
            "images": tuple(scales),
            "embedding": self.split.embeddings[i, cap],
            "class_id": np.int64(self.split.class_id[i]),
        }


def _stack_batch(examples: list[dict]) -> dict:
    n_scales = len(examples[0]["images"])
    return {
        "images": tuple(
            np.stack([e["images"][s] for e in examples]) for s in range(n_scales)
        ),
        "embedding": np.stack([e["embedding"] for e in examples]),
        "class_id": np.stack([e["class_id"] for e in examples]),
    }


def make_grain_gan_dataset(
    split: StackGanSplit,
    batch_size: int,
    branch_num: int,
    base_size: int = 64,
    seed: int = 0,
    shuffle: bool = True,
    num_workers: int = 0,
    image_dtype: str = "float32",
    ship_scales: str = "all",
):
    """Returns a grain.IterDataset of trainer-ready batch dicts."""
    src = _GanSource(
        split, branch_num, base_size, image_dtype, ship_scales, seed=seed
    )
    ds = grain.MapDataset.source(src)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.batch(batch_size, drop_remainder=True, batch_fn=_stack_batch)
    it = ds.to_iter_dataset()
    if num_workers:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers)
        )
    return it


def grain_batch_factory(cfg):
    """batch_factory-compatible wrapper, selected by ``DATA.PIPELINE=grain``
    (see cli.gan_batch_factory). ``DATA.GRAIN_WORKERS`` > 0 decodes in Grain
    worker processes via mp_prefetch.

    Deliberate trade-off: the pipeline (including the mp_prefetch worker
    pool) is rebuilt per epoch. The (SEED+epoch)-keyed stream is what makes
    GanTrainer's mid-epoch resume realign exactly — ``factory(epoch)`` must
    restart from that epoch's first batch on a fresh process — and it
    re-draws shuffling/augmentation/caption choice every epoch. The cost is
    one pool fork per epoch boundary (seconds) against minutes of epoch; a
    persistent pool would need Grain iterator checkpointing threaded through
    the batch_factory contract for no measured gain."""
    split = StackGanSplit(
        cfg.DATA_DIR, "train", embedding_file=str(cfg.TEXT.EMBEDDING_FILE)
    )

    def factory(epoch: int):
        return iter(
            make_grain_gan_dataset(
                split,
                int(cfg.TRAIN.BATCH_SIZE),
                int(cfg.TREE.BRANCH_NUM),
                int(cfg.TREE.BASE_SIZE),
                seed=int(cfg.SEED) + epoch,
                num_workers=int(cfg.DATA.GRAIN_WORKERS),
                image_dtype=str(getattr(cfg.DATA, "IMAGE_DTYPE", "float32")),
                ship_scales=str(getattr(cfg.DATA, "SHIP_SCALES", "all")),
            )
        )

    return factory
