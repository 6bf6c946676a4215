"""Batched on-device Inception feature/logit extraction for IS and FID.

Images come in as [-1,1] NHWC at any of the GAN scales; they are resized
on-device (bilinear, matching the usual IS/FID protocol) to 299×299 before
the InceptionV3 pass. The extractor is jitted once and looped over host
batches; padding keeps the tail batch shape static.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2i_tpu.models.inception import InceptionV3


class InceptionFeatures:
    """Holds an InceptionV3 + its variables and exposes batched extraction."""

    def __init__(
        self,
        variables: Any | None = None,
        num_classes: int = 1000,
        rng_seed: int = 0,
        image_size: int = 299,
        mesh: Any | None = None,
    ):
        """``mesh``: a 1-D data mesh → batches shard over it and the
        Inception pass runs SPMD (BASELINE.json's pod-sharded eval), with
        params replicated. None = single device."""
        self.model = InceptionV3(num_classes=num_classes)
        self.image_size = image_size
        if variables is None:
            # Random weights: metric *plumbing* only (tests, smoke runs).
            dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            variables = self.model.init(jax.random.key(rng_seed), dummy)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self.variables = variables

        @jax.jit
        def _fwd(variables, imgs):
            imgs = jax.image.resize(
                imgs,
                (imgs.shape[0], image_size, image_size, 3),
                method="bilinear",
            )
            out = self.model.apply(variables, imgs, train=False)
            return out["pool3"], out["logits"]

        self._fwd = _fwd

    def extract(
        self, images: np.ndarray, batch_size: int = 64
    ) -> tuple[np.ndarray, np.ndarray]:
        """[N,H,W,3] in [-1,1] → (pool3 [N,2048], logits [N,C])."""
        n = images.shape[0]
        pools, logits = [], []
        for i in range(0, n, batch_size):
            b = np.asarray(images[i : i + batch_size], dtype=np.float32)
            pad = batch_size - b.shape[0]
            if pad:
                b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
            bj = jnp.asarray(b)
            if self.mesh is not None:
                bj = jax.device_put(bj, self._batch_sharding)
            p, l = self._fwd(self.variables, bj)
            p, l = np.asarray(p), np.asarray(l)
            if pad:
                p, l = p[:-pad], l[:-pad]
            pools.append(p)
            logits.append(l)
        return np.concatenate(pools), np.concatenate(logits)
