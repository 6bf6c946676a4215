"""Batched on-device Inception feature/logit extraction for IS and FID.

Images come in as [-1,1] NHWC at any of the GAN scales; they are resized
on-device (bilinear, matching the usual IS/FID protocol) to 299×299 before
the InceptionV3 pass. The extractor is jitted once and looped over host
batches; padding keeps the tail batch shape static. Extraction is
pipelined one batch deep (the same depth-1 dispatch recipe as
serving.Batcher._run): batch i+1 is dispatched before batch i's readback
is forced, so device compute hides under the device→host transfer on the
30k-image protocols.

Protocol parity (SURVEY.md §7 hard-part 3): the default path feeds the
generator's continuous [-1,1] floats straight to the resize — exact for
self-consistent numbers. pytorch-fid's canonical protocol reads images
back from PNG files, i.e. the features see uint8-QUANTIZED pixels;
``quantize_input=True`` reproduces that (round-half-up to uint8 with the
same formula as ``utils.images.to_uint8``, then back to [-1,1] as
pytorch-fid's ``2*(u/255)-1``) before the resize. The bilinear UPSCALE to
299 px itself is bit-compatible with torch's
``F.interpolate(mode="bilinear", align_corners=False)``
(tests/test_eval.py torch A/B); only downscales would diverge
(jax.image.resize antialiases, pytorch-fid does not) and no GAN scale
downscales to 299.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from s2i_tpu.models.inception import InceptionV3


def preprocess(
    imgs: jnp.ndarray,
    image_size: int = 299,
    quantize_input: bool = False,
    resize_method: str = "bilinear",
) -> jnp.ndarray:
    """[-1,1] NHWC at any scale → [-1,1] at (image_size, image_size).

    ``quantize_input`` rounds through uint8 first — the pytorch-fid
    "features of the saved PNG" protocol; quantization must precede the
    resize (the file on disk is quantized, the interpolation is not)."""
    if quantize_input:
        u = jnp.clip(jnp.floor((imgs + 1.0) * 127.5 + 0.5), 0.0, 255.0)
        imgs = u / 127.5 - 1.0
    return jax.image.resize(
        imgs,
        (imgs.shape[0], image_size, image_size, imgs.shape[-1]),
        method=resize_method,
    )


class InceptionFeatures:
    """Holds an InceptionV3 + its variables and exposes batched extraction."""

    def __init__(
        self,
        variables: Any | None = None,
        num_classes: int = 1000,
        rng_seed: int = 0,
        image_size: int = 299,
        mesh: Any | None = None,
        quantize_input: bool = False,
        resize_method: str = "bilinear",
    ):
        """``mesh``: a 1-D data mesh → batches shard over it and the
        Inception pass runs SPMD (BASELINE.json's pod-sharded eval), with
        params replicated. None = single device. ``quantize_input``/
        ``resize_method``: see :func:`preprocess` (pytorch-fid protocol
        parity knobs; defaults = the framework's exact continuous path)."""
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
            imgs = preprocess(imgs, image_size, quantize_input, resize_method)
            out = self.model.apply(variables, imgs, train=False)
            return out["pool3"], out["logits"]

        self._fwd = _fwd

    def extract(
        self, images: np.ndarray, batch_size: int = 64
    ) -> tuple[np.ndarray, np.ndarray]:
        """[N,H,W,3] in [-1,1] → (pool3 [N,2048], logits [N,C]).

        Depth-1 dispatch pipeline: each batch's device program is dispatched
        BEFORE the previous batch's readback is forced, so the host blocks
        on batch i's device→host bytes while the device computes batch i+1
        (features are bitwise identical to the serial loop — only the
        forcing order changes; tests/test_eval.py pipelining test)."""
        n = images.shape[0]
        pools, logits = [], []
        pending: tuple[Any, Any, int] | None = None

        def _finalize(p, l, pad):
            p, l = np.asarray(p), np.asarray(l)
            if pad:
                p, l = p[:-pad], l[:-pad]
            pools.append(p)
            logits.append(l)

        for i in range(0, n, batch_size):
            b = np.asarray(images[i : i + batch_size], dtype=np.float32)
            pad = batch_size - b.shape[0]
            if pad:
                b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
            bj = jnp.asarray(b)
            if self.mesh is not None:
                bj = jax.device_put(bj, self._batch_sharding)
            p, l = self._fwd(self.variables, bj)
            if pending is not None:
                _finalize(*pending)
            pending = (p, l, pad)
        if pending is not None:
            _finalize(*pending)
        return np.concatenate(pools), np.concatenate(logits)
