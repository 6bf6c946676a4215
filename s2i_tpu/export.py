"""AOT deployment artifacts for the speech→image pipeline (jax.export).

A production serving host should not need the Python model zoo to run
inference — it needs a hermetic, versioned artifact. This module serializes
the full wav→image program (frontend → encoder → CA → G, weights baked in
as constants) to StableHLO via ``jax.export`` and loads it back into a
drop-in replacement for :class:`s2i_tpu.pipeline.SpeechToImage.generate`:

    pipe = SpeechToImage.from_checkpoints(cfg, enc_ckpt, gan_ckpt)
    export_pipeline(pipe, "/models/s2i_v1", batch_sizes=(1, 8))

    loaded = load("/models/s2i_v1")          # no cfg, no checkpoints
    imgs = loaded.generate(wavs, wav_lens, seed=0)

The artifact directory holds one serialized program per batch size
(``model_b{N}.shlo``) plus ``meta.json`` (shapes, stage resolution, output
dtype, platform, format version). ``load`` picks the smallest exported
batch ≥ the request and zero-pads (the same policy as the serving
micro-batcher).

Programs are exported for the platform they were traced on (the TPU
lowering includes the Mosaic kernels; CPU exports use the interpret-free
jnp paths) — ``load`` refuses a platform mismatch rather than miscompiling.

Fidelity: on CPU the artifact reproduces the live pipeline bit-for-bit
(tests/test_export.py). On TPU the artifact and the live program are two
separate XLA compilations of the same StableHLO, whose fusion choices may
differ in the last fp32 ulp — measured on-chip at 1/98304 uint8 pixels
flipping by ±1 at a quantization boundary (round-3 validation). Treat TPU
artifacts as equal within ±1 quantization step, not bit-identical.

No reference analogue (the reference serves from a live torch process —
SURVEY.md §2 "Sampler / eval driver"); this is the TPU-native deployment
story: one StableHLO blob, XLA AOT-compiles it at load, zero Python model
code on the serving host.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT_VERSION = 1


class _InFlightChunks:
    """Dispatched-but-not-read-back result of a chunked artifact call.

    Holds the on-device chunk arrays; ``np.asarray`` on it forces the
    device→host readback of every chunk and concatenates (trimming the
    batch padding) — the same lazy contract a raw ``jax.Array`` gives the
    serving collator's depth-1 pipeline."""

    def __init__(self, parts):
        self._parts = parts  # [(device_img, n_real_rows), ...]

    def __array__(self, dtype=None, copy=None):
        out = np.concatenate(
            [np.asarray(img)[:n] for img, n in self._parts], axis=0
        )
        if dtype is not None:
            out = out.astype(dtype, copy=False)
        return out


def _infer_fn(pipe, stage: int, quantize: bool):
    """Close the pipeline's jitted generate over its states: weights become
    program constants, leaving (wavs, wav_lens, seed) as the only inputs."""
    enc_state, gan_state = pipe.enc_state, pipe.gan_state

    def infer(wavs, wav_lens, seed):
        rng = jax.random.key(seed)
        return pipe._generate(
            enc_state, gan_state, wavs, wav_lens, rng, stage, quantize
        )

    return infer


def export_pipeline(
    pipe,
    out_dir: str,
    batch_sizes: tuple[int, ...] = (1, 8),
    stage: int = -1,
    quantize: bool = True,
) -> dict:
    """Serialize the wav→image program for each batch size; returns meta."""
    from jax import export as jexport

    p = pipe.p
    branch = int(pipe.cfg.TREE.BRANCH_NUM)
    stage = stage % branch
    max_samples = (p.max_frames - 1) * p.hop_length + p.win_length
    os.makedirs(out_dir, exist_ok=True)

    fn = _infer_fn(pipe, stage, quantize)
    files, platforms = {}, None
    for b in sorted(set(int(x) for x in batch_sizes)):
        exp = jexport.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((b, max_samples), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        platforms = list(exp.platforms)
        name = f"model_b{b}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        files[str(b)] = name
    meta = {
        "format_version": _FORMAT_VERSION,
        "platforms": platforms,
        "batch_sizes": sorted(int(b) for b in files),
        "files": files,
        "max_samples": int(max_samples),
        "sample_rate": int(p.sample_rate),
        # frontend frame geometry so LoadedPipeline can present the same
        # `.p` surface Batcher/make_server read from a live pipeline
        "max_frames": int(p.max_frames),
        "hop_length": int(p.hop_length),
        "win_length": int(p.win_length),
        "stage": int(stage),
        "image_size": 64 * 2**stage,
        "output_dtype": "uint8" if quantize else "float32",
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class LoadedPipeline:
    """Deserialized artifact with the :meth:`SpeechToImage.generate` calling
    convention (drop-in for ``serving.make_server``'s pipe argument)."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} != "
                f"supported {_FORMAT_VERSION}"
            )
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"artifact exported for {self.meta['platforms']}, "
                f"current backend is {backend!r}"
            )
        self._programs = {}
        for b, name in self.meta["files"].items():
            with open(os.path.join(path, name), "rb") as f:
                self._programs[int(b)] = jexport.deserialize(f.read())
        self.batch_sizes = sorted(self._programs)
        self.max_samples = int(self.meta["max_samples"])
        # serving.Batcher/make_server read frontend geometry via `pipe.p`
        from types import SimpleNamespace

        self.p = SimpleNamespace(
            sample_rate=int(self.meta["sample_rate"]),
            max_frames=int(self.meta["max_frames"]),
            hop_length=int(self.meta["hop_length"]),
            win_length=int(self.meta["win_length"]),
        )

    def generate(
        self,
        wavs: np.ndarray,
        wav_lens: np.ndarray | None = None,
        seed: int = 0,
        stage: int = -1,
        output_dtype: str | None = None,
    ) -> np.ndarray:
        """wavs [B, n] → images; pads/crops wavs to the exported length and
        B up to the smallest exported batch ≥ B (trimming the output).

        Requests that fit one exported batch run one program call with
        ``seed`` and are bit-equal to the live pipeline at that batch.
        Larger requests split into chunks of the biggest exported batch;
        chunk ``i`` runs with ``seed + i * 2654435761`` (mod 2^32) so every
        row draws a distinct latent (a single shared seed would repeat the
        same z block per chunk and collapse sample diversity) WITHOUT
        aliasing adjacent user seeds (a plain ``seed + i`` derivation makes
        ``generate(seed=k)``'s chunk 1 reuse ``generate(seed=k+1)``'s
        chunk-0 draws — two "independent" sampling runs sharing latents).
        Chunk 0 is the caller's seed, so single-chunk calls stay bit-equal
        to the live pipeline.

        ``stage``/``output_dtype`` are baked into the artifact; passing a
        conflicting value raises rather than silently serving the wrong
        resolution."""
        return np.asarray(
            self.generate_async(wavs, wav_lens, seed, stage, output_dtype)
        )

    def generate_async(
        self,
        wavs: np.ndarray,
        wav_lens: np.ndarray | None = None,
        seed: int = 0,
        stage: int = -1,
        output_dtype: str | None = None,
    ):
        """:meth:`generate` without the host sync — the serving collator's
        pipelining hook (``serving.Batcher._run`` dispatches batch i+1
        through this before forcing batch i's readback). Returns the
        on-device array for a single exact-fit program call, or an
        :class:`_InFlightChunks` view for padded/chunked requests; either
        way ``np.asarray`` on the result blocks until the images are on
        host. The host→device input transfer still happens synchronously
        in the caller's thread; only compute + readback are overlapped."""
        if stage != -1 and stage != int(self.meta["stage"]):
            raise ValueError(
                f"artifact was exported at stage {self.meta['stage']}; "
                f"re-export for stage {stage}"
            )
        if output_dtype and output_dtype != self.meta["output_dtype"]:
            raise ValueError(
                f"artifact emits {self.meta['output_dtype']}; "
                f"re-export for {output_dtype}"
            )
        wavs = np.asarray(wavs, np.float32)
        b, n = wavs.shape
        if wav_lens is None:
            wav_lens = np.full((b,), n, np.int32)
        wav_lens = np.minimum(
            np.asarray(wav_lens, np.int32), self.max_samples
        )
        buf = np.zeros((b, self.max_samples), np.float32)
        m = min(n, self.max_samples)
        buf[:, :m] = wavs[:, :m]

        fits = [bb for bb in self.batch_sizes if bb >= b]
        bb = fits[0] if fits else self.batch_sizes[-1]
        parts = []
        for ci, start in enumerate(range(0, b, bb)):
            chunk = buf[start : start + bb]
            lens = wav_lens[start : start + bb]
            nb = chunk.shape[0]
            if nb < bb:
                chunk = np.concatenate(
                    [chunk, np.zeros((bb - nb, self.max_samples), np.float32)]
                )
                lens = np.concatenate(
                    [lens, np.full((bb - nb,), self.max_samples, np.int32)]
                )
            img = self._programs[bb].call(
                jnp.asarray(chunk),
                jnp.asarray(lens),
                jnp.asarray(
                    # mask first: NumPy 2 raises OverflowError converting a
                    # negative/out-of-range Python int to uint32, but the
                    # live pipeline accepts any int seed (jax.random.key
                    # folds it) — keep the artifact drop-in compatible
                    np.uint32(int(seed) & 0xFFFFFFFF)
                    + np.uint32(ci) * np.uint32(2654435761)
                ).astype(jnp.int32),
            )
            parts.append((img, nb))
        if len(parts) == 1 and parts[0][1] == bb:
            return parts[0][0]  # exact fit: the device array itself
        return _InFlightChunks(parts)


def load(path: str) -> LoadedPipeline:
    return LoadedPipeline(path)
