"""End-to-end inference pipeline: speech waveform → image, one jitted XLA
program (the paper's headline capability — SURVEY.md §1 "direct
speech-to-image", no text anywhere in the path):

    wav → Pallas log-mel frontend → SpeechEncoder → CA (μ) → G_NET → RGB

Used by ``scripts/speech_to_image.py`` and importable directly:

    pipe = SpeechToImage.from_checkpoints(cfg, encoder_ckpt, gan_ckpt)
    images = pipe.generate(wavs, wav_lens, seed=0)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from s2i_tpu.audio import extract_features, frontend_params_from_cfg
from s2i_tpu.train import encoder as enc_train
from s2i_tpu.train import gan as gan_train


class SpeechToImage:
    def __init__(self, cfg, enc_state, gan_state, use_ema: bool = True):
        self.cfg = cfg
        self.p = frontend_params_from_cfg(cfg.AUDIO)
        # Joint-finetuned checkpoints (TRAIN.JOINT_FT — the paper's headline
        # mode) carry the fine-tuned speech encoder inside the GAN state
        # ('enc' subtrees); use it in preference to a separate pretrain
        # encoder state.
        joint = "enc" in gan_state.g_params
        self.models = gan_train.build_models(cfg, joint=joint)
        if joint:
            self.encoder = self.models.encoder
        else:
            if enc_state is None:
                raise ValueError(
                    "enc_state is required for non-joint GAN checkpoints"
                )
            self.encoder = enc_train.build_encoder(cfg)
        self.enc_state = enc_state
        self.gan_state = gan_state
        self.use_ema = use_ema
        z_dim = int(cfg.GAN.Z_DIM)
        # auto: fused-framing Pallas kernel on TPU, jnp elsewhere (docs/PERF.md)
        use_pallas = None

        @functools.partial(jax.jit, static_argnames=("branch", "quantize"))
        def _generate(
            enc_state, gan_state, wavs, wav_lens, rng, branch, quantize=False
        ):
            feats, mask = extract_features(
                wavs, self.p, use_pallas=use_pallas, wav_len=wav_lens
            )
            if joint:
                enc_vars = {
                    "params": gan_state.g_params["enc"],
                    "batch_stats": gan_state.g_stats["enc"],
                }
            else:
                enc_vars = {
                    "params": enc_state.params,
                    "batch_stats": enc_state.batch_stats,
                }
            out = self.encoder.apply(enc_vars, feats, mask, train=False)
            emb = out[0] if isinstance(out, tuple) else out
            params = (
                gan_state.ema_g
                if (use_ema and gan_state.ema_g)
                else {
                    "ca": gan_state.g_params["ca"],
                    "g": gan_state.g_params["g"],
                }
            )
            c, _, _ = self.models.ca.apply(
                {"params": params["ca"]}, emb, train=False
            )
            z = jax.random.normal(rng, (wavs.shape[0], z_dim), jnp.float32)
            imgs = self.models.g.apply(
                {"params": params["g"], "batch_stats": gan_state.g_stats["g"]},
                z,
                c,
                train=False,
            )
            img = imgs[branch]
            if quantize:
                # device-side PNG-ready bytes (same formula as
                # utils.images.to_uint8): 4x less device→host readback —
                # the serving path's dominant cost on thin links.
                img = jnp.clip(
                    (img + 1.0) * 127.5 + 0.5, 0.0, 255.0
                ).astype(jnp.uint8)
            return img

        self._generate = _generate

    @classmethod
    def from_checkpoints(
        cls,
        cfg,
        encoder_ckpt: str | None,
        gan_ckpt: str,
        use_ema: bool = True,
    ) -> "SpeechToImage":
        """Restore from Orbax checkpoint directories.

        The GAN restore template honors ``cfg.TRAIN.JOINT_FT``: joint-trained
        checkpoints contain 'enc' subtrees in g_params/g_stats, and the
        fine-tuned encoder they carry is what ``generate`` uses — so
        ``encoder_ckpt`` may be None/"" in joint mode.
        """
        from s2i_tpu.utils import CheckpointManager

        p = frontend_params_from_cfg(cfg.AUDIO)
        joint = bool(cfg.TRAIN.JOINT_FT)
        enc_state = None
        if encoder_ckpt:
            encoder = enc_train.build_encoder(cfg)
            dummy = {
                "feats": np.zeros((1, p.max_frames, p.n_features), np.float32),
                "feat_mask": np.ones((1, p.max_frames), bool),
            }
            enc_state = enc_train.init_encoder_state(
                cfg, encoder, jax.random.key(0), dummy
            )
            mgr = CheckpointManager(encoder_ckpt)
            restored = mgr.restore_latest(enc_state)
            if restored is None:
                raise FileNotFoundError(
                    f"no encoder checkpoint in {encoder_ckpt}"
                )
            enc_state = restored[0]
            mgr.close()
        elif not joint:
            raise ValueError(
                "encoder_ckpt is required unless cfg.TRAIN.JOINT_FT is on "
                "(joint GAN checkpoints embed the fine-tuned encoder)"
            )

        models = gan_train.build_models(cfg, joint=joint)
        b = 1
        branch = int(cfg.TREE.BRANCH_NUM)
        dummy_gan = {
            "images": tuple(
                np.zeros((b, 64 * 2**i, 64 * 2**i, 3), np.float32)
                for i in range(branch)
            ),
            "embedding": np.zeros((b, int(cfg.TEXT.DIMENSION)), np.float32),
        }
        if joint:
            dummy_gan["feats"] = np.zeros(
                (b, p.max_frames, p.n_features), np.float32
            )
            dummy_gan["feat_mask"] = np.ones((b, p.max_frames), bool)
        gan_state = gan_train.init_state(
            cfg, models, jax.random.key(0), dummy_gan
        )
        mgr = CheckpointManager(gan_ckpt)
        restored = mgr.restore_latest(gan_state)
        if restored is None:
            raise FileNotFoundError(f"no GAN checkpoint in {gan_ckpt}")
        gan_state = restored[0]
        mgr.close()
        return cls(cfg, enc_state, gan_state, use_ema)

    def generate(
        self,
        wavs: np.ndarray,
        wav_lens: np.ndarray | None = None,
        seed: int = 0,
        stage: int = -1,
        output_dtype: str = "float32",
    ) -> np.ndarray:
        """wavs [B, n_samples] float32 in [-1,1] → images [B, S, S, 3] at the
        requested stage (-1 = highest resolution). ``output_dtype="float32"``
        returns [-1,1] floats; ``"uint8"`` quantizes to [0,255] ON DEVICE
        (identical bytes to utils.images.to_uint8, 4x less readback — what
        the serving layer uses)."""
        return np.asarray(
            self.generate_async(wavs, wav_lens, seed, stage, output_dtype)
        )

    def generate_async(
        self,
        wavs: np.ndarray,
        wav_lens: np.ndarray | None = None,
        seed: int = 0,
        stage: int = -1,
        output_dtype: str = "float32",
    ) -> jax.Array:
        """:meth:`generate` without the host sync: returns the on-device
        result array as soon as the program is dispatched (JAX async
        dispatch), letting the caller overlap the device compute of batch
        i+1 with the device→host readback of batch i — the serving
        collator's pipelining hook (``np.asarray`` on the result blocks
        until it is materialized on host). Note the ``jnp.asarray(wavs)``
        host→device INPUT transfer below still happens synchronously in
        the caller's thread (nontrivial on a thin relay link); only the
        compute and the output readback are overlapped."""
        wavs = jnp.asarray(wavs, jnp.float32)
        if wav_lens is None:
            wav_lens = jnp.full((wavs.shape[0],), wavs.shape[1], jnp.int32)
        branch = int(self.cfg.TREE.BRANCH_NUM)
        if not -branch <= stage < branch:
            # reject instead of silently wrapping (stage=3 on a 3-branch
            # model would otherwise return the 64px lowest stage); the
            # exported-artifact path raises the same way (export.py)
            raise ValueError(
                f"stage {stage} out of range for BRANCH_NUM={branch} "
                f"(valid: {-branch}..{branch - 1}, -1 = highest)"
            )
        stage = stage % branch
        return self._generate(
            self.enc_state,
            self.gan_state,
            wavs,
            jnp.asarray(wav_lens, jnp.int32),
            jax.random.key(seed),
            stage,
            quantize=output_dtype == "uint8",
        )

    def generate_files(
        self, wav_paths: list[str], out_paths: list[str], seed: int = 0
    ) -> None:
        """wav files → PNG files (host IO + one device pass)."""
        from s2i_tpu.audio.wavio import read_wav, resample_linear
        from PIL import Image

        p = self.p
        max_samples = (p.max_frames - 1) * p.hop_length + p.win_length
        wavs = np.zeros((len(wav_paths), max_samples), np.float32)
        lens = np.zeros(len(wav_paths), np.int32)
        for i, path in enumerate(wav_paths):
            x, sr = read_wav(path)
            x = resample_linear(x, sr, p.sample_rate)
            m = min(len(x), max_samples)
            wavs[i, :m] = x[:m]
            lens[i] = m
        imgs = self.generate(wavs, lens, seed, output_dtype="uint8")
        for img, out in zip(imgs, out_paths):
            Image.fromarray(img).save(out)
