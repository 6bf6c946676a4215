"""Config system: attribute-dict tree + YAML merge + CLI overrides.

Mirrors the reference's easydict-global-``cfg`` + ``cfg_from_file`` surface
(reference: ``miscc/config.py`` per SURVEY.md §2 "Config system" — key names
``TRAIN.BATCH_SIZE``, ``GAN.GF_DIM``, ``TEXT.DIMENSION`` etc. are kept
identical so reference YAML files and scripts port over unchanged), but the
default tree here is explicit and documented, and configs are *values* you
pass around rather than process-global state (a module-level ``cfg`` is still
exported for script parity).

Every audio-frontend hyperparameter that SURVEY.md tags unverified ([?]) is a
knob in the ``AUDIO`` block.
"""

from __future__ import annotations

import copy
import io
from typing import Any, Mapping

import yaml


class AttrDict(dict):
    """dict with attribute access, recursive over nested mappings."""

    def __init__(self, *args: Any, **kwargs: Any):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if isinstance(v, Mapping) and not isinstance(v, AttrDict):
                self[k] = AttrDict(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if isinstance(value, Mapping) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        self[name] = value

    def __deepcopy__(self, memo: dict) -> "AttrDict":
        return AttrDict(
            {k: copy.deepcopy(v, memo) for k, v in self.items()}
        )


def default_cfg() -> AttrDict:
    """The full default config tree (StackGAN-v2-lineage key names)."""
    return AttrDict(
        {
            "CONFIG_NAME": "default",
            "DATASET_NAME": "birds",
            "DATA_DIR": "data/birds",
            "OUTPUT_DIR": "output",
            "GPU_ID": "0",  # kept for script parity; ignored on TPU
            "WORKERS": 4,
            "SEED": 0,
            "CUDA": False,  # parity knob; meaningless on TPU
            "TREE": {
                # BRANCH_NUM: number of G stages / D scales (1..3).
                "BRANCH_NUM": 3,
                "BASE_SIZE": 64,
            },
            "TRAIN": {
                "FLAG": True,
                "BATCH_SIZE": 24,
                "MAX_EPOCH": 600,
                "SNAPSHOT_INTERVAL": 2000,
                "DISCRIMINATOR_LR": 2.0e-4,
                "GENERATOR_LR": 2.0e-4,
                # "adam" (reference parity) or "sgd" (plain; used by the
                # multi-device == single-device equivalence test, where
                # Adam's sign-like first step would amplify fp32 noise).
                "OPTIMIZER": "adam",
                "ADAM_BETA1": 0.5,
                "ADAM_BETA2": 0.999,
                # Adam moment storage dtype for LARGE param leaves
                # ("float32" | "bfloat16"): bf16 halves the optimizer-state
                # HBM traffic of the giant D kernels the profile flags
                # (fp32 math per step, only the stored m/v round). Leaves
                # smaller than MOMENT_DTYPE_MIN_SIZE elements always keep
                # fp32 moments. On-chip A/B (docs/PERF.md round 3): bf16 is
                # +2.4% imgs/sec at b24, +1.0% at b96. Default stays fp32 —
                # exact stock-Adam parity with the reference recipe; flip for
                # throughput runs (quality-guard test in tests/test_train_gan).
                "MOMENT_DTYPE": "float32",
                "MOMENT_DTYPE_MIN_SIZE": 262144,
                "NET_G": "",
                "NET_D": "",
                "NET_E": "",  # speech-encoder checkpoint (joint finetune)
                "B_NET_D": True,
                "COEFF": {
                    "KL": 2.0,
                    "UNCOND_LOSS": 1.0,
                    # StackGAN-v2 color-consistency regularizer; coefficient
                    # unverified in the reference (SURVEY.md §2 [?]) — off by
                    # default, enable via cfg.
                    "COLOR_LOSS": 0.0,
                    # joint-finetune distillation regularizer weight
                    "DISTILL": 0.0,
                },
                # Wrong-pair conditions for the conditional D loss:
                # "roll" = shift-the-batch-by-one (reference parity — two
                # same-class neighbors make the "wrong" pair actually right,
                # common on CUB at batch 24); "class_aware" = smallest shift
                # whose class differs (needs class_id in the batch).
                "WRONG_PAIR": "roll",
                # Flags for the encoder-in-the-loop ("joint") mode (§3.5).
                "JOINT_FT": False,
                # Debug/observability (SURVEY.md §5): per-step finiteness
                # guard (costs one host sync per step) and a jax.profiler
                # trace of steps ~5-10 written to this dir when non-empty.
                "DEBUG_NANS": False,
                "PROFILE_DIR": "",
                # Mirror JSONL scalars into TensorBoard event files under
                # <run_dir>/tb (the reference's tensorboard logging; JSONL
                # stays the primary sink either way).
                "TENSORBOARD": False,
                # Polyak-averaged copy of G used for snapshots/sampling
                # (StackGAN-v2 lineage keeps avg_param_G with decay 0.999);
                # 0 disables.
                "EMA_G": 0.999,
                # Track raw params exactly for this many steps before the
                # Polyak average engages (early params swing through modes
                # whose average is off-manifold mean color; see
                # train/gan.py). 0 = classic cold-start EMA.
                "EMA_WARMUP": 0,
            },
            "GAN": {
                "DF_DIM": 64,
                "GF_DIM": 64,
                "Z_DIM": 100,
                "EMBEDDING_DIM": 128,  # CA-net condition dim
                "R_NUM": 2,  # residual blocks per next-stage
                "REMAT": False,  # rematerialize G stages in backward
                # What REMAT may save: "none" = classic full remat (stages
                # recompute everything, +13% step FLOPs at b192);
                # "conv" = save conv/matmul outputs, recompute only the
                # elementwise BN/GLU chains (cheap FLOPs, most of the
                # activation memory still freed). See models/generator.py.
                "REMAT_POLICY": "none",
                # Upsample-conv formulation in G's up-blocks: "naive" |
                # "fused" | "fused4" | "transpose" | "transpose_cvjp"
                # (custom input-gradient that avoids XLA's 100 MB spatial
                # reverse in the backward; see layers.UpConv3x3;
                # all are the same math and checkpoint-compatible — safe to
                # flip mid-run). "transpose" (lhs-dilated conv, 2.25× fewer
                # MACs) measured fastest on v5e: 516 vs 490 imgs/sec over
                # "naive" (docs/PERF.md has the full A/B).
                "UPSAMPLE_MODE": "transpose",
                # Batch real|fake through one D-trunk dispatch (and the three
                # condition pairings through one heads dispatch) with
                # per-segment BN stats — same math as the sequential passes
                # (models.layers.GroupedBatchNorm), fewer/larger MXU kernels.
                # On-chip A/B: +6.7% imgs/sec at batch 24; ~-1% at batch 96
                # where kernels are already full. "auto" (default) resolves
                # from TRAIN.BATCH_SIZE when the step is built — on below
                # 96, off at ≥96; pin with an explicit bool.
                "D_TRUNK_BATCH": "auto",
                # Space-to-depth recoding of the TOP scale inside the train
                # step (the HBM-bound low-channel 256² stages): G's top
                # up-block + to-RGB run at 128²×4C, D256's first conv and the
                # color loss consume the s2d image directly — the interleaved
                # 256² tensor never exists in the hot loop. Exact same math
                # and parameter tree (layers.S2DConv/UpBlockGLU docstrings);
                # sampling always emits standard images; checkpoints
                # interchange freely. On-chip A/B (docs/PERF.md round 3):
                # +8.9% imgs/sec at the reference-recipe batch 24, −7.8% at
                # batch 48 and −11% at batch 96 where kernels are full.
                # "auto" (default) resolves from TRAIN.BATCH_SIZE when the
                # step is built — on below 32 (the measured crossover lies
                # in (24, 48)); pin with an explicit bool.
                "S2D": "auto",
                # Extend the s2d recode to the MIDDLE scales (the 128² stage
                # of a 3-branch tree): that stage's G up-block/to-RGB and its
                # D's first conv run in s2d layout; one depth_to_space layout
                # op feeds the next stage interleaved. Exact math, same
                # params (tests). On-chip A/B (docs/PERF.md round 3):
                # −2.2% at b24 — the zero-expanded first-conv MACs outweigh
                # the 4×-smaller 128² HBM chains, so this stays OFF ("auto"
                # == off; explicit True pins it on for experiments).
                "S2D_MID": False,
                "NETWORK_TYPE": "default",
                "B_CONDITION": True,
            },
            "DATA": {
                # L1 input pipeline (SURVEY.md §1 "L1 → Grain + host
                # decode"): "native" = C++ libjpeg loader + thread pool
                # (PIL backfill for odd formats), "grain" = Grain
                # MapDataset with optional multiprocess prefetch,
                # "pil" = pure-PIL decode (debugging baseline).
                "PIPELINE": "native",
                # Grain multiprocess prefetch workers (0 = in-process).
                "GRAIN_WORKERS": 0,
                # Image transfer dtype: "uint8" ships raw [0,255] pixels and
                # normalizes on device inside the jitted step (4x fewer
                # host→device bytes per batch); "float32" normalizes
                # host-side to [-1,1] (reference layout).
                "IMAGE_DTYPE": "uint8",
                # "top" ships only the largest scale host→device; the jitted
                # step derives the smaller scales by the identical 2× area
                # pool (train.gan.expand_image_pyramid). "all" ships the full
                # per-scale pyramid (reference layout).
                "SHIP_SCALES": "top",
                # DCT-scaled JPEG decode in the native loader (libjpeg M/8
                # scaling chosen so the scaled crop region still covers the
                # resize target). Opt-in throughput knob for decode-bound
                # hosts: output differs slightly from the full-res decode
                # (coarser bilinear source grid), so the default stays off.
                "FAST_DECODE": False,
            },
            "TEXT": {
                # Teacher (char-CNN-RNN) embedding dim == speech-encoder output.
                "DIMENSION": 1024,
                "CAPTIONS_PER_IMAGE": 10,
                # Which per-split embedding pickle conditions the GAN:
                # the teacher text embeddings (StackGAN distribution) or our
                # extracted speech embeddings (the paper's headline setting).
                "EMBEDDING_FILE": "char-CNN-RNN-embeddings.pickle",
            },
            "AUDIO": {
                # SURVEY.md §2 row 1: paper-style frontend, all [?]-grade
                # values kept as knobs.
                "SAMPLE_RATE": 16000,
                "WIN_MS": 25.0,
                "HOP_MS": 10.0,
                "N_FFT": 512,
                "N_MELS": 40,
                "FMIN": 0.0,
                "FMAX": 8000.0,
                "HTK_MEL": False,  # False = Slaney-style mel (librosa default)
                "MEL_NORM": "slaney",  # 'slaney' area-norm or 'none'
                "LOG_OFFSET": 1.0e-6,
                "MAX_FRAMES": 1024,  # fixed-length crop/pad target
                "NORMALIZE": "utterance",  # 'utterance' mean-var | 'none'
                "FEATURE": "logmel",  # 'logmel' | 'mfcc'
                "N_MFCC": 40,
                "PREEMPHASIS": 0.0,  # 0 disables
                "CENTER": False,  # frame from sample 0 (no reflect padding)
            },
            "ENCODER": {
                # Speech encoder (SURVEY.md §2 row 3): CNN + bi-GRU + pool + FC.
                "CONV_CHANNELS": [64, 128, 256],
                "CONV_KERNEL": 5,
                "CONV_STRIDE": 2,
                # "SAME" | "torch" — ported torch checkpoints need "torch"
                # (models/encoder.py conv_padding; port/audio_encoder_torch)
                "CONV_PADDING": "SAME",
                "RNN_HIDDEN": 512,
                "RNN_LAYERS": 1,
                "BIDIRECTIONAL": True,
                "POOL": "mean_max",  # 'mean' | 'max' | 'mean_max'
                "CLS_HEAD": True,  # auxiliary class-CE head for distillation
                "N_CLASSES": 200,  # CUB-200; 102 for flowers
                "LR": 1.0e-3,
                "BATCH_SIZE": 64,
                "EPOCHS": 100,
                # Pretrain-loop observability: JSONL scalars every N steps
                # (0 = epoch-end only) and mid-epoch checkpoints every N
                # steps (0 = epoch-end only).
                "LOG_EVERY": 50,
                "SNAPSHOT_INTERVAL": 1000,
                "CE_COEFF": 0.1,  # aux CE weight ([?] in SURVEY); 0 disables
                "NORM_OUT": False,  # L2-normalize the 1024-d embedding
            },
            "EVAL": {
                "NUM_SAMPLES_PER_EMB": 1,
                "IS_SPLITS": 10,
                "FID_BATCH": 64,
                "INCEPTION_WEIGHTS": "",  # path to ported fine-tuned weights
                # Re-estimate G's BatchNorm running stats under the EMA
                # (Polyak) weights with this many forward batches before
                # EMA sampling (0 = off). The averaged weights otherwise
                # run with raw-trajectory stats — the reference lineage's
                # latent flaw (torch buffers aren't averaged), catastrophic
                # when params move fast vs the EMA horizon (train/gan.py
                # make_bn_recalc_fn; docs/QUALITY.md round-4 diagnosis).
                "EMA_BN_RECALC": 0,
            },
            "MESH": {
                # Parallelism (SURVEY.md §2 parallelism rows): data-parallel is
                # what the reference has; axes beyond 'data' are open for
                # extension and exercised by the multi-chip dry run.
                "DATA_AXIS": "data",
                "NUM_DEVICES": 0,  # 0 = all visible devices
            },
            "DTYPE": {
                "COMPUTE": "bfloat16",  # matmul/conv compute dtype
                "PARAMS": "float32",
            },
        }
    )


def _merge_into(base: AttrDict, other: Mapping) -> None:
    """Recursively merge ``other`` into ``base`` (reference-style merge_cfg).

    Unknown keys are allowed (the reference's easydict also accepted them) but
    type mismatches on known scalar keys raise, to catch YAML typos early.
    """
    for k, v in other.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, Mapping):
            _merge_into(base[k], v)
        else:
            if k in base and not _types_compatible(base[k], v):
                raise TypeError(
                    f"config key {k}: expected {type(base[k]).__name__}, "
                    f"got {type(v).__name__} ({v!r})"
                )
            base[k] = AttrDict(v) if isinstance(v, Mapping) else v


def _types_compatible(old: Any, new: Any) -> bool:
    if old is None or new is None or isinstance(old, dict):
        return True
    # tri-state perf levers: "auto" default, bool override (and back)
    if "auto" in (old, new) and all(
        isinstance(x, (bool, str)) for x in (old, new)
    ):
        return True
    if isinstance(old, bool) or isinstance(new, bool):
        return isinstance(old, bool) and isinstance(new, bool)
    if type(old) is type(new):
        return True
    # int→float promotion is fine
    return isinstance(old, float) and isinstance(new, int)


def cfg_from_file(path: str, base: AttrDict | None = None) -> AttrDict:
    """Load a YAML file and merge it over the defaults (or ``base``)."""
    out = copy.deepcopy(base) if base is not None else default_cfg()
    with open(path, "r") as f:
        loaded = yaml.safe_load(f)
    if loaded:
        _merge_into(out, loaded)
    return out


def cfg_from_string(text: str, base: AttrDict | None = None) -> AttrDict:
    out = copy.deepcopy(base) if base is not None else default_cfg()
    loaded = yaml.safe_load(io.StringIO(text))
    if loaded:
        _merge_into(out, loaded)
    return out


def apply_overrides(cfg_tree: AttrDict, overrides: list[str]) -> AttrDict:
    """Apply ``KEY.SUBKEY=value`` CLI overrides (values parsed as YAML)."""
    for item in overrides:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} is not KEY=VALUE")
        node = cfg_tree
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        val = yaml.safe_load(raw)
        # same typo guard as the YAML merge path (_merge_into): the CLI is
        # MORE typo-prone than a config file, so --set TRAIN.OPTIMIZER=1
        # must fail here, not crash far from the flag
        if leaf in node and not _types_compatible(node[leaf], val):
            raise TypeError(
                f"override {key.strip()}: expected "
                f"{type(node[leaf]).__name__}, got {type(val).__name__} "
                f"({val!r})"
            )
        node[leaf] = val
    return cfg_tree


def dump_cfg(cfg_tree: AttrDict, path) -> None:
    """Dump the resolved config into the run dir (reference logs its cfg too).

    ``path``: a filesystem path, or an open text stream (e.g. sys.stdout —
    the docs/API.md one-liner printing the full key/default reference)."""
    if hasattr(path, "write"):
        yaml.safe_dump(_to_plain(cfg_tree), path, sort_keys=False)
        return
    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(cfg_tree), f, sort_keys=False)


def _to_plain(tree: Mapping) -> dict:
    return {
        k: _to_plain(v) if isinstance(v, Mapping) else v for k, v in tree.items()
    }


# Module-level cfg for script parity with the reference's global `cfg`.
cfg = default_cfg()
