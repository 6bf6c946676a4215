"""s2i_tpu — TPU-native direct speech-to-image translation framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of
``smallflyingpig/speech-to-image-translation-without-text`` (Li et al.,
"Direct Speech-to-Image Translation", IEEE JSTSP 2020, arXiv:2004.03413).

Layer map (see SURVEY.md §1):
  - ``s2i_tpu.audio``    — L0 audio frontend (log-mel/MFCC; fused Pallas kernel)
  - ``s2i_tpu.data``     — L1 data pipelines (synthetic fixtures + CUB/Oxford)
  - ``s2i_tpu.models``   — L2 Flax models (SpeechEncoder, CANet, GNet, DNet)
  - ``s2i_tpu.train``    — L3 jitted training engines (GAN, distillation, joint)
  - ``s2i_tpu.config``   — L4 config system (YAML, reference-compatible keys)
  - ``s2i_tpu.eval``     — L5 metrics (Inception Score, FID, retrieval)
  - ``s2i_tpu.parallel`` — device-mesh data parallelism (shard_map + psum)
  - ``s2i_tpu.ops``      — Pallas TPU kernels (the native acceleration layer)
  - ``s2i_tpu.port``     — reference torch checkpoint porters (netG/netD ↔ Flax)
  - ``s2i_tpu.utils``    — checkpointing (Orbax), image grids, scalar logging

Note on provenance: the read-only reference mount was empty in every session so
far (see SURVEY.md §0); the functional contract implemented here follows
SURVEY.md/BASELINE.json and the published paper, with every unverified
hyperparameter exposed as a config knob.
"""

__version__ = "0.1.0"
