"""Checkpoint porters: reference torch checkpoints → Flax trees.

- :mod:`s2i_tpu.port.stackgan_torch` — ``netG.pth`` / ``netD*.pth``
  (StackGAN-v2-lineage GAN; CLI: ``scripts/port_torch_gan.py``)
- :mod:`s2i_tpu.port.audio_encoder_torch` — best-effort structural port of
  ``audio_encoder/`` speech-encoder checkpoints (topology-matched, loud
  failure; validate outputs — the reference layout is [?]-tagged)
- the fine-tuned Inception porter lives in :mod:`s2i_tpu.eval.weights`
  (it belongs to the IS/FID protocol stack)
"""

from s2i_tpu.port.audio_encoder_torch import port_encoder  # noqa: F401
from s2i_tpu.port.stackgan_torch import (  # noqa: F401
    export_dnet,
    export_gnet,
    load_torch_state_dict,
    port_dnet,
    port_dnet_scale,
    port_gnet,
)
