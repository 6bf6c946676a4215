"""L3 training/eval engines (SURVEY.md §1 L3): jitted XLA train steps.

- ``s2i_tpu.train.gan``     — alternating G/D conditional-GAN training
  (reference ``trainer.py`` ``condGANTrainer``), one XLA program per step.
- ``s2i_tpu.train.encoder`` — speech-encoder distillation pretraining
  (reference ``train_audio_encoder.py``) and embedding extraction.
- ``s2i_tpu.train.losses``  — BCE-with-logits GAN losses, KL, color
  consistency, distillation losses.
"""
