"""L1 data layer (SURVEY.md §1 L1): pipelines yielding multi-scale images +
embeddings (+ audio features in joint/encoder modes).

- ``synthetic``  — deterministic fixture datasets (no real assets required);
  this is what tests and the smoke configs use (SURVEY.md §7 step 3).
- ``stackgan``   — real CUB-200 / Oxford-102 loaders reading the StackGAN
  pickle layout (``char-CNN-RNN-embeddings.pickle``, ``filenames.pickle``,
  ``class_info.pickle``) + image dirs + speech-caption wav dirs; exercised
  when the external assets exist.
- ``pipeline``   — batching/shuffling/prefetch host pipeline.
"""

from s2i_tpu.data.synthetic import SyntheticGanDataset, SyntheticSpeechDataset

__all__ = ["SyntheticGanDataset", "SyntheticSpeechDataset"]
