"""L2 models (SURVEY.md §1 L2, §2 rows 3,6–8): Flax modules, NHWC, TPU-first.

Layout note: the reference (torch) is NCHW; everything here is NHWC — the
native TPU convolution layout (SURVEY.md §7 hard-part 5). Image tensors are
``[B, H, W, 3]`` in [-1, 1].
"""

from s2i_tpu.models.encoder import SpeechEncoder
from s2i_tpu.models.ca_net import CANet
from s2i_tpu.models.generator import GNet
from s2i_tpu.models.discriminator import DNet64, DNet128, DNet256, build_discriminators
from s2i_tpu.models.inception import InceptionV3

__all__ = [
    "SpeechEncoder",
    "CANet",
    "GNet",
    "DNet64",
    "DNet128",
    "DNet256",
    "build_discriminators",
    "InceptionV3",
]
