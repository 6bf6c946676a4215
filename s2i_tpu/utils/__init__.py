"""Utilities (SURVEY.md §2 "Utils", §5): Orbax checkpointing, image grids,
scalar logging, profiling hooks."""

from s2i_tpu.utils.checkpoint import CheckpointManager
from s2i_tpu.utils.images import make_image_grid, save_image_grid, to_uint8
from s2i_tpu.utils.logging import ScalarLogger

__all__ = [
    "CheckpointManager",
    "make_image_grid",
    "save_image_grid",
    "to_uint8",
    "ScalarLogger",
]
