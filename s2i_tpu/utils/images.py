"""Image utilities (SURVEY.md §2 "Utils"): grid saving for training snapshots
and sample dumps (reference ``miscc/utils.py`` save_img_results)."""

from __future__ import annotations

import os

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float image(s) → uint8."""
    img = np.asarray(img, dtype=np.float32)
    return np.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)


def make_image_grid(
    images: np.ndarray, nrow: int = 8, pad: int = 2
) -> np.ndarray:
    """[N, H, W, 3] images in [-1,1] → one uint8 grid image."""
    images = to_uint8(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrow_out = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrow_out * (h + pad) - pad, ncol * (w + pad) - pad, c), np.uint8
    )
    for i, im in enumerate(images):
        r, cidx = divmod(i, ncol)
        grid[r * (h + pad) : r * (h + pad) + h, cidx * (w + pad) : cidx * (w + pad) + w] = im
    return grid


def save_image_grid(
    images: np.ndarray, path: str, nrow: int = 8, pad: int = 2
) -> np.ndarray:
    """Save [N, H, W, 3] images in [-1,1] as one PNG grid; returns the
    composed uint8 grid (so callers can mirror it, e.g. into TensorBoard)."""
    from PIL import Image

    grid = make_image_grid(images, nrow=nrow, pad=pad)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)
    return grid


def save_images(images: np.ndarray, directory: str, names: list[str]) -> None:
    """Save individual PNGs (sampling/eval output tree, SURVEY.md §3.4)."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    for im, name in zip(to_uint8(images), names):
        Image.fromarray(im).save(os.path.join(directory, name))
