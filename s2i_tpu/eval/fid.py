"""Fréchet Inception Distance (SURVEY.md §2 "FID"): on-device pool3
features, host-side Gaussian statistics + matrix square root (scipy) —
the 2048×2048 sqrtm is a one-off host op, everything batched stays on TPU.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg

from s2i_tpu.eval.features import InceptionFeatures


def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    features = np.asarray(features, dtype=np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def fid_from_stats(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean)
    )


def fid_score(
    images1: np.ndarray,
    images2: np.ndarray,
    extractor: InceptionFeatures,
    batch_size: int = 64,
) -> float:
    """FID between two image sets ([N,H,W,3] in [-1,1] each)."""
    f1, _ = extractor.extract(images1, batch_size)
    f2, _ = extractor.extract(images2, batch_size)
    return fid_from_stats(*gaussian_stats(f1), *gaussian_stats(f2))
