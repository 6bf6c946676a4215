"""L5 metrics (SURVEY.md §1 L5, §2 rows "Inception Score"/"FID"/"Retrieval
eval"): on-device Inception feature/logit extraction, IS (10-split protocol),
FID (host-side sqrtm of the 2048² covariance product), and speech↔image
retrieval R@K / mAP.

Fine-tuned Inception weights (StackGAN protocol: Inception fine-tuned on
CUB / Oxford) are a declared external asset; the plumbing runs with any
weights and the tests use stubs (SURVEY.md §4 "Eval"): FID(X, X) = 0 and
IS(uniform logits) = 1 hold regardless of the classifier.
"""

from s2i_tpu.eval.features import InceptionFeatures
from s2i_tpu.eval.inception_score import inception_score, inception_score_from_probs
from s2i_tpu.eval.fid import fid_from_stats, fid_score, gaussian_stats
from s2i_tpu.eval.retrieval import retrieval_metrics

__all__ = [
    "InceptionFeatures",
    "inception_score",
    "inception_score_from_probs",
    "fid_from_stats",
    "fid_score",
    "gaussian_stats",
    "retrieval_metrics",
]
