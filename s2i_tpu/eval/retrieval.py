"""Speech↔image/text retrieval metrics (SURVEY.md §2 "Retrieval eval"):
cosine-similarity matrix (jitted) → R@K / medR / MRR / mAP in both
directions. Grades speech-embedding quality against the teacher space.

Protocol: the corpus has ~10 captions per image (SURVEY.md §2 "Speech
caption corpus"), so a query can have MULTIPLE positives — all targets
sharing its group id (= image id). Pass ``query_ids``/``target_ids`` to
group; with ids omitted the sets are treated as strictly paired
(positive = the diagonal). "map" is true mean Average Precision (mean
over queries of the average of precision@rank over that query's
positives); the reciprocal rank of the FIRST positive — what an earlier
revision mislabeled "map" — is reported separately as "mrr".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _cosine_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    return a @ b.T


def _rank_metrics(
    sim: np.ndarray, pos: np.ndarray, ks: tuple[int, ...]
) -> dict:
    """sim [Q,T]; pos bool [Q,T] with ≥1 positive per row."""
    if not pos.any(axis=1).all():
        raise ValueError("every query needs at least one positive target")
    order = np.argsort(-sim, axis=1, kind="stable")
    hits = np.take_along_axis(pos, order, axis=1)  # positives in rank order
    first = hits.argmax(axis=1)  # 0-based rank of the best-ranked positive
    out = {f"r@{k}": float(np.mean(hits[:, :k].any(axis=1))) for k in ks}
    out["medr"] = float(np.median(first) + 1)
    out["mrr"] = float(np.mean(1.0 / (first + 1)))
    precision_at = np.cumsum(hits, axis=1) / np.arange(1, sim.shape[1] + 1)
    ap = (precision_at * hits).sum(axis=1) / hits.sum(axis=1)
    out["map"] = float(np.mean(ap))
    return out


def retrieval_metrics(
    query_emb: np.ndarray,
    target_emb: np.ndarray,
    ks: tuple[int, ...] = (1, 5, 10),
    query_ids: np.ndarray | None = None,
    target_ids: np.ndarray | None = None,
) -> dict:
    """[Q,D]×[T,D] (+ optional group ids) → {'q2t': {...}, 't2q': {...}}.

    Without ids, Q must equal T and row i's positive is column i. With ids,
    target j is a positive for query i iff ``target_ids[j] == query_ids[i]``
    (e.g. ids = image index, repeated over each image's 10 captions).
    """
    if query_ids is None and target_ids is None:
        if query_emb.shape[0] != target_emb.shape[0]:
            raise ValueError("paired mode needs equally many queries/targets")
        query_ids = target_ids = np.arange(query_emb.shape[0])
    elif query_ids is None or target_ids is None:
        raise ValueError("pass both query_ids and target_ids, or neither")
    query_ids = np.asarray(query_ids)
    target_ids = np.asarray(target_ids)
    sim = np.asarray(
        _cosine_sim(jnp.asarray(query_emb), jnp.asarray(target_emb))
    )
    pos = query_ids[:, None] == target_ids[None, :]
    return {
        "q2t": _rank_metrics(sim, pos, ks),
        "t2q": _rank_metrics(sim.T, pos.T, ks),
    }
