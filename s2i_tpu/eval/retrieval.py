"""Speech↔image/text retrieval metrics (SURVEY.md §2 "Retrieval eval"):
cosine-similarity matrix (jitted) → R@K and mAP in both directions. Grades
speech-embedding quality against the teacher space.
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


def _rank_metrics(sim: np.ndarray, ks: tuple[int, ...]) -> dict:
    """Row i's positive is column i (paired sets)."""
    n = sim.shape[0]
    order = np.argsort(-sim, axis=1)
    ranks = np.empty(n, np.int64)
    for i in range(n):
        ranks[i] = int(np.where(order[i] == i)[0][0])
    out = {f"r@{k}": float(np.mean(ranks < k)) for k in ks}
    out["medr"] = float(np.median(ranks) + 1)
    out["map"] = float(np.mean(1.0 / (ranks + 1)))
    return out


def retrieval_metrics(
    query_emb: np.ndarray,
    target_emb: np.ndarray,
    ks: tuple[int, ...] = (1, 5, 10),
) -> dict:
    """Paired embeddings [N,D]×[N,D] → {'q2t': {...}, 't2q': {...}}."""
    sim = np.asarray(_cosine_sim(jnp.asarray(query_emb), jnp.asarray(target_emb)))
    return {"q2t": _rank_metrics(sim, ks), "t2q": _rank_metrics(sim.T, ks)}
