"""MSet document clustering and result diversification.

Reference parity targets: src/xapian/cluster/ (TF-IDF document vectors +
cosine similarity, K-means over an MSet) and src/xapian/diversify/
(GLS/MPT-style result diversification). TPU-first formulation: the n x V
TF-IDF matrix multiplies against centroids on the MXU every iteration
(cosine similarity = matmul on L2-normalised rows); assignment and centroid
updates are one-hot matmuls, the whole loop a lax.fori_loop.
"""

from __future__ import annotations

import math

import numpy as np


def tfidf_vectors(term_lists: list[dict], doc_count: int,
                  df: dict, max_vocab: int = 2048):
    """term_lists: per doc {term: wdf}; df: term -> document frequency.

    Returns (X [n, V] float32 L2-normalised, vocab list)."""
    seen: dict[str, float] = {}
    for terms in term_lists:
        for t in terms:
            if t not in seen:
                n = max(df.get(t, 1), 1)
                seen[t] = math.log(max(doc_count, 2) / n)
    vocab = sorted(seen, key=lambda t: -seen[t])[:max_vocab]
    index = {t: i for i, t in enumerate(vocab)}
    X = np.zeros((len(term_lists), len(vocab)), np.float32)
    for r, terms in enumerate(term_lists):
        for t, wdf in terms.items():
            c = index.get(t)
            if c is not None:
                X[r, c] = (1.0 + math.log(max(wdf, 1))) * seen[t]
        norm = np.linalg.norm(X[r])
        if norm > 0:
            X[r] /= norm
    return X, vocab


def kmeans_cosine(X: np.ndarray, k: int, iters: int = 20,
                  seed: int = 0):
    """Spherical k-means on the device; returns (labels [n], centroids)."""
    import jax
    import jax.numpy as jnp

    n, v = X.shape
    k = min(k, n)
    # deterministic farthest-first seeding: start from doc 0, repeatedly
    # take the point least similar to any chosen centroid - lands one seed
    # per natural cluster on block-structured similarity
    chosen = [0]
    sims_to_chosen = X @ X[0]
    for _ in range(k - 1):
        nxt = int(np.argmin(sims_to_chosen))
        chosen.append(nxt)
        sims_to_chosen = np.maximum(sims_to_chosen, X @ X[nxt])
    C0 = jnp.asarray(X[chosen])
    Xd = jnp.asarray(X)

    def step(_, C):
        sims = jnp.dot(Xd, C.T, preferred_element_type=jnp.float32)  # MXU
        labels = jnp.argmax(sims, axis=1)
        onehot = jnp.asarray(labels[:, None] == jnp.arange(k)[None, :],
                             jnp.float32)
        newC = jnp.dot(onehot.T, Xd, preferred_element_type=jnp.float32)
        norms = jnp.linalg.norm(newC, axis=1, keepdims=True)
        newC = jnp.where(norms > 1e-6, newC / jnp.maximum(norms, 1e-6), C)
        return newC

    C = jax.lax.fori_loop(0, iters, step, C0)
    sims = jnp.dot(Xd, C.T, preferred_element_type=jnp.float32)
    labels = np.asarray(jnp.argmax(sims, axis=1))
    return labels, np.asarray(C)


def diversify_mmr(scores: np.ndarray, X: np.ndarray, k: int,
                  lam: float = 0.5) -> list[int]:
    """Maximal-marginal-relevance reorder: next = argmax
    lam*score - (1-lam)*max_sim(selected). Returns selected row indices
    in output order (diversify/ GLS analog)."""
    n = len(scores)
    k = min(k, n)
    if n == 0:
        return []
    s = np.asarray(scores, np.float64)
    rng = s.max() - s.min()
    s = (s - s.min()) / rng if rng > 0 else np.ones_like(s)
    sims = X @ X.T
    selected = [int(np.argmax(s))]
    remaining = set(range(n)) - set(selected)
    while len(selected) < k and remaining:
        rem = sorted(remaining)
        max_sim = sims[np.ix_(rem, selected)].max(axis=1)
        mmr = lam * s[rem] - (1 - lam) * max_sim
        best = rem[int(np.argmax(mmr))]
        selected.append(best)
        remaining.discard(best)
    return selected
