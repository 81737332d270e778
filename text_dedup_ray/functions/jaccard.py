"""Jaccard similarity (reference parity: utils/jaccard.py:9-47)."""

from __future__ import annotations


def jaccard_similarity(doc1: set, doc2: set) -> float:
    """Set Jaccard; empty-vs-empty is defined as 1.0 (reference convention)."""
    union_size = len(doc1 | doc2)
    if union_size == 0:
        return 1.0
    return len(doc1 & doc2) / union_size


def cluster_jaccard_similarity(
    cluster: list[set], threshold: float
) -> tuple[list[float], float]:
    """Per-member max similarity to any other member + false-positive rate."""
    if len(cluster) <= 1:
        return [], 0
    similarities: list[float] = []
    fp = 0
    for i, doc1 in enumerate(cluster):
        best = max(jaccard_similarity(doc1, doc2) for j, doc2 in enumerate(cluster) if j != i)
        similarities.append(best)
        if best < threshold:
            fp += 1
    return similarities, fp / len(cluster)
